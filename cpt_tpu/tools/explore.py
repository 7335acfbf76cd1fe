"""Prompt-design search: sweep colors / ZSL templates by zero-shot accuracy.

Parity with the reference's exploration scripts
(``Oscar/oscar/explore/explore_color_recog.py`` — which color word the
pretrained MLM recognizes best for painted regions — and
``explore_template.py`` / ``sgd_to_explore_template.py`` — zero-shot
accuracy per prompt template). Those are one-off research scripts; this is
the same search as a first-class driver: each candidate (color word or
template id) is evaluated with the standard zero-shot RefCOCO pipeline and
ranked by accuracy. The winning values the paper shipped (red
RGBA(240,0,30,127); template 1) are the defaults in ``data/prompts.py``.

Note: sweeping a *color* fully requires re-extracting features with that
paint color (stage 1); given a mapping color→predictions.tsv this driver
evaluates each. Template sweeps reuse one predictions.tsv.
"""
from __future__ import annotations

import argparse
import json
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["templates", "colors"],
                   default="templates")
    p.add_argument("--data_file", default=None,
                   help="predictions.tsv (templates mode)")
    p.add_argument("--color_data", default=None,
                   help='json {"red": "red_predictions.tsv", ...} '
                        "(colors mode)")
    p.add_argument("--ann_file", default=None)
    p.add_argument("--det_file", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--templates", default="1,2,3,4,5,6")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N queries")
    p.add_argument("--output", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="tiny self-contained smoke sweep (random weights)")
    return p


def _setup(args, data_file):
    from cpt_tpu.config.bert import OSCAR_BASE, tiny_bert_config
    from cpt_tpu.data.refcoco import RefcocoCPTData
    from cpt_tpu.models.bert.heads import REC_MLM_CPT
    from cpt_tpu.utils.tokenization import (BertTokenizer, load_vocab,
                                            toy_vocab)

    if args.synthetic:
        tok = BertTokenizer(toy_vocab())
        cfg = tiny_bert_config(vocab_size=192, img_feature_dim=134)
    else:
        tok = BertTokenizer(load_vocab(args.vocab))
        cfg = OSCAR_BASE
    model = REC_MLM_CPT(cfg, dtype=jnp.bfloat16)

    def data_for(template: Optional[int]):
        return RefcocoCPTData(data_file, args.ann_file, args.det_file, tok,
                              img_feat_dim=cfg.img_feature_dim,
                              zsl_template=template)

    d0 = data_for(None)
    ex0 = d0.example(0)
    t = ex0.seqs[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(t.input_ids[None]),
        jnp.asarray(t.segment_ids[None]),
        jnp.asarray(t.attention_mask[None]),
        jnp.zeros((1, d0.img_seq_len, cfg.img_feature_dim)))
    if args.checkpoint:
        from cpt_tpu.utils.convert import (load_torch_file,
                                           merge_pretrained_into_init)
        params = merge_pretrained_into_init(
            load_torch_file(args.checkpoint), params, cfg)
    return model, params, tok, data_for


def main(argv: Optional[List[str]] = None):
    from cpt_tpu.engine.scoring import refcoco_evaluate

    args = build_args().parse_args(argv)
    results = {}

    if args.mode == "templates":
        model, params, tok, data_for = _setup(args, args.data_file)
        for tid in [int(t) for t in args.templates.split(",")]:
            data = data_for(tid)
            idx = (list(range(min(args.limit, len(data))))
                   if args.limit else None)
            acc, _ = refcoco_evaluate(model, params, data, tok,
                                      batch_size=args.batch_size,
                                      indices=idx)
            results[f"template{tid}"] = acc
            print(f"template {tid}: acc {acc:.2f}")
    else:
        color_data = json.loads(open(args.color_data).read())
        for color, tsv in color_data.items():
            model, params, tok, data_for = _setup(args, tsv)
            data = data_for(None)
            idx = (list(range(min(args.limit, len(data))))
                   if args.limit else None)
            acc, _ = refcoco_evaluate(model, params, data, tok,
                                      batch_size=args.batch_size,
                                      indices=idx)
            results[color] = acc
            print(f"color {color}: acc {acc:.2f}")

    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:.2f})")
    if args.output:
        json.dump(results, open(args.output, "w"))
    return results


if __name__ == "__main__":
    main()
