"""One-shot CPT grounding: image + referring expression → predicted box.

The end-to-end serving path in a single command — stage-1 colored-copy
extraction (VinVL force-boxes) and stage-2 zero-shot color-word scoring
(``REC_MLM_CPT``) composed in-process, mirroring what the reference does
with two shell pipelines (``cmds/refcoco/prepare.sh`` + the zero-shot
driver, ``Oscar/oscar/zeroshot/refcoco_cpt.py``).

Usage:
  python -m cpt_tpu.tools.cpt_predict --image photo.jpg \
      --caption "the dog on the left" --dets '[[10,20,120,200],...]' \
      --checkpoint vinvl_vg_x152c4.pth --oscar_checkpoint pytorch_model.bin \
      --vocab vocab.txt --out overlay.png
  (--detect runs RPN-mode detection instead of taking --dets.)
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--caption", required=True)
    p.add_argument("--dets", default=None,
                   help="json [[x1,y1,x2,y2], ...] candidate boxes "
                        "(inclusive xyxy); omit with --detect")
    p.add_argument("--detect", action="store_true",
                   help="propose candidates with the detector (RPN mode)")
    p.add_argument("--checkpoint", default=None,
                   help="vinvl_vg_x152c4.pth (or Detectron .pkl)")
    p.add_argument("--oscar_checkpoint", default=None,
                   help="Oscar pretrained_base pytorch_model.bin")
    p.add_argument("--vocab", default=None)
    p.add_argument("--out", default=None, help="overlay PNG path")
    p.add_argument("--workdir", default=None,
                   help="keep intermediates here (default: temp dir)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--windowed", action="store_true",
                   help="two-level windowed extraction (PERF.md)")
    # stage-2 model-size knobs (tiny tests)
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_hidden_layers", type=int, default=None)
    return p


def main(argv=None):
    args = build_args().parse_args(argv)
    from PIL import Image

    workdir = args.workdir or tempfile.mkdtemp(prefix="cpt_predict_")
    os.makedirs(workdir, exist_ok=True)
    img = np.asarray(Image.open(args.image).convert("RGB"))

    if args.detect:
        from cpt_tpu.tools.demo import run_detector

        boxes, _labels, scores = run_detector(args, img)
        dets_xyxy = [list(map(float, b)) for b in boxes]
        assert dets_xyxy, "detector proposed no boxes above --conf"
    else:
        assert args.dets, "--dets or --detect required"
        dets_xyxy = json.loads(args.dets)

    # one-query fixture in the extract_features refcoco layout (image key
    # = trailing integer of the file name; det boxes are xywh there)
    img_path = os.path.join(workdir, "img_000001.jpg")
    Image.fromarray(img).save(img_path)
    ann = [{"id": "q0", "file_name": "img_000001.jpg",
            "caption": args.caption, "height": img.shape[0]}]
    json.dump(ann, open(os.path.join(workdir, "ann.json"), "w"))
    dets_xywh = [[b[0], b[1], b[2] - b[0] + 1, b[3] - b[1] + 1]
                 for b in dets_xyxy]
    json.dump({"1": [{"box": b} for b in dets_xywh]},
              open(os.path.join(workdir, "det.json"), "w"))

    from cpt_tpu.tools.extract_features import main as extract

    tsv = os.path.join(workdir, "predictions.tsv")
    ex_args = ["--task", "refcoco",
               "--ann_file", os.path.join(workdir, "ann.json"),
               "--det_file", os.path.join(workdir, "det.json"),
               "--image_root", workdir, "--output", tsv, "--overwrite",
               "--dtype", args.dtype]
    if args.checkpoint:
        ex_args += ["--checkpoint", args.checkpoint]
    if args.tiny:
        ex_args += ["--tiny"]
    if args.windowed:
        ex_args += ["--windowed"]
    extract(ex_args)

    # stage 2: zero-shot color-word scoring over the extracted copies
    from cpt_tpu.data.refcoco import RefcocoCPTData
    from cpt_tpu.engine.scoring import refcoco_evaluate
    from cpt_tpu.models.bert.heads import REC_MLM_CPT
    from cpt_tpu.tools._common import model_config
    from cpt_tpu.tools.validate_checkpoints import det_json_for_stage2
    from cpt_tpu.utils import convert as cv
    from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

    det2 = os.path.join(workdir, "stage2_det.json")
    det_json_for_stage2(tsv, det2)
    tokenizer = BertTokenizer(args.vocab if args.vocab else toy_vocab())

    class _A:  # the few model_config knobs this tool exposes
        pass

    a = _A()
    a.hidden_size = args.hidden_size
    a.num_hidden_layers = args.num_hidden_layers
    a.img_feature_dim = None
    cfg = model_config(a)
    from cpt_tpu.tools.validate_checkpoints import tsv_feature_dim

    dim = tsv_feature_dim(tsv)
    if dim != cfg.img_feature_dim:
        import dataclasses

        cfg = dataclasses.replace(cfg, img_feature_dim=dim)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = REC_MLM_CPT(cfg, dtype=dtype)
    data = RefcocoCPTData(tsv, os.path.join(workdir, "ann.json"), det2,
                          tokenizer, img_feat_dim=cfg.img_feature_dim)
    t = data.example(0).seqs[0]
    init_params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(t.input_ids[None]),
        jnp.asarray(t.segment_ids[None]),
        jnp.asarray(t.attention_mask[None]),
        jnp.zeros((1, data.img_seq_len, cfg.img_feature_dim)))
    if args.oscar_checkpoint:
        sd = cv.load_torch_file(args.oscar_checkpoint)
        pre = cv.convert_bert_state_dict(sd, cfg)
        mapped = cv.params_for_task(pre, "rec_mlm_cpt")
        params = {"params": cv.merge_pretrained_into_init(
            init_params["params"], mapped)}
    else:
        params = init_params
        print("WARNING: random Oscar weights (no --oscar_checkpoint)")

    _acc, preds = refcoco_evaluate(model, params, data, tokenizer,
                                   batch_size=16)
    pred = [float(v) for v in next(iter(preds.values()))]
    print(json.dumps({"caption": args.caption, "pred_box": pred,
                      "candidates": len(dets_xyxy)}))
    if args.out:
        from cpt_tpu.tools.demo import draw_box_outline

        arr = draw_box_outline(img.copy(), pred, (0, 255, 0))
        Image.fromarray(arr).save(args.out)
        print(f"wrote {args.out}")
    return pred


if __name__ == "__main__":
    main()
