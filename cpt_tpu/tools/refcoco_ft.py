"""RefCOCO full-finetune baseline driver (``REC_FT``).

Mirrors reference ``Oscar/oscar/fewshot/refcoco_ft.py`` (+
``datasets/refcoco_ft_dataset.py``): ONE sequence per query — caption +
od-labels + ALL candidate-region features (plain, uncolored predictions
TSV); the per-box MLP scorer ranks the image-hidden states; target = the
candidate with best IoU against the gt box; CE over candidates.
"""
from __future__ import annotations

import argparse
import json
import pickle
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpt_tpu.data.tensorize import pad_img_feats, tensorize_pair
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import REC_FT
from cpt_tpu.structures.boxes import xywh_iou
from cpt_tpu.tools._common import (add_common_args, build_tokenizer,
                                   dtype_of, load_or_init, model_config,
                                   optim_overrides)
from cpt_tpu.utils.tsv import TSVFile, decode_feature


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_file", required=True,
                   help="plain predictions.tsv (rows: key \\t "
                        "{objects: boxlist} or the refcoco layout)")
    p.add_argument("--ann_file", required=True)
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    add_common_args(p)
    # the reference refcoco_ft DEFINES --max_grad_norm but never calls
    # clip_grad_norm_ (fewshot/refcoco_ft.py:352, no clip in the loop) —
    # default to no clipping; an explicit flag is honored
    p.set_defaults(max_grad_norm=0.0)
    return p


class RefcocoFTData:
    def __init__(self, data_file, ann_file, tokenizer, txt_len, img_len, dim):
        self.tsv = TSVFile(data_file)
        anns = json.load(open(ann_file))
        self.anns = {str(d["id"]): d for d in anns}
        self.tokenizer = tokenizer
        self.txt_len, self.img_len, self.dim = txt_len, img_len, dim

    def __len__(self):
        return len(self.tsv)

    def example(self, idx):
        key, payload = self.tsv.seek(idx)
        info = json.loads(payload)
        objs = info["objects"]
        if isinstance(objs, list) and objs and isinstance(objs[0], list):
            # refcoco color layout: use the first copy's boxlist
            boxlist = objs[0][0] if isinstance(objs[0][0], list) else objs[0]
            caption = info["objects"][1]
        else:
            boxlist = objs
            caption = self.anns[key].get("caption", "")
        feats = np.stack([decode_feature(o["feature"]) for o in boxlist])
        boxes = [o["rect"] for o in boxlist]
        od = " ".join(o["class"] for o in boxlist)
        gt = self.anns[key]["bbox"]
        ious = [xywh_iou(gt, [b[0], b[1], b[2] - b[0] + 1, b[3] - b[1] + 1])
                for b in boxes]
        target = int(np.argmax(ious))
        seq = tensorize_pair(self.tokenizer, caption.replace(".", "").strip(),
                             od, feats.shape[0], self.txt_len, self.img_len)
        n_box = min(feats.shape[0], self.img_len)
        box_mask = np.zeros((self.img_len,), bool)
        box_mask[:n_box] = True
        return (key, seq, pad_img_feats(feats, self.img_len), box_mask,
                target, boxes)

    def batch(self, indices, pad_to=None):
        total = pad_to if pad_to is not None else len(indices)
        t, r, d = self.txt_len, self.img_len, self.dim
        ids = np.zeros((total, t), np.int32)
        segs = np.zeros((total, t), np.int32)
        attn = np.zeros((total, t + r), np.int32)
        feats = np.zeros((total, r, d), np.float32)
        box_mask = np.zeros((total, r), bool)
        targets = np.full((total,), -1, np.int32)
        keys, boxes_list = [], []
        for i, idx in enumerate(indices):
            key, seq, f, bm, tgt, boxes = self.example(idx)
            ids[i], segs[i], attn[i] = (seq.input_ids, seq.segment_ids,
                                        seq.attention_mask)
            feats[i], box_mask[i], targets[i] = f, bm, tgt
            keys.append(key)
            boxes_list.append(boxes)
        return ids, segs, attn, feats, box_mask, targets, keys, boxes_list


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = build_tokenizer(args)
    cfg = model_config(args)
    model = REC_FT(cfg, txt_seq_len=args.max_seq_length, dtype=dtype_of(args))

    data = RefcocoFTData(args.data_file, args.ann_file, tokenizer,
                         args.max_seq_length, args.max_img_seq_length,
                         cfg.img_feature_dim)
    bsz = args.per_gpu_train_batch_size
    b0 = data.batch([0], pad_to=1)
    params = load_or_init(
        model, tuple(jnp.asarray(x) for x in b0[:4]), args, cfg)

    if args.num_train_epochs > 0:
        steps = max(1, len(data) // bsz) * args.num_train_epochs
        # betas stay OptimConfig's (0.9, 0.98) — reference refcoco_ft.py:444
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(steps * args.warmup_ratio), num_train_steps=steps,
            lr_mul=1.0, **optim_overrides(args))
        tx = train_lib.build_optimizer(
            params, ocfg, classifier_pred=lambda p: any(
                part.startswith("cls_") for part in p))
        state = train_lib.create_train_state(params, tx)

        @jax.jit
        def step(state, batch, rng):
            ids, segs, attn, feats, box_mask, targets = batch

            def loss_fn(p):
                loss, _, _ = model.apply(p, ids, segs, attn, img_feats=feats,
                                         box_mask=box_mask,
                                         target_idx=targets,
                                         deterministic=False,
                                         rngs={"dropout": rng})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            upd, opt = tx.update(grads, state.opt_state, state.params)
            return train_lib.TrainState(
                optax.apply_updates(state.params, upd), opt,
                state.step + 1), loss

        rng = jax.random.PRNGKey(args.seed)
        order_rng = random.Random(args.seed)
        for epoch in range(args.num_train_epochs):
            order = list(range(len(data)))
            order_rng.shuffle(order)
            for start in range(0, len(order), bsz):
                chunk = order[start:start + bsz]
                b = data.batch(chunk, pad_to=bsz)
                rng, sub = jax.random.split(rng)
                state, loss = step(
                    state, tuple(jnp.asarray(x) for x in b[:6]), sub)
            if (epoch + 1) % 10 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f}")
        params = state.params

    @jax.jit
    def fwd(params, ids, segs, attn, feats, box_mask):
        _, scores, pred = model.apply(params, ids, segs, attn,
                                      img_feats=feats, box_mask=box_mask)
        return pred

    n_correct, n_total, preds_out = 0, 0, {}
    ebsz = args.per_gpu_eval_batch_size
    for start in range(0, len(data), ebsz):
        idxs = list(range(start, min(start + ebsz, len(data))))
        b = data.batch(idxs, pad_to=ebsz)
        pred = np.asarray(fwd(params, *(jnp.asarray(x) for x in b[:5])))
        for j, idx in enumerate(idxs):
            key, boxes = b[6][j], b[7][j]
            pi = int(pred[j])
            if pi < len(boxes):
                box = boxes[pi]
                preds_out[key] = box
                gt = data.anns[key]["bbox"]
                iou = xywh_iou(gt, [box[0], box[1], box[2] - box[0] + 1,
                                    box[3] - box[1] + 1])
                n_correct += iou > 0.5
                n_total += 1
    acc = 100.0 * n_correct / max(n_total, 1)
    print(f"miou: {acc:.2f}")
    if args.output:
        pickle.dump({"accuracy": acc, "predictions": preds_out},
                    open(args.output, "wb"))
    return acc


if __name__ == "__main__":
    main()
