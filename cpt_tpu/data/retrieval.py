"""Image-text retrieval dataset.

Parity with reference ``Oscar/oscar/run_retrieval.py`` (``RetrievalDataset:
23``): training pairs a caption with its image (label 1) or a sampled
negative caption/image (label 0), classified by
``ImageBertForSequenceClassification`` (binary). Evaluation ranks all
caption×image pair scores → R@1/5/10 both directions.
"""
from __future__ import annotations

import dataclasses
import json
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from cpt_tpu.data.tensorize import pad_img_feats, tensorize_pair
from cpt_tpu.utils.tokenization import BertTokenizer
from cpt_tpu.utils.tsv import TSVFile, decode_feature


class RetrievalData:
    def __init__(self, feat_file: str, captions: Dict[str, List[str]],
                 tokenizer: BertTokenizer, max_seq_len: int = 70,
                 img_seq_len: int = 50, img_feat_dim: int = 2054):
        """captions: {img_key: [caption strings]}."""
        self.tsv = TSVFile(feat_file)
        self.imgid2idx = {self.tsv.seek(i)[0]: i for i in range(len(self.tsv))}
        self.captions = {k: v for k, v in captions.items()
                         if k in self.imgid2idx}
        self.img_keys = sorted(self.captions)
        self.tokenizer = tokenizer
        self.max_seq_len = max_seq_len
        self.img_seq_len = img_seq_len
        self.img_feat_dim = img_feat_dim

    def _feats(self, img_key: str):
        _, payload = self.tsv.seek(self.imgid2idx[str(img_key)])
        info = json.loads(payload)
        boxlist = info["objects"]
        feats = np.stack([decode_feature(o["feature"]) for o in boxlist])
        od = " ".join(o["class"] for o in boxlist)
        return feats, od

    def tensorize(self, caption: str, img_key: str):
        feats, od = self._feats(img_key)
        seq = tensorize_pair(self.tokenizer, caption, od, feats.shape[0],
                             self.max_seq_len, self.img_seq_len)
        return seq, pad_img_feats(feats, self.img_seq_len)

    def train_batch(self, batch_size: int, rng: random.Random):
        """Balanced positive/negative pairs (reference's random caption or
        image swap negatives)."""
        t, r, d = self.max_seq_len, self.img_seq_len, self.img_feat_dim
        ids = np.zeros((batch_size, t), np.int32)
        segs = np.zeros((batch_size, t), np.int32)
        attn = np.zeros((batch_size, t + r), np.int32)
        feats = np.zeros((batch_size, r, d), np.float32)
        labels = np.zeros((batch_size,), np.int32)
        for i in range(batch_size):
            key = rng.choice(self.img_keys)
            if i % 2 == 0:
                cap = rng.choice(self.captions[key])
                labels[i] = 1
            else:
                other = rng.choice([k for k in self.img_keys if k != key])
                cap = rng.choice(self.captions[other])
                labels[i] = 0
            seq, f = self.tensorize(cap, key)
            ids[i], segs[i], attn[i] = (seq.input_ids, seq.segment_ids,
                                        seq.attention_mask)
            feats[i] = f
        return ids, segs, attn, feats, labels

    def all_pairs(self):
        """Every (caption, image) pair for ranking eval, with gt flags."""
        pairs = []
        for ck in self.img_keys:
            for cap in self.captions[ck]:
                for ik in self.img_keys:
                    pairs.append((cap, ck, ik))
        return pairs


def rank_scores(scores: np.ndarray, caption_owner: Sequence[int],
                n_images: int) -> Dict[str, float]:
    """scores [n_captions, n_images] (higher = better match);
    caption_owner[i] = gt image index → R@1/5/10 for text→image and
    image→text."""
    n_cap = scores.shape[0]
    out = {}
    ranks_t2i = []
    for i in range(n_cap):
        order = np.argsort(-scores[i], kind="stable")
        ranks_t2i.append(int(np.where(order == caption_owner[i])[0][0]))
    for k in (1, 5, 10):
        out[f"t2i_R@{k}"] = 100.0 * np.mean([r < k for r in ranks_t2i])
    ranks_i2t = []
    owners = np.asarray(caption_owner)
    for j in range(n_images):
        order = np.argsort(-scores[:, j], kind="stable")
        gt_rows = np.where(owners == j)[0]
        if len(gt_rows) == 0:
            continue
        pos = min(int(np.where(order == g)[0][0]) for g in gt_rows)
        ranks_i2t.append(pos)
    for k in (1, 5, 10):
        out[f"i2t_R@{k}"] = 100.0 * np.mean([r < k for r in ranks_i2t])
    return out
