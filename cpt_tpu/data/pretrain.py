"""Oscar+ pretraining dataset: MLM + contrastive (text-b swap).

Parity with reference ``Oscar/oscar/datasets/oscar_tsv.py`` (``OscarTSVData-
set:256-``, driver ``run_oscarplus_pretrain.py``): each item is
``[CLS] caption [SEP] od_labels [SEP]`` + region features; with probability
0.5 the od-label side is swapped with a random other image's tags and the
contrastive label flips to 1 ("polluted"); caption tokens are masked
BERT-style (15%, 80/10/10) for the MLM objective. Loss = MLM CE + NSP-style
contrastive CE (``BertImgForPreTraining``).
"""
from __future__ import annotations

import json
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cpt_tpu.data.tensorize import pad_img_feats, tensorize_pair
from cpt_tpu.utils.tokenization import BertTokenizer
from cpt_tpu.utils.tsv import TSVFile, decode_feature


def mask_tokens(input_ids: np.ndarray, maskable: np.ndarray,
                tokenizer: BertTokenizer, rng: random.Random,
                mask_prob: float = 0.15) -> Tuple[np.ndarray, np.ndarray]:
    """BERT masking: → (masked input_ids, mlm_labels [-1 = unmasked])."""
    ids = input_ids.copy()
    labels = np.full_like(ids, -1)
    vocab_items = list(tokenizer.vocab.values())
    for i in range(len(ids)):
        if not maskable[i]:
            continue
        if rng.random() < mask_prob:
            labels[i] = ids[i]
            r = rng.random()
            if r < 0.8:
                ids[i] = tokenizer.mask_token_id
            elif r < 0.9:
                ids[i] = rng.choice(vocab_items)
    return ids, labels


class OscarPretrainData:
    def __init__(self, feat_file: str, captions: dict,
                 tokenizer: BertTokenizer, max_seq_len: int = 35,
                 img_seq_len: int = 50, img_feat_dim: int = 2054,
                 text_b_swap_prob: float = 0.5):
        """captions: {img_key: caption string}."""
        self.tsv = TSVFile(feat_file)
        self.imgid2idx = {self.tsv.seek(i)[0]: i for i in range(len(self.tsv))}
        self.keys = sorted(k for k in captions if k in self.imgid2idx)
        self.captions = captions
        self.tokenizer = tokenizer
        self.max_seq_len = max_seq_len
        self.img_seq_len = img_seq_len
        self.img_feat_dim = img_feat_dim
        self.swap_prob = text_b_swap_prob

    def __len__(self):
        return len(self.keys)

    def _feats(self, img_key: str):
        _, payload = self.tsv.seek(self.imgid2idx[img_key])
        info = json.loads(payload)
        boxlist = info["objects"]
        feats = np.stack([decode_feature(o["feature"]) for o in boxlist])
        od = " ".join(o["class"] for o in boxlist)
        return feats, od

    def batch(self, indices: Sequence[int], rng: random.Random,
              pad_to: Optional[int] = None):
        """→ (ids, segs, attn, feats, mlm_labels, contrastive_labels)."""
        n = len(indices)
        total = pad_to if pad_to is not None else n
        t, r, d = self.max_seq_len, self.img_seq_len, self.img_feat_dim
        ids = np.zeros((total, t), np.int32)
        segs = np.zeros((total, t), np.int32)
        attn = np.zeros((total, t + r), np.int32)
        feats = np.zeros((total, r, d), np.float32)
        mlm = np.full((total, t + r), -1, np.int32)
        contrast = np.full((total,), -1, np.int32)
        for i, idx in enumerate(indices):
            key = self.keys[idx]
            f, od = self._feats(key)
            swapped = rng.random() < self.swap_prob and len(self.keys) > 1
            if swapped:
                other = rng.choice([k for k in self.keys if k != key])
                _, od = self._feats(other)
            seq = tensorize_pair(self.tokenizer, self.captions[key], od,
                                 f.shape[0], t, r)
            sep = seq.input_ids.tolist().index(self.tokenizer.sep_token_id)
            maskable = np.zeros((t,), bool)
            maskable[1:sep] = True                   # caption tokens only
            masked, labels = mask_tokens(seq.input_ids, maskable,
                                         self.tokenizer, rng)
            ids[i] = masked
            segs[i] = seq.segment_ids
            attn[i] = seq.attention_mask
            feats[i] = pad_img_feats(f, r)
            mlm[i, :t] = labels
            contrast[i] = 1 if swapped else 0
        return ids, segs, attn, feats, mlm, contrast


class MultiCorpusPretrainData(OscarPretrainData):
    """Multi-corpus Oscar+ pretraining mixing (reference ``oscar_tsv.py:
    16-200``): one corpus TSV interleaving several datasets, per-dataset
    region-feature TSVs, optional per-chunk splits with chunk-range
    filtering (GoogleCC/SBU/OI-style sharded corpora).

    yaml descriptor (paths relative to the yaml)::

        corpus: coco_flickr30k_googlecc     # '_'-joined dataset names
        corpus_file: corpus.tsv             # rows [<ds>_<imgid>, caption]
        image_feature_path:
          coco: coco_features.tsv           # one TSV per dataset...
          googlecc:                         # ...or {chunk_id: TSV} splits
            "0": cc_chunk0.tsv
            "1": cc_chunk1.tsv

    Rows whose dataset is not in ``corpus`` are skipped, as are rows of
    chunked datasets outside [chunk_start_id, chunk_end_id) — the
    reference's ``--chunk_start_id/--chunk_end_id`` pod-sharding knobs
    (``oscar_tsv.py:68-72,110-113``). Text-b ("polluted tags") swaps
    sample across the whole mixed corpus, like the reference's random-doc
    draw.
    """

    def __init__(self, yaml_file: str, tokenizer: BertTokenizer,
                 max_seq_len: int = 35, img_seq_len: int = 50,
                 img_feat_dim: int = 2054, text_b_swap_prob: float = 0.5,
                 chunk_start_id: int = -1, chunk_end_id: int = -1):
        import os

        import yaml as _yaml

        root = os.path.dirname(os.path.abspath(yaml_file))
        cfg = _yaml.safe_load(open(yaml_file))
        names = cfg["corpus"].split("_")
        chunk_list = None
        if 0 <= chunk_start_id <= chunk_end_id:
            chunk_list = {str(c) for c in range(chunk_start_id,
                                                chunk_end_id)}

        self._tsvs = {}            # (dataset, chunk|None) -> TSVFile
        self._index = {}           # "<ds>_<imgid>" -> (tsv, row)
        for ds, spec in cfg["image_feature_path"].items():
            if ds not in names:
                continue
            specs = (spec.items() if isinstance(spec, dict)
                     else [(None, spec)])
            for chunk, path in specs:
                if (chunk is not None and chunk_list is not None
                        and str(chunk) not in chunk_list):
                    continue
                tsv = TSVFile(os.path.join(root, path))
                self._tsvs[(ds, chunk)] = tsv
                for i in range(len(tsv)):
                    self._index[f"{ds}_{tsv.seek(i)[0]}"] = (tsv, i)

        corpus = TSVFile(os.path.join(root, cfg["corpus_file"]))
        captions, keys = {}, []
        for i in range(len(corpus)):
            row = corpus.seek(i)
            key = row[0]
            ds = key.split("_")[0]
            if ds == "cc":
                ds = "googlecc"
                key = "googlecc_" + key.split("_", 1)[1]
            if ds not in names or key not in self._index:
                continue
            keys.append(key)
            captions[key] = row[-1]

        self.keys = keys
        self.captions = captions
        self.tokenizer = tokenizer
        self.max_seq_len = max_seq_len
        self.img_seq_len = img_seq_len
        self.img_feat_dim = img_feat_dim
        self.swap_prob = text_b_swap_prob
        self.datasets = names

    def _feats(self, img_key: str):
        tsv, row = self._index[img_key]
        _, payload = tsv.seek(row)
        info = json.loads(payload)
        boxlist = info["objects"]
        feats = np.stack([decode_feature(o["feature"]) for o in boxlist])
        od = " ".join(o["class"] for o in boxlist)
        return feats, od
