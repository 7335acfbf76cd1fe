"""Retrieval R@K protocol parity vs the reference's own
``run_retrieval.py::compute_ranks``/``evaluate`` executed directly (via
``pytorch_transformers_shim``), in BOTH evaluation settings: the
hard-negative re-rank branch (``has_caption_indexs``) and the full
pairwise-ranking branch with its i2t/t2i transpose."""
import os.path as op
import sys

import numpy as np
import pytest

sys.path.insert(0, op.dirname(op.abspath(__file__)))
import pytorch_transformers_shim as shim

from cpt_tpu.data.retrieval import rank_rerank, rank_scores

OSCAR_ROOT = "/root/reference/Oscar"

shim.install()
if OSCAR_ROOT not in sys.path:
    sys.path.insert(0, OSCAR_ROOT)

ref_rr = pytest.importorskip("oscar.run_retrieval")
# the reference binds `logger` inside main(); evaluate() needs it global
import logging  # noqa: E402

ref_rr.logger = logging.getLogger("ref_retrieval")


class _FakeDataset:
    def __init__(self, labels, num_captions_per_img, img_keys,
                 has_caption_indexs):
        self._labels = labels
        self.num_captions_per_img = num_captions_per_img
        self.img_keys = img_keys
        self.has_caption_indexs = has_caption_indexs

    def __len__(self):
        return len(self._labels)

    def get_label(self, i):
        return self._labels[i]


def test_rerank_branch_parity():
    """has_caption_indexs: per image, rank of the first positive among its
    candidate captions."""
    rng = np.random.RandomState(0)
    n_img, n_cand = 12, 20
    labels = np.zeros((n_img, n_cand), np.int64)
    labels[np.arange(n_img), rng.randint(0, n_cand, n_img)] = 1
    scores = rng.randn(n_img, n_cand)

    ds = _FakeDataset(labels.reshape(-1), n_cand,
                      [f"im{i}" for i in range(n_img)], True)
    ref_eval = ref_rr.evaluate(ds, {i: s for i, s in
                                    enumerate(scores.reshape(-1))})
    ours = rank_rerank(scores.reshape(-1), labels.reshape(-1), n_cand)
    for k in (1, 5, 10):
        assert ours[f"i2t_R@{k}"] == pytest.approx(
            100.0 * ref_eval["i2t_retrieval"][f"R@{k}"])
    assert "t2i_retrieval" not in ref_eval


def test_full_ranking_branch_parity():
    """Full pairwise setting: reference flattens [img, all captions] and
    transposes for t2i; ours takes [caption, image] + owner indices."""
    rng = np.random.RandomState(1)
    n_img, ncap = 8, 3
    n_captions = n_img * ncap
    # sim[img, cap] for every (img, caption) pair
    sim = rng.randn(n_img, n_captions)
    labels = np.zeros((n_img, n_captions), np.int64)
    for img in range(n_img):
        labels[img, img * ncap:(img + 1) * ncap] = 1

    ds = _FakeDataset(labels.reshape(-1), ncap,
                      [f"im{i}" for i in range(n_img)], False)
    ref_eval = ref_rr.evaluate(ds, {i: s for i, s in
                                    enumerate(sim.reshape(-1))})

    owners = [c // ncap for c in range(n_captions)]
    ours = rank_scores(sim.T, owners, n_img)
    for k in (1, 5, 10):
        assert ours[f"t2i_R@{k}"] == pytest.approx(
            100.0 * ref_eval["t2i_retrieval"][f"R@{k}"])
        assert ours[f"i2t_R@{k}"] == pytest.approx(
            100.0 * ref_eval["i2t_retrieval"][f"R@{k}"])


def test_tensorize_example_parity(tmp_path):
    """The reference's own ``RetrievalDataset.tensorize_example``
    (run_retrieval.py:134-199) executed directly vs our
    ``RetrievalData.tensorize`` — input_ids/segment_ids/attention_mask/
    padded features identical for ALL FOUR att_mask_types, with and
    without od labels, over captions spanning truncation and short
    feature counts.

    Reachable configs only: when tokens_a fills the whole text budget
    (len ≥ max_seq_length-2) AND od labels are present, the reference's
    ``tokens_b[: max_seq_len - len(tokens) - 1]`` computes a NEGATIVE
    bound (run_retrieval.py:146-148), under-truncates, and emits an
    overlong UNPADDED sequence (seq_padding_len < 0) — a latent
    reference bug, not a layout; we truncate text_b to fit. The fixture
    keeps tokens_a under the cap so both sides are in the sane regime."""
    import json
    import types

    import torch

    from cpt_tpu.data.retrieval import RetrievalData
    from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab
    from cpt_tpu.utils.tsv import encode_feature, tsv_writer

    tok = BertTokenizer(toy_vocab())
    T, R, D = 16, 6, 8
    rng = np.random.RandomState(0)
    rows, caps = [], {}
    # q=1: 10 caption tokens + 9 od classes → text_b truncates to fit
    # q=3: exactly T-3 caption tokens → the od budget is ZERO, tokens_b
    #      truncates to [] but the reference still appends the trailing
    #      segment-1 [SEP] (run_retrieval.py:144-149)
    texts = ["the red dog", "a person on the left of the dog and cat",
             "what color",
             "a man on the left of the dog and cat is in red"]
    for q in range(4):
        n = [3, 9, 1, 5][q]
        feats = rng.randn(n, D).astype(np.float32) * 0.1
        boxlist = [{"rect": [0, 0, 5, 5],
                    "class": "dog" if b % 2 else "cat", "conf": 0.9,
                    "feature": encode_feature(f)}
                   for b, f in enumerate(feats)]
        rows.append([f"im{q}", json.dumps({"objects": boxlist})])
        caps[f"im{q}"] = [texts[q]]
    tsv_writer(rows, str(tmp_path / "p.tsv"))

    for att in ("CLR", "CL", "CR", "LR"):
        for use_od in (True, False):
            ours = RetrievalData(str(tmp_path / "p.tsv"), caps, tok,
                                 max_seq_len=T, img_seq_len=R,
                                 img_feat_dim=D, att_mask_type=att,
                                 use_od_labels=use_od)
            ref_ds = ref_rr.RetrievalDataset.__new__(ref_rr.RetrievalDataset)
            ref_ds.tokenizer = tok
            ref_ds.max_seq_len = T
            ref_ds.max_img_seq_len = R
            ref_ds.args = types.SimpleNamespace(
                max_seq_length=T, max_img_seq_length=R,
                att_mask_type=att, add_od_labels=use_od)
            for q in range(4):
                key = f"im{q}"
                feats_np, od = ours._feats(key)
                seq, fpad = ours.tensorize(caps[key][0], key)
                r_ids, r_attn, r_segs, r_feat = ref_ds.tensorize_example(
                    caps[key][0], torch.tensor(feats_np),
                    text_b=od if use_od else None)
                np.testing.assert_array_equal(seq.input_ids,
                                              r_ids.numpy())
                np.testing.assert_array_equal(seq.segment_ids,
                                              r_segs.numpy())
                np.testing.assert_array_equal(seq.attention_mask,
                                              r_attn.numpy())
                np.testing.assert_allclose(fpad, r_feat.numpy(),
                                           rtol=0, atol=0)
