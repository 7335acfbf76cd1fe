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
