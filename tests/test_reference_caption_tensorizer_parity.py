"""Caption-tensorizer parity vs the reference's own
``run_captioning.py::CaptionTensorizer`` executed directly: the seq2seq
attention-mask matrix (triangular C-C, full L-L/R-R, C→L, C→R, L↔R
blocks), sequence layout/segment ids, and the masking bookkeeping.
"""
import os.path as op
import random
import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, op.dirname(op.abspath(__file__)))
import pytorch_transformers_shim as shim

from cpt_tpu.models.bert.captioning import CaptionTensorizer
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

OSCAR_ROOT = "/root/reference/Oscar"

shim.install()
# run_captioning imports the absent coco_caption submodule via
# caption_evaluate — same stubs as test_scst_parity
for name, attrs in (
        ("coco_caption", {}),
        ("coco_caption.pycocotools", {}),
        ("coco_caption.pycocotools.coco", {"COCO": object}),
        ("coco_caption.pycocoevalcap", {}),
        ("coco_caption.pycocoevalcap.eval", {"COCOEvalCap": object})):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
if OSCAR_ROOT not in sys.path:
    sys.path.insert(0, OSCAR_ROOT)

ref_rc = pytest.importorskip("oscar.run_captioning")


class _Tok(BertTokenizer):
    """Adds the attribute surface the reference tensorizer touches."""

    mask_token = "[MASK]"
    cls_token = "[CLS]"
    sep_token = "[SEP]"
    pad_token = "[PAD]"

    def _convert_id_to_token(self, i):
        return self.ids_to_tokens.get(i, "[UNK]")


TOK = _Tok(toy_vocab(["red", "dog", "runs", "fast", "cat", "park"]))
CAPTION = "the red dog runs fast"
OD = "dog park cat"


def _pair(is_train, text_b, La=12, L=18, R=4, mask_prob=0.15, max_masked=3):
    ref = ref_rc.CaptionTensorizer(TOK, max_img_seq_length=R,
                                   max_seq_length=L, max_seq_a_length=La,
                                   mask_prob=mask_prob,
                                   max_masked_tokens=max_masked,
                                   is_train=is_train)
    ours = CaptionTensorizer(TOK, max_img_seq_len=R, max_seq_len=L,
                             max_seq_a_len=La, mask_prob=mask_prob,
                             max_masked_tokens=max_masked,
                             is_train=is_train)
    feats = np.random.RandomState(0).randn(R, 6).astype(np.float32)
    random.seed(0)
    ref_out = ref.tensorize_example(CAPTION, torch.tensor(feats),
                                    text_b=text_b)
    our_out = ours.tensorize(CAPTION, feats, text_b=text_b,
                             rng=random.Random(0))
    return ref_out, our_out


def test_inference_mode_parity():
    """is_train=False: deterministic — ids, segments and the full
    attention-mask matrix must be identical."""
    (ids_t, attn_t, segs_t, feat_t, mpos_t), \
        (ids_j, segs_j, attn_j, feat_j, _mp, _mi, _sa) = _pair(
            False, OD)
    np.testing.assert_array_equal(ids_j, ids_t.numpy())
    np.testing.assert_array_equal(segs_j, segs_t.numpy())
    np.testing.assert_array_equal(attn_j, attn_t.numpy())
    np.testing.assert_allclose(feat_j, feat_t.numpy())


def test_inference_mode_parity_no_od():
    (ids_t, attn_t, segs_t, feat_t, mpos_t), \
        (ids_j, segs_j, attn_j, feat_j, _mp, _mi, _sa) = _pair(
            False, None)
    np.testing.assert_array_equal(ids_j, ids_t.numpy())
    np.testing.assert_array_equal(segs_j, segs_t.numpy())
    np.testing.assert_array_equal(attn_j, attn_t.numpy())


def test_train_mode_parity_mask_all():
    """mask_prob=1 with a large budget makes the masked POSITION SET
    deterministic (every candidate); compare the attention mask, segment
    ids, masked positions/targets, and input ids outside masked slots
    (the 80/10/10 replacement draws differ)."""
    (ids_t, attn_t, segs_t, feat_t, mpos_t, mids_t), \
        (ids_j, segs_j, attn_j, feat_j, mpos_j, mids_j, seq_a) = _pair(
            True, OD, mask_prob=1.0, max_masked=11)
    np.testing.assert_array_equal(attn_j, attn_t.numpy())
    np.testing.assert_array_equal(segs_j, segs_t.numpy())
    # reference: indicator over max_seq_len; ours: index slots
    ref_pos = np.nonzero(mpos_t.numpy())[0]
    our_pos = mpos_j[mpos_j > 0]
    np.testing.assert_array_equal(np.sort(our_pos), ref_pos)
    # masked target ids agree position-for-position (both sorted orders)
    ref_ids = mids_t.numpy()
    ref_ids = ref_ids[ref_ids != 0]
    np.testing.assert_array_equal(mids_j[mids_j > 0], ref_ids)
    # non-masked slots of the input agree exactly
    unmasked = np.ones(len(ids_j), bool)
    unmasked[our_pos] = False
    np.testing.assert_array_equal(ids_j[unmasked], ids_t.numpy()[unmasked])
