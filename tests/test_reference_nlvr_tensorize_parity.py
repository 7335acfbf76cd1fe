"""Direct-execution parity with the reference's NLVR tensorization.

Executes the reference's own ``NLVRDataset.tensorize_example`` (concat,
``run_nlvr.py:132-245``) and ``tensorize_example_pair`` (``:246-352``,
``--use_pair``) via the pytorch_transformers shim and demands our
``NLVRData.batch`` matches byte-for-byte in both modes — including the
reference's quirks: concat stacks BOTH images' regions at
2*max_img_seq_length, and pair mode tokenizes the statement once so each
choice's in-place truncation carries into the next choice."""
import json
import os.path as op
import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, op.dirname(op.abspath(__file__)))
import pytorch_transformers_shim as shim

shim.install()
if "/root/reference/Oscar" not in sys.path:
    sys.path.insert(0, "/root/reference/Oscar")

ref_nlvr = pytest.importorskip("oscar.run_nlvr")

from cpt_tpu.data.nlvr import NLVRData, NLVRExample
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab
from cpt_tpu.utils.tsv import encode_feature, tsv_writer

D = 8


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("nlvr_parity")
    rng = np.random.RandomState(0)
    rows, feats, ods = [], {}, {}
    for q in range(6):
        n = [3, 9, 1, 5, 2, 4][q]     # some exceed max_img_seq (4)
        f = rng.randn(n, D).astype(np.float32) * 0.1
        classes = ["dog" if b % 2 else "cat" for b in range(n)]
        rows.append([f"im{q}", json.dumps({"objects": [
            {"rect": [0, 0, 5, 5], "class": c, "conf": 0.9,
             "feature": encode_feature(ff)}
            for c, ff in zip(classes, f)]})])
        feats[f"im{q}"] = torch.tensor(f)
        ods[f"im{q}"] = " ".join(classes)
    tsv_writer(rows, str(root / "p.tsv"))
    stmts = ["the left image is a dog",
             # long statement: exercises the shared-tokens_a in-place
             # truncation across pair choices
             "the left image is a dog and the right image is a cat and "
             "a person is on the left of the dog"]
    examples = [NLVRExample(str(i), f"im{2 * i}", f"im{2 * i + 1}",
                            stmts[i % 2], i % 2) for i in range(3)]
    return root, feats, ods, examples


def _ref_ds(feats, tok, T, R, use_pair):
    ds = ref_nlvr.NLVRDataset.__new__(ref_nlvr.NLVRDataset)
    ds.tokenizer = tok
    ds.img_features = feats
    ds.args = types.SimpleNamespace(
        max_seq_length=T, max_img_seq_length=R,
        img_feature_type="faster_r-cnn", output_mode="classification",
        use_pair=use_pair, model_type="bert")
    return ds


@pytest.mark.parametrize("T", [16, 24])
def test_nlvr_pair_mode_matches_reference(fixture, T):
    root, feats, ods, examples = fixture
    tok = BertTokenizer(toy_vocab())
    R = 4
    ds = _ref_ds(feats, tok, T, R, use_pair=True)
    ours = NLVRData(str(root / "p.tsv"), examples, tok, max_seq_len=T,
                    img_seq_len=R, img_feat_dim=D, mode="pair")
    ids, segs, attn, ofeats, labels = ours.batch(range(len(examples)))

    for i, ex in enumerate(examples):
        entry = types.SimpleNamespace(
            text_a=ex.statement,
            text_b={"left": ods[ex.img_left], "right": ods[ex.img_right]},
            img_key={"left": ex.img_left, "right": ex.img_right},
            label=ex.label, q_id=0)
        r_ids, r_mask, r_segs, r_label, r_feat, _ = \
            ds.tensorize_example_pair(
                entry, cls_token="[CLS]", sep_token="[SEP]",
                cls_token_segment_id=0, pad_token_segment_id=0)
        np.testing.assert_array_equal(ids[i], r_ids.numpy())
        np.testing.assert_array_equal(segs[i], r_segs.numpy())
        np.testing.assert_array_equal(attn[i], r_mask.numpy())
        np.testing.assert_allclose(ofeats[i], r_feat.numpy(),
                                   rtol=0, atol=0)
        assert labels[i] == int(r_label)


@pytest.mark.parametrize("T", [16, 24])
def test_nlvr_concat_mode_matches_reference(fixture, T):
    root, feats, ods, examples = fixture
    tok = BertTokenizer(toy_vocab())
    R = 4
    ds = _ref_ds(feats, tok, T, R, use_pair=False)
    ours = NLVRData(str(root / "p.tsv"), examples, tok, max_seq_len=T,
                    img_seq_len=R, img_feat_dim=D, mode="concat")
    ids, segs, attn, ofeats, labels = ours.batch(range(len(examples)))
    assert ofeats.shape[1] == 2 * R     # both images' regions

    for i, ex in enumerate(examples):
        entry = types.SimpleNamespace(
            text_a=ex.statement,
            text_b={"left": ods[ex.img_left], "right": ods[ex.img_right]},
            img_key={"left": ex.img_left, "right": ex.img_right},
            label=ex.label, score=None, q_id=0)
        r_ids, r_mask, r_segs, r_label, r_feat, _ = ds.tensorize_example(
            entry, cls_token="[CLS]", sep_token="[SEP]",
            cls_token_segment_id=0, pad_token_segment_id=0)
        np.testing.assert_array_equal(ids[i], r_ids.numpy())
        np.testing.assert_array_equal(segs[i], r_segs.numpy())
        np.testing.assert_array_equal(attn[i], r_mask.numpy())
        np.testing.assert_allclose(ofeats[i], r_feat.numpy(),
                                   rtol=0, atol=0)
        assert labels[i] == int(r_label)
