"""Prompt-construction parity vs the REFERENCE's own Oscar dataset code.

Runs the reference's tokenize/tensorize functions (pure-python, torch CPU)
with OUR tokenizer (same surface as the pinned HF one) and asserts our
tensorizers produce identical input_ids / segment_ids / attention masks."""
import sys
import types

import numpy as np
import pytest
import torch

from cpt_tpu.data.gqa import tensorize_gqa
from cpt_tpu.data.tensorize import tensorize_pair
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

OSCAR_ROOT = "/root/reference/Oscar"


@pytest.fixture(scope="module")
def ref_modules():
    if OSCAR_ROOT not in sys.path:
        sys.path.insert(0, OSCAR_ROOT)
    # oscar.utils.misc imports yaml; iou pure; tsv_file pure
    from oscar.datasets import refcoco_fsl_cpt_dataset as ref_rc

    return ref_rc


TOK = BertTokenizer(toy_vocab())


def test_refcoco_tokenize_parity(ref_modules):
    ref_rc = ref_modules
    text_a = "the red dog on the left is in [MASK] color."
    text_b = "red dog cat person dog dog person"
    n_img = 4

    ids, mask, segs, lm = ref_rc.tokenize(
        TOK, text_a=text_a, text_b=text_b,
        img_feat=torch.zeros((n_img, 8)), max_img_seq_len=6,
        max_seq_a_len=40, max_seq_len=24)

    ours = tensorize_pair(TOK, text_a, text_b, n_img, max_seq_len=24,
                          max_img_seq_len=6)
    np.testing.assert_array_equal(ours.input_ids, ids.numpy())
    np.testing.assert_array_equal(ours.segment_ids, segs.numpy())
    np.testing.assert_array_equal(ours.attention_mask, mask.numpy())
    # mask position bookkeeping
    assert ours.mask_positions[0] == ids.tolist().index(103)


def test_refcoco_tokenize_truncation_parity(ref_modules):
    """Pair truncation (longest-first) must match on overflow."""
    ref_rc = ref_modules
    text_a = "the red dog " * 6 + "is in [MASK] color."
    text_b = "dog cat person " * 8

    ids, mask, segs, _ = ref_rc.tokenize(
        TOK, text_a=text_a, text_b=text_b, img_feat=torch.zeros((2, 8)),
        max_img_seq_len=4, max_seq_a_len=40, max_seq_len=32)
    ours = tensorize_pair(TOK, text_a, text_b, 2, max_seq_len=32,
                          max_img_seq_len=4)
    np.testing.assert_array_equal(ours.input_ids, ids.numpy())
    np.testing.assert_array_equal(ours.attention_mask, mask.numpy())


def test_b_only_full_budget_no_sep_overflow():
    """b_only mode with tokens_a filling the whole budget (>= T-2
    wordpieces): the reference enters its negative-bound bug regime
    (run_retrieval.py:146-148); we clamp text_b to nothing AND must not
    append the segment-1 [SEP] — output stays exactly max_seq_len
    (regression: round-4 appended it unconditionally → T+1 ids)."""
    T = 16
    long_a = "the red dog on the left of the cat " * 3  # >= T-2 pieces
    ours = tensorize_pair(TOK, long_a, "dog cat", 2, max_seq_len=T,
                          max_img_seq_len=4, truncation="b_only")
    assert ours.input_ids.shape == (T,)
    assert ours.segment_ids.shape == (T,)
    assert ours.attention_mask.shape == (T + 4,)
    # all-text: [CLS] + (T-2) tokens_a + [SEP], no room for segment 1
    assert ours.segment_ids.sum() == 0
    # one wordpiece short of the cap: b gets zero budget but the trailing
    # segment-1 [SEP] still fits in the last slot (reference reachable path)
    toks = TOK.tokenize(long_a)[: T - 3]
    seq = tensorize_pair(TOK, "x", "dog cat", 2, max_seq_len=T,
                         max_img_seq_len=4, truncation="b_only",
                         tokens_a=toks)
    assert seq.input_ids.shape == (T,)
    assert seq.segment_ids[T - 1] == 1  # the b-[SEP] in the final slot


def _stub_pinned_transformers():
    """The reference Oscar imports the pinned external
    ``transformers.pytorch_transformers`` clone; stub it with auto-generated
    torch.nn.Module subclasses (only class definitions are touched by the
    prompt-construction code paths under test)."""
    def auto_module(name):
        mod = types.ModuleType(name)

        def getattr_(attr, _n=name):
            if attr.startswith("__"):
                raise AttributeError(attr)
            return type(attr, (torch.nn.Module,), {"__init__":
                        lambda self, *a, **k: torch.nn.Module.__init__(self)})

        mod.__getattr__ = getattr_
        sys.modules[name] = mod
        return mod

    # anytree (cbs.py dependency): minimal Node/LevelOrderIter stub
    if "anytree" not in sys.modules:
        anytree = types.ModuleType("anytree")

        class _Node:
            def __init__(self, name, parent=None, **kw):
                self.name = name
                self.parent = parent
                self.__dict__.update(kw)

        anytree.Node = _Node
        anytree.LevelOrderIter = lambda root: [root]
        sys.modules["anytree"] = anytree

    import transformers as real_tf

    names = ["transformers.pytorch_transformers",
             "transformers.pytorch_transformers.modeling_bert",
             "transformers.pytorch_transformers.modeling_utils",
             "transformers.pytorch_transformers.tokenization_bert",
             "transformers.pytorch_transformers.optimization",
             "transformers.pytorch_transformers.file_utils"]
    for n in names:
        if n not in sys.modules:
            mod = auto_module(n)
            parent, _, child = n.rpartition(".")
            setattr(sys.modules.get(parent, real_tf), child, mod)


def test_gqa_tensorize_parity():
    """GQA layout vs the reference's GQADataset.tensorize_example (invoked
    on a detached instance — the method only needs args/tokenizer)."""
    if OSCAR_ROOT not in sys.path:
        sys.path.insert(0, OSCAR_ROOT)
    _stub_pinned_transformers()
    from oscar.fewshot import gqa_cpt as ref_gqa

    ds = ref_gqa.GQADataset.__new__(ref_gqa.GQADataset)
    ds.args = types.SimpleNamespace(
        max_seq_length=16, max_img_seq_length=5,
        img_feature_type="faster_r-cnn", output_mode="classification")
    ds.tokenizer = TOK
    ds.qid2feat = None
    ds.labels = [0, 1]

    question = "what color is the dog"
    feats = torch.zeros((3, 8))
    example = types.SimpleNamespace(text_a=question, text_b=None,
                                    label=[0], score=[1.0], q_id=0,
                                    img_key="im0")
    ds.get_img_feature = lambda ex: (question, "im0", ["dog"], feats, [])
    out = ds.tensorize_example(example)
    ref_ids, ref_mask, ref_segs = (out[0].numpy(), out[1].numpy(),
                                   out[2].numpy())

    ids, segs, attn, mask_pos = tensorize_gqa(TOK, question, 3,
                                              max_seq_len=16,
                                              max_img_seq_len=5)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(segs, ref_segs)
    np.testing.assert_array_equal(attn, ref_mask)
    assert ids[mask_pos] == 103


def test_vcr_textize_and_tensorize_parity():
    """VCR entity textization + candidate tensorization vs the reference's
    VCRDataset methods on a detached instance."""
    if OSCAR_ROOT not in sys.path:
        sys.path.insert(0, OSCAR_ROOT)
    _stub_pinned_transformers()
    from oscar.fewshot import vcr_nsp_cpt as ref_vcr

    ds = ref_vcr.VCRDataset.__new__(ref_vcr.VCRDataset)
    ds.args = types.SimpleNamespace(
        max_seq_length=24, max_img_seq_length=6,
        img_feature_type="faster_r-cnn", output_mode="classification")
    ds.tokenizer = TOK

    colors = {"0": "red", "1": "blue"}
    names = {"0": "person", "1": "person", "0_1": "people"}
    sentence = ["what", "is", [0], "doing", "with", [1], "?"]
    ref_text = ds._vcr_textize(sentence, colors, names, colorful=True)

    from cpt_tpu.data.prompts import vcr_textize

    assert vcr_textize(sentence, colors, names, colorful=True) == ref_text
    assert (vcr_textize(sentence, colors, names, colorful=False)
            == ds._vcr_textize(sentence, colors, names, colorful=False))

    # candidate tensorization
    import copy as pycopy

    feats = torch.zeros((4, 8))
    img_feat_tuple = ("im0", ["person"], feats, [], colors, names)
    example = types.SimpleNamespace(
        text_a=sentence, text_b=[[[0], "is", "red"], [[1], "is", "blue"]],
        label=[0], score=[1.0], q_id=0, img_key="im0")
    # the reference deep-copies the example per candidate
    outs = []
    for cand in example.text_b:
        fed = pycopy.deepcopy(example)
        fed.text_a = ds._vcr_textize(fed.text_a, colors, names)
        fed.text_b = ds._vcr_textize(cand, colors, names, colorful=True)
        # the bert model_type passes cls_token_segment_id=0
        # (vcr_nsp_cpt.py:320-326); the signature default (1) is dead code
        outs.append(ds._tensorize(fed, img_feat_tuple,
                                  cls_token="[CLS]", sep_token="[SEP]",
                                  cls_token_segment_id=0))

    from cpt_tpu.data.vcr import VCRCPTData, VCRExample

    ours_ds = VCRCPTData.__new__(VCRCPTData)
    ours_ds.tokenizer = TOK
    ours_ds.max_seq_len = 24
    ours_ds.img_seq_len = 6
    ours_ds.img_feat_dim = 8
    ours_ds.load_features = lambda key: (np.zeros((4, 8), np.float32),
                                         colors, names)
    ex = VCRExample("q0", "im0", sentence,
                    [[[0], "is", "red"], [[1], "is", "blue"]], label=0)
    cands = ours_ds.tensorize_example(ex)
    for (seq, _f), ref_out in zip(cands, outs):
        np.testing.assert_array_equal(seq.input_ids, ref_out[0].numpy())
        np.testing.assert_array_equal(seq.attention_mask, ref_out[1].numpy())
        np.testing.assert_array_equal(seq.segment_ids, ref_out[2].numpy())


def test_lr_schedule_matches_reference():
    if OSCAR_ROOT not in sys.path:
        sys.path.insert(0, OSCAR_ROOT)
    from oscar.utils.optim_sched import get_lr_sched

    from cpt_tpu.engine.train import OptimConfig, make_lr_schedule

    opts = types.SimpleNamespace(learning_rate=3e-4, warmup_steps=10,
                                 num_train_steps=100)
    ours = make_lr_schedule(OptimConfig(learning_rate=3e-4, warmup_steps=10,
                                        num_train_steps=100))
    for step in (0, 1, 5, 10, 11, 50, 99, 100, 150):
        ref = get_lr_sched(step, opts)
        got = float(ours(step))
        assert abs(got - ref) < 1e-9, (step, got, ref)


def test_refcoco_draw_rectangles_parity(rng):
    """Stage-1 color painting vs the reference RefCoCoDataset.draw_rectangles
    (rect path): per-pixel identical."""
    sys.path.insert(0, "/root/reference/prompt_feat")
    from PIL import Image

    # stubs for data-package imports not on the tested path
    for name, attrs in (
        ("pycocotools", {}), ("pycocotools.mask", {"decode": lambda *a: None}),
        ("pycocotools.coco", {"COCO": object}),
        ("cityscapesscripts", {}), ("cityscapesscripts.helpers",
                                    {"csHelpers": types.SimpleNamespace()}),
        ("cityscapesscripts.helpers.csHelpers", {}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            # permissive: unknown attributes become inert placeholders
            mod.__getattr__ = (lambda attr: (_ for _ in ()).throw(
                AttributeError(attr)) if attr.startswith("__")
                else (lambda *a, **k: None))
            sys.modules[name] = mod
            parent, _, child = name.rpartition(".")
            if parent in sys.modules:
                setattr(sys.modules[parent], child, mod)
    import reference_stubs

    reference_stubs.install()

    # detached instance: draw_rectangles only needs PIL
    import importlib
    ref_mod = importlib.import_module(
        "maskrcnn_benchmark.data.datasets.refcocodataset")

    class Holder:
        draw_rectangles = ref_mod.RefCoCoDataset.draw_rectangles

    import torch as _t

    class FakeTarget:
        def __init__(self, boxes):
            self.bbox = _t.tensor(boxes)

    img_arr = rng.randint(0, 256, (40, 50, 3)).astype(np.uint8)
    boxes = [[5.0, 7.0, 23.0, 31.0], [10.0, 2.0, 44.0, 20.0]]
    color = (240, 0, 30, 127)

    pil_img = Image.fromarray(img_arr.copy(), "RGB")
    Holder().draw_rectangles(pil_img, FakeTarget(boxes),
                             [color, color], mask=None)
    ref_out = np.array(pil_img)

    import jax.numpy as jnp
    from cpt_tpu.ops.render import paste_rects

    ours = paste_rects(jnp.asarray(img_arr),
                       jnp.asarray(np.asarray(boxes, np.float32)),
                       jnp.asarray(np.tile(np.asarray(color, np.uint8),
                                           (2, 1))),
                       jnp.ones((2,), bool), inclusive=False)
    np.testing.assert_array_equal(np.asarray(ours), ref_out)
