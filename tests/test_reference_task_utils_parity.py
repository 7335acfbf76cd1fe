"""Direct-execution parity with the reference's task_utils tensorization.

Executes the reference's own ``VQATextProcessor`` and
``convert_examples_to_features_vqa`` (``Oscar/oscar/utils/task_utils.py:84-664``,
the exact functions run_vqa.py:859 trains from) on a qla fixture and demands
that ``QlaVQAData.batch`` produces identical input_ids / segment_ids /
attention_mask / padded image features / labels / scores. The shared
tokenizer isolates the tensorization logic (tokenizer parity is covered by
the golden-vocab tests)."""
import json
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference/Oscar")

from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

D = 8


@pytest.fixture(scope="module")
def qla_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("qla_parity")
    rng = np.random.RandomState(0)
    feats, qla = {}, []
    texts = [
        "is the dog red",
        # long question: exercises _truncate_seq_pair's longer-pops-first
        "what is the color of the dog in the left of the red red red "
        "red red red red red red red red red picture",
        "is a cat on the left of the dog and the person",
        "what color",
    ]
    for q in range(8):
        # n > max_img_seq_length (6) for some rows exercises truncation
        n = [3, 9, 6, 1][q % 4]
        feats[f"im{q}"] = torch.tensor(
            rng.randn(n, D).astype(np.float32))
        qla.append({"q": texts[q % 4],
                    "o": "dog;cat;person" if q % 2 else "dog",
                    "an": [q % 2], "s": [1.0],
                    "img_id": f"im{q}", "q_id": q})
    # a no-answer row: skipped in train by both sides
    qla.append({"q": "is the dog red", "o": "dog", "an": [], "s": [],
                "img_id": "im0", "q_id": 99})
    torch.save(feats, root / "train2014_img_frcnn_feats.pt")
    json.dump(qla, open(root / "train2014_qla.json", "w"))
    return root, feats, qla


def test_vqa_tensorization_matches_reference(qla_fixture):
    root, feats, qla = qla_fixture
    from oscar.utils.task_utils import (VQATextProcessor,
                                        convert_examples_to_features_vqa)

    from cpt_tpu.data.vqa import QlaVQAData

    tok = BertTokenizer(toy_vocab())
    T, R = 16, 6

    examples = VQATextProcessor()._create_examples(qla, "train")
    img_feats_np = np.array(feats, dtype=object)   # .item() → the dict
    ref = convert_examples_to_features_vqa(
        examples, img_feats_np, list(range(2)), R, T, tok,
        "classification", cls_token="[CLS]", sep_token="[SEP]",
        cls_token_segment_id=0, pad_token_segment_id=0)

    data = QlaVQAData(str(root), "train2014", 2, tok,
                      max_seq_len=T, img_seq_len=R, img_feat_dim=D)
    assert len(data) == len(ref) == 8      # both skip the empty-an row
    b, soft, hard = data.batch(list(range(len(data))))

    for i, f in enumerate(ref):
        np.testing.assert_array_equal(b.input_ids[i], f.input_ids)
        np.testing.assert_array_equal(b.segment_ids[i], f.segment_ids)
        np.testing.assert_array_equal(b.attention_mask[i], f.input_mask)
        np.testing.assert_allclose(b.img_feats[i],
                                   np.asarray(f.img_feat), rtol=0, atol=0)
        assert hard[i] == f.label_id[0]
        assert soft[i, f.label_id[0]] == f.score[0]


def test_vqa_processor_examples_match_reference(qla_fixture):
    """Field-level parity of the example parse (od ';'→' ', empty-an skip,
    test split keeps empty-an rows)."""
    root, _, qla = qla_fixture
    from oscar.utils.task_utils import VQATextProcessor

    from cpt_tpu.data.vqa import QlaVQAData

    tok = BertTokenizer(toy_vocab())
    train_ref = VQATextProcessor()._create_examples(qla, "train")
    data = QlaVQAData(str(root), "train2014", 2, tok, max_seq_len=16,
                      img_seq_len=6, img_feat_dim=D)
    assert len(train_ref) == len(data.examples)
    for r, ours in zip(train_ref, data.examples):
        assert r.text_a == ours.question
        assert r.text_b == ours.od_text
        assert str(r.img_key) == ours.img_key
        assert {int(a) for a in r.label} == set(ours.label_scores)

    test_ref = VQATextProcessor()._create_examples(qla, "test")
    data_t = QlaVQAData(str(root), "train2014", 2, tok, max_seq_len=16,
                        img_seq_len=6, img_feat_dim=D, is_test=True)
    assert len(test_ref) == len(data_t.examples) == 9


def test_pretrain_tensorization_matches_reference(qla_fixture, monkeypatch):
    """Pretrain feature conversion parity: the reference's own
    ``oscar_tsv.convert_example_to_features`` (oscar_tsv.py:660-786)
    executed directly vs ``OscarPretrainData.batch`` with masking and
    corruption disabled (random patched >0.15 on both sides so
    ``random_word`` is a deterministic no-op) — input_ids / segment_ids /
    attention_mask / MLM labels identical, including the longer-pops-first
    truncation and the image-mask layout."""
    import random as _random
    import types

    sys.path.insert(0, "/root/reference/Oscar")
    import pytorch_transformers_shim as _shim

    _shim.install()
    from oscar.datasets import oscar_tsv

    from cpt_tpu.data.pretrain import OscarPretrainData
    from cpt_tpu.utils.tsv import encode_feature, tsv_writer

    tok = BertTokenizer(toy_vocab())
    T, R = 16, 6
    rng = np.random.RandomState(0)
    rows, caps = [], {}
    texts = ["the red dog", "a person on the left of the dog and the cat "
             "and a man and a woman on the right", "what color"]
    for q in range(3):
        n = [3, 9, 1][q]
        f = rng.randn(n, D).astype(np.float32) * 0.1
        classes = ["dog" if b % 2 else "cat" for b in range(n)]
        rows.append([f"im{q}", json.dumps({"objects": [
            {"rect": [0, 0, 5, 5], "class": c, "conf": 0.9,
             "feature": encode_feature(ff)}
            for c, ff in zip(classes, f)]})])
        caps[f"im{q}"] = texts[q]
    import tempfile

    d = tempfile.mkdtemp()
    tsv_writer(rows, f"{d}/p.tsv")

    monkeypatch.setattr(oscar_tsv.random, "random", lambda: 0.99)

    class NoMaskRng:
        def random(self):
            return 0.99           # never mask, never corrupt

        def choice(self, seq):
            return seq[0]

    data = OscarPretrainData(f"{d}/p.tsv", caps, tok, T, R,
                             img_feat_dim=D, text_b_swap_prob=0.0)
    ids, segs, attn, feats, mlm, contrast = data.batch(
        list(range(len(data))), NoMaskRng())

    args = types.SimpleNamespace(num_contrast_classes=2,
                                 texta_false_prob=0.0,
                                 mask_loss_for_unmatched=True,
                                 max_img_seq_length=R)
    for i, key in enumerate(data.keys):
        f, od = data._feats(key)
        ex = types.SimpleNamespace(guid=9, tokens_a=tok.tokenize(caps[key]),
                                   tokens_b=tok.tokenize(od), is_next=0,
                                   is_img_match=0)
        ref = oscar_tsv.convert_example_to_features(
            args, ex, T, tok, min(f.shape[0], R))
        np.testing.assert_array_equal(ids[i], ref.input_ids)
        np.testing.assert_array_equal(segs[i], ref.segment_ids)
        np.testing.assert_array_equal(attn[i], ref.input_mask)
        np.testing.assert_array_equal(mlm[i], ref.lm_label_ids)
        assert contrast[i] == ref.is_next
