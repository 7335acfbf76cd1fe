"""Foundation-layer tests: config tree, TSV IO, tokenizer, box ops."""
import dataclasses
import os

import numpy as np
import pytest

from cpt_tpu.config import core as cfgcore
from cpt_tpu.config.bert import BertConfig, tiny_bert_config
from cpt_tpu.utils import tsv as tsvlib
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def test_config_merge_and_overrides():
    cfg = BertConfig()
    cfg2 = cfgcore.merge_dict(cfg, {"hidden_size": 1024, "num_attention_heads": 16})
    assert cfg2.hidden_size == 1024 and cfg2.num_attention_heads == 16
    assert cfg.hidden_size == 768  # original untouched
    cfg3 = cfgcore.replace_path(cfg, "vocab_size", "30000")
    assert cfg3.vocab_size == 30000  # string coerced to int
    with pytest.raises(KeyError):
        cfgcore.merge_dict(cfg, {"not_a_key": 1})


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("hidden_size: 96\nimg_feature_dim: 10\n")
    cfg = cfgcore.from_yaml(BertConfig, str(p), opts={"num_labels": 4})
    assert cfg.hidden_size == 96 and cfg.img_feature_dim == 10 and cfg.num_labels == 4


def test_tsv_roundtrip(tmp_path):
    path = str(tmp_path / "pred.tsv")
    rows = [["img1", '{"a": 1}'], ["img2", '{"b": 2}'], ["img3", "x\ty"[:1]]]
    tsvlib.tsv_writer(rows, path)
    assert os.path.exists(tsvlib.lineidx_path(path))
    f = tsvlib.TSVFile(path)
    assert len(f) == 3
    assert f.seek(1) == ["img2", '{"b": 2}']
    assert f.seek(0)[0] == "img1"
    # lineidx regeneration path
    os.remove(tsvlib.lineidx_path(path))
    f2 = tsvlib.TSVFile(path)
    assert f2.seek(2)[0] == "img3"


def test_tsv_merge_shards(tmp_path):
    p1, p2 = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    tsvlib.tsv_writer([["k1", "v1"]], p1)
    tsvlib.tsv_writer([["k2", "v2"], ["k3", "v3"]], p2)
    out = str(tmp_path / "merged.tsv")
    tsvlib.merge_tsv_shards([p1, p2], out)
    f = tsvlib.TSVFile(out)
    assert [r[0] for r in f] == ["k1", "k2", "k3"]


def test_feature_codec_roundtrip(rng):
    feats = rng.randn(7, 2054).astype(np.float32)
    encoded = tsvlib.encode_features(feats)
    decoded = tsvlib.decode_features(encoded)
    np.testing.assert_array_equal(feats, decoded)


def test_tokenizer_basics():
    tok = BertTokenizer(toy_vocab())
    assert tok.mask_token_id == 103
    assert tok.cls_token_id == 101 and tok.sep_token_id == 102
    ids = tok.convert_tokens_to_ids(["red", "none"])
    assert all(isinstance(i, int) for i in ids)
    # wordpiece splitting: "colors" -> "color" + "##s"
    assert tok.tokenize("The colors.") == ["the", "color", "##s", "."]
    # punctuation split + lowercase + unknown fallback
    toks = tok.tokenize("Red, blue?")
    assert toks == ["red", ",", "blue", "?"]
    assert tok.convert_tokens_to_ids("zzzunknown") == 100  # [UNK]


def test_tokenizer_mask_never_split():
    tok = BertTokenizer(toy_vocab())
    toks = tok.tokenize("the dog is in [MASK] color.")
    assert "[MASK]" in toks
    assert tok.convert_tokens_to_ids("[MASK]") == 103


def test_box_iou_matches_reference_convention():
    import jax.numpy as jnp
    from cpt_tpu.structures.boxes import box_iou, xywh_iou

    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])   # 10x10 inclusive
    b = jnp.array([[5.0, 5.0, 14.0, 14.0]])
    iou = box_iou(a, b)[0, 0]
    # inter = 5*5, union = 100+100-25
    assert abs(float(iou) - 25.0 / 175.0) < 1e-6
    # host-side xywh variant agrees
    host = xywh_iou([0, 0, 10, 10], [5, 5, 10, 10])
    assert abs(host - 25.0 / 175.0) < 1e-9


def test_box_iou_np_matches_device_twin(rng):
    import jax.numpy as jnp
    from cpt_tpu.structures.boxes import box_iou, box_iou_np

    a = rng.rand(7, 4) * 50
    b = rng.rand(5, 4) * 50
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    np.testing.assert_allclose(box_iou_np(a, b),
                               np.asarray(box_iou(jnp.asarray(a),
                                                  jnp.asarray(b))),
                               rtol=1e-5)


def test_box_encode_decode_roundtrip(rng):
    import jax.numpy as jnp
    from cpt_tpu.structures.boxes import decode_boxes, encode_boxes

    anchors = jnp.array(rng.uniform(0, 100, (16, 2)).astype(np.float32))
    anchors = jnp.concatenate([anchors, anchors + rng.uniform(5, 50, (16, 2)).astype(np.float32)], -1)
    gt = anchors + 3.0
    weights = (10.0, 10.0, 5.0, 5.0)
    deltas = encode_boxes(gt, anchors, weights)
    back = decode_boxes(deltas, anchors, weights)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_pad_boxes():
    from cpt_tpu.structures.boxes import pad_boxes

    xyxy, mask, extra = pad_boxes(
        [[0, 0, 1, 1], [2, 2, 3, 3]], 5, extra={"score": [0.5, 0.25]}
    )
    assert xyxy.shape == (5, 4) and mask.tolist() == [True, True, False, False, False]
    assert extra["score"].shape == (5,) and extra["score"][1] == 0.25


def test_box_codec_roundtrip_fuzz():
    """decode(encode(gt, ref), ref) == gt across random boxes (the +1
    width convention must cancel exactly)."""
    import jax.numpy as jnp
    import numpy as np

    from cpt_tpu.structures.boxes import decode_boxes, encode_boxes

    rng = np.random.RandomState(11)
    for _ in range(10):
        n = int(rng.randint(1, 20))

        def boxes(k):
            p = rng.uniform(0, 500, (k, 4))
            return np.stack(
                [np.minimum(p[:, 0], p[:, 2]),
                 np.minimum(p[:, 1], p[:, 3]),
                 np.maximum(p[:, 0], p[:, 2]) + 1.0,
                 np.maximum(p[:, 1], p[:, 3]) + 1.0],
                -1).astype(np.float32)

        gt = boxes(n)
        ref = boxes(n)
        w = (10.0, 10.0, 5.0, 5.0)
        deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(ref), w)
        back = decode_boxes(deltas, jnp.asarray(ref), w)
        np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-3,
                                   atol=1e-2)
