"""Multi-corpus pretraining mixing (reference oscar_tsv.py yaml format):
dataset filtering, chunk-range sharding, cross-corpus text-b swaps, and
the driver's --yaml path."""
import json
import random

import numpy as np
import pytest

from cpt_tpu.data.pretrain import MultiCorpusPretrainData
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab
from cpt_tpu.utils.tsv import encode_feature, tsv_writer

D = 16


def _feat_rows(rng, keys):
    rows = []
    for k in keys:
        feats = rng.randn(3, D).astype(np.float32) * 0.1
        boxlist = [{"rect": [0, 0, 5, 5], "class": "dog", "conf": 0.9,
                    "feature": encode_feature(f)} for f in feats]
        rows.append([k, json.dumps({"objects": boxlist})])
    return rows


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oscar_corpus")
    rng = np.random.RandomState(0)
    tsv_writer(_feat_rows(rng, [f"c{i}" for i in range(4)]),
               str(root / "coco_features.tsv"))
    tsv_writer(_feat_rows(rng, [f"f{i}" for i in range(3)]),
               str(root / "flickr_features.tsv"))
    # chunked googlecc: 2 chunks of 2
    tsv_writer(_feat_rows(rng, ["g0", "g1"]), str(root / "cc_chunk0.tsv"))
    tsv_writer(_feat_rows(rng, ["g2", "g3"]), str(root / "cc_chunk1.tsv"))

    corpus = ([[f"coco_c{i}", f"a dog picture {i}"] for i in range(4)]
              + [[f"flickr30k_f{i}", f"red cat {i}"] for i in range(3)]
              + [[f"cc_g{i}", f"cc caption {i}"] for i in range(4)]
              + [["sbu_x0", "excluded dataset row"]])
    tsv_writer(corpus, str(root / "corpus.tsv"))
    (root / "pretrain.yaml").write_text(
        "corpus: coco_flickr30k_googlecc\n"
        "corpus_file: corpus.tsv\n"
        "image_feature_path:\n"
        "  coco: coco_features.tsv\n"
        "  flickr30k: flickr_features.tsv\n"
        "  googlecc:\n"
        "    \"0\": cc_chunk0.tsv\n"
        "    \"1\": cc_chunk1.tsv\n"
        "  sbu: missing.tsv\n")
    return root


def test_mixing_and_dataset_filter(corpus_root):
    tok = BertTokenizer(toy_vocab())
    data = MultiCorpusPretrainData(str(corpus_root / "pretrain.yaml"), tok,
                                   max_seq_len=24, img_seq_len=4,
                                   img_feat_dim=D)
    # 4 coco + 3 flickr + 4 googlecc; sbu row excluded (not in corpus...
    # well, sbu IS outside `corpus` names -> skipped)
    assert len(data) == 11
    ds = {k.split("_")[0] for k in data.keys}
    assert ds == {"coco", "flickr30k", "googlecc"}
    # batches build, swaps sample across the union
    rng = random.Random(0)
    ids, segs, attn, feats, mlm, contrast = data.batch(
        list(range(8)), rng, pad_to=8)
    assert ids.shape == (8, 24) and feats.shape == (8, 4, D)
    assert set(np.unique(contrast)) <= {0, 1}


def test_chunk_range_sharding(corpus_root):
    tok = BertTokenizer(toy_vocab())
    data = MultiCorpusPretrainData(str(corpus_root / "pretrain.yaml"), tok,
                                   max_seq_len=24, img_seq_len=4,
                                   img_feat_dim=D,
                                   chunk_start_id=0, chunk_end_id=1)
    # googlecc restricted to chunk 0 -> only g0, g1
    cc = [k for k in data.keys if k.startswith("googlecc")]
    assert sorted(cc) == ["googlecc_g0", "googlecc_g1"]
    assert len(data) == 9


@pytest.mark.slow
def test_driver_yaml_path(corpus_root, tmp_path):
    from cpt_tpu.tools.run_oscarplus_pretrain import main

    losses = main(["--yaml", str(corpus_root / "pretrain.yaml"),
                   "--train_steps", "4", "--per_gpu_train_batch_size", "4",
                   "--max_seq_length", "24", "--max_img_seq_length", "4",
                   "--hidden_size", "32", "--num_hidden_layers", "1",
                   "--img_feature_dim", str(D), "--dtype", "float32"])
    assert len(losses) == 4 and all(np.isfinite(l) for l in losses)
