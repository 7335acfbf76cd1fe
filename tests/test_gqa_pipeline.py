"""GQA CPT pipeline: question rewrite, sequence layout, few-shot tuning."""
import json

import numpy as np
import pytest

from cpt_tpu.data.gqa import GQACPTData, load_gqa_examples, tensorize_gqa
from cpt_tpu.data.prompts import gqa_rewrite_question
from cpt_tpu.data.synthetic import generate_gqa_fixture
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def test_gqa_rewrite_inserts_colors():
    q = "what is the man holding"
    # entity "man" parsed ending at char 15 (after "man"), color red
    out = gqa_rewrite_question(q, [[[12], "red"]])
    assert out == "what is the red man holding"
    # two marks
    out2 = gqa_rewrite_question(q, [[[12], "red"], [[16], "blue"]])
    assert out2 == "what is the red man blue holding"


def test_gqa_sequence_layout():
    tok = BertTokenizer(toy_vocab())
    ids, segs, attn, mask_pos = tensorize_gqa(tok, "what color is the dog",
                                              num_img_feats=3,
                                              max_seq_len=12,
                                              max_img_seq_len=4)
    assert ids[0] == tok.cls_token_id and segs[0] == 1  # CLS seg-id 1
    assert ids[mask_pos] == tok.mask_token_id
    assert segs[mask_pos] == 1
    sep_positions = [i for i, t in enumerate(ids) if t == tok.sep_token_id]
    assert len(sep_positions) == 2
    assert mask_pos == sep_positions[0] + 1  # [MASK] right after first SEP
    assert attn.shape == (12 + 4,)
    assert attn[12:15].tolist() == [1, 1, 1] and attn[15] == 0


@pytest.fixture(scope="module")
def gqa_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa"))
    paths = generate_gqa_fixture(root, n_questions=9, feat_dim=24)
    tok = BertTokenizer(toy_vocab())
    data = GQACPTData(paths["img_feat_file"], paths["color_img_feat_file"],
                      load_gqa_examples(paths["questions"]),
                      json.load(open(paths["ans2label"])), tok,
                      max_seq_len=16, img_seq_len=6, img_feat_dim=24)
    return data, tok, paths


def test_gqa_color_rewrite_applied(gqa_data):
    data, tok, _ = gqa_data
    q, feats = data.features_for(data.examples[0])
    assert "red" in q  # rewrite inserted the color word
    assert feats.shape[1] == 24


def test_gqa_train_sampling_with_replacement(gqa_data):
    data, _, _ = gqa_data
    idxs = data.train_indices(n_sample=20, seed=88)
    assert len(idxs) == 20  # with replacement from 9 examples
    assert data.train_indices(20, 88) == idxs  # deterministic


def test_gqa_answer_token_ids(gqa_data):
    data, tok, _ = gqa_data
    assert data.answer_token_ids.tolist() == [
        tok.convert_tokens_to_ids("red"), tok.convert_tokens_to_ids("blue"),
        tok.convert_tokens_to_ids("green")]


@pytest.mark.slow
def test_gqa_cli_learns(tmp_path, gqa_data):
    _, _, paths = gqa_data
    from cpt_tpu.tools.gqa_cpt import main

    acc = main([
        "--img_feat_file", paths["img_feat_file"],
        "--color_img_feat_file", paths["color_img_feat_file"],
        "--questions", paths["questions"],
        "--ans2label", paths["ans2label"],
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", "24", "--max_seq_length", "16",
        "--max_img_seq_length", "6", "--n_sample", "18",
        "--num_train_epochs", "25", "--learning_rate", "5e-3",
        "--per_gpu_train_batch_size", "6",
        "--output", str(tmp_path / "val_results.pk"),
    ])
    assert acc >= 60.0, f"GQA prompt tuning failed to learn: acc={acc}"
    import pickle

    blob = pickle.load(open(tmp_path / "val_results.pk", "rb"))
    assert blob["accuracy"] == acc and len(blob["results"]) == 9

    # --val_img_feat_file/--val_color_img_feat_file: eval-split features
    # load from their own files (reference gqa_cpt.py:797-798,997-1002);
    # copies of the train files must reproduce the same accuracy
    import shutil

    shutil.copy(paths["img_feat_file"], tmp_path / "v.tsv")
    shutil.copy(paths["img_feat_file"].replace(".tsv", ".lineidx"),
                tmp_path / "v.lineidx")
    shutil.copy(paths["color_img_feat_file"], tmp_path / "vc.tsv")
    shutil.copy(paths["color_img_feat_file"].replace(".tsv", ".lineidx"),
                tmp_path / "vc.lineidx")
    acc2 = main([
        "--img_feat_file", paths["img_feat_file"],
        "--color_img_feat_file", paths["color_img_feat_file"],
        "--val_img_feat_file", str(tmp_path / "v.tsv"),
        "--val_color_img_feat_file", str(tmp_path / "vc.tsv"),
        "--questions", paths["questions"],
        "--val_questions", paths["questions"],
        "--ans2label", paths["ans2label"],
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", "24", "--max_seq_length", "16",
        "--max_img_seq_length", "6", "--n_sample", "18",
        "--num_train_epochs", "25", "--learning_rate", "5e-3",
        "--per_gpu_train_batch_size", "6",
    ])
    assert acc2 >= 60.0, acc2


@pytest.mark.slow
def test_gqa_ft_cli_learns(tmp_path, gqa_data):
    """FT baseline (reference fewshot/gqa_ft.py): raw question, plain
    features, fresh pooled linear classifier, CE over answer labels."""
    _, _, paths = gqa_data
    from cpt_tpu.tools.gqa_cpt import main

    acc = main([
        "--img_feat_file", paths["img_feat_file"],
        "--questions", paths["questions"],
        "--ans2label", paths["ans2label"],
        "--model_variant", "ft",
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", "24", "--max_seq_length", "16",
        "--max_img_seq_length", "6", "--n_sample", "18",
        "--num_train_epochs", "25", "--learning_rate", "5e-3",
        "--per_gpu_train_batch_size", "6",
    ])
    assert acc >= 60.0, f"GQA FT baseline failed to learn: acc={acc}"
