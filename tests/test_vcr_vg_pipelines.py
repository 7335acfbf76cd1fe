"""VCR and VG CPT pipelines: textization, candidate/width expansion,
scoring rules, CLI drivers learn on synthetic fixtures."""
import json

import numpy as np
import pytest

from cpt_tpu.data.prompts import vcr_textize, vg_prompt
from cpt_tpu.data.synthetic import generate_vcr_fixture, generate_vg_fixture
from cpt_tpu.data.vcr import VCRCPTData, load_vcr_examples
from cpt_tpu.data.vg import VGCPTData, reverse_imkey
from cpt_tpu.engine.evaluate import vg_recall_eval
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def test_vcr_textize():
    colors = {"0": "red", "1_2": "blue"}
    names = {"0": "person", "1_2": "people"}
    out = vcr_textize(["what", "is", [0], "doing", "with", [2, 1], "?"],
                      colors, names, colorful=True)
    assert out == "what is person in red doing with people in blue ?"
    out_plain = vcr_textize(["what", [0], "?"], colors, names, colorful=False)
    assert out_plain == "what person ?"
    # unknown entity falls back to bare name
    out_unk = vcr_textize([[5]], {}, {"5": "dog"})
    assert out_unk == "dog"


def test_vg_prompt_template():
    assert (vg_prompt("dog", "cat", 2) ==
            "dog in red color is [MASK] [MASK] a cat in blue color")


def test_reverse_imkey():
    assert reverse_imkey("im3.jpg_7_12") == "im3.jpg_12_7"


@pytest.fixture(scope="module")
def vcr_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vcr"))
    paths = generate_vcr_fixture(root, n_questions=8, feat_dim=24)
    tok = BertTokenizer(toy_vocab())
    data = VCRCPTData(paths["feat_file"], load_vcr_examples(paths["examples"]),
                      tok, max_seq_len=24, img_seq_len=6, img_feat_dim=24)
    return data, tok, paths


def test_vcr_batch_expansion(vcr_data):
    data, _, _ = vcr_data
    b, labels, meta = data.batch([0, 1])
    assert len(meta) == 8  # 2 examples x 4 candidates
    # correct candidate has nsp label 0, others 1
    gt0 = data.examples[0].label
    for i, (ex_i, ci) in enumerate(meta[:4]):
        assert labels[i] == (0 if ci == gt0 else 1)


def test_vcr_rationale_conditioning(vcr_data):
    data, tok, _ = vcr_data
    ex = data.examples[0]
    cands = data.tensorize_example(ex, use_rationale=True,
                                   chosen_answer=ex.label)
    assert len(cands) == len(ex.rationale_choices)
    # the chosen answer's text is folded into text_a
    ids = cands[0][0].input_ids.tolist()
    words = ["red", "blue", "green", "yellow"]
    chosen_word_id = tok.convert_tokens_to_ids(words[ex.label])
    assert chosen_word_id in ids  # answer text present in question


@pytest.mark.slow
def test_vcr_cli_learns(tmp_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vcr_learn"))
    paths = generate_vcr_fixture(root, n_questions=8, n_choices=2,
                                 feat_dim=24)
    from cpt_tpu.tools.vcr_nsp_cpt import main

    acc = main([
        "--feat_file", paths["feat_file"], "--examples", paths["examples"],
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", "24", "--max_seq_length", "24",
        "--max_img_seq_length", "6", "--num_train_epochs", "300",
        "--learning_rate", "3e-3", "--weight_decay", "0.0", "--seed", "1",
        "--per_gpu_train_batch_size", "8",
        "--per_gpu_eval_batch_size", "4",
        # the driver defaults to the reference's 1.0 global-norm clip
        # (vcr_nsp_cpt.py:458); this toy fixture's grad norms are far
        # above 1.0, so the clipped run needs ~10x the epochs — disable
        # for the learning-dynamics assertion (clip semantics are unit-
        # tested in test_refcoco_pipeline.py)
        "--max_grad_norm", "0",
        "--output", str(tmp_path / "results.pk"),
    ])
    # lr/epochs/seed chosen from a measured sweep (this tiny NSP task is
    # marginal under 0.1 dropout: 1e-2/150ep reached 75% on exactly one
    # rng stream and regressed when the attention-dropout stream moved;
    # 3e-3/300ep hits 100% on multiple seeds)
    assert acc >= 75.0, f"VCR NSP tuning failed to learn: acc={acc}"


def test_vcr_qar_twin_heads(vcr_data):
    _, _, paths = vcr_data
    from cpt_tpu.tools.vcr_nsp_cpt import main

    acc = main([
        "--feat_file", paths["feat_file"], "--examples", paths["examples"],
        "--task", "qar", "--hidden_size", "32", "--num_hidden_layers", "1",
        "--img_feature_dim", "24", "--max_seq_length", "24",
        "--max_img_seq_length", "6", "--per_gpu_eval_batch_size", "4",
    ])
    assert 0.0 <= acc <= 100.0


def test_vcr_val_feat_file(vcr_data, tmp_path):
    """--val_feat_file: eval features load from their own TSV (reference
    vcr_nsp_cpt.py:774-776,968-981 separate train/eval feature dirs); a
    copy of the train TSV must reproduce the same zero-shot accuracy."""
    import shutil

    _, _, paths = vcr_data
    from cpt_tpu.tools.vcr_nsp_cpt import main

    shutil.copy(paths["feat_file"], tmp_path / "v.tsv")
    shutil.copy(paths["feat_file"].replace(".tsv", ".lineidx"),
                tmp_path / "v.lineidx")
    base = main([
        "--feat_file", paths["feat_file"], "--examples", paths["examples"],
        "--val_examples", paths["examples"],
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--img_feature_dim", "24", "--max_seq_length", "24",
        "--max_img_seq_length", "6", "--per_gpu_eval_batch_size", "4",
    ])
    split = main([
        "--feat_file", paths["feat_file"], "--examples", paths["examples"],
        "--val_examples", paths["examples"],
        "--val_feat_file", str(tmp_path / "v.tsv"),
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--img_feature_dim", "24", "--max_seq_length", "24",
        "--max_img_seq_length", "6", "--per_gpu_eval_batch_size", "4",
    ])
    assert split == base


@pytest.fixture(scope="module")
def vg_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vg"))
    paths = generate_vg_fixture(root, n_pairs=6, feat_dim=24)
    tok = BertTokenizer(toy_vocab())
    data = VGCPTData(paths["feat_file"], tok, max_seq_len=32, img_seq_len=6,
                     img_feat_dim=24)
    return data, tok, paths


def test_vg_sequences_six_per_pair(vg_data):
    data, tok, _ = vg_data
    key, seqs, feats, labels = data.sequences(0, both_directions=True)
    assert len(seqs) == 6
    # width k sequence has k mask positions
    for k in range(3):
        assert len(seqs[k].mask_positions) == k + 1
        assert len(seqs[3 + k].mask_positions) == k + 1
    # labels: true relation at its width, fillers elsewhere
    rel_width = len(data.rel_token_ids(json.loads(
        data.tsv.seek(0)[1])["objects"][3]))
    assert labels[rel_width - 1] == data.rel_token_ids("on")


def test_vg_canonicalization(vg_data):
    data, tok, _ = vg_data
    assert data.rel_token_ids("has") == tok.convert_tokens_to_ids(
        tok.tokenize("having"))


def test_vg_recall_eval_perfect_predictions():
    gts = [{"img_path": "a.jpg", "relations": np.array([[0, 1, 2]])},
           {"img_path": "b.jpg", "relations": np.array([[3, 4, 1]])}]
    preds = {}
    logits = np.full(4, -10.0, np.float32)
    logits[2] = 5.0
    preds["a.jpg_0_1"] = logits
    logits2 = np.full(4, -10.0, np.float32)
    logits2[1] = 5.0
    preds["b.jpg_3_4"] = logits2
    out = vg_recall_eval(preds, gts, num_classes=4)
    assert out["R@20"] == 100.0 and out["R@100"] == 100.0
    # wrong pair direction → miss
    preds_bad = {"a.jpg_1_0": logits, "b.jpg_3_4": logits2}
    out_bad = vg_recall_eval(preds_bad, gts, num_classes=4)
    assert out_bad["R@20"] == 50.0


@pytest.mark.slow
def test_vg_cli_runs_and_scores(tmp_path, vg_data):
    _, _, paths = vg_data
    from cpt_tpu.tools.vg_cpt import main

    preds, recall = main([
        "--feat_file", paths["feat_file"],
        "--predicate_vocab", paths["predicate_vocab"],
        "--gt_file", paths["gt_file"],
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--img_feature_dim", "24", "--max_seq_length", "32",
        "--max_img_seq_length", "6",
        "--train_feat_file", paths["feat_file"],
        "--num_train_epochs", "6", "--learning_rate", "3e-3",
        "--per_gpu_train_batch_size", "3",
        "--output", str(tmp_path / "vg.pk"),
    ])
    assert len(preds) == 12  # 6 pairs x 2 directions
    assert recall is not None and 0.0 <= recall["R@20"] <= 100.0
