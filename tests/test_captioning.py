"""Captioning stack: seq2seq mask, tensorizer, training, greedy/beam
decoding, CIDEr-D, SCST, constrained beam search."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cpt_tpu.config.bert import tiny_bert_config
from cpt_tpu.engine.generation import (GenerationConfig, beam_search,
                                       decode_caption, greedy_or_sample)
from cpt_tpu.models.bert.captioning import (BertForImageCaptioning,
                                            CaptionTensorizer,
                                            caption_attention_mask,
                                            smoothed_caption_loss)
from cpt_tpu.utils.cbs import build_fsm, constrained_beam_search
from cpt_tpu.utils.cider import CiderD
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

CFG = tiny_bert_config(vocab_size=192, img_feature_dim=8,
                       max_position_embeddings=64)
LA, OD, IMG = 10, 4, 3
TOK = BertTokenizer(toy_vocab())
GEN = GenerationConfig(max_seq_a_len=LA, num_beams=3)


def test_caption_attention_mask_structure():
    m = caption_attention_mask(max_seq_a=6, od_len=3, img_len=2,
                               seq_a_len=4, od_valid=2, img_valid=2)
    # caption block triangular
    assert m[1, 0] == 1 and m[0, 1] == 0 and m[3, 3] == 1
    # caption rows beyond seq_a_len are dead
    assert m[4].sum() == 0
    # caption attends to od/img
    assert m[2, 6] == 1 and m[2, 9] == 1
    # od/img do not attend back to the caption
    assert m[6, 2] == 0 and m[9, 2] == 0
    # od <-> img mutual
    assert m[6, 9] == 1 and m[9, 6] == 1


def test_tensorizer_masking_slots():
    t = CaptionTensorizer(TOK, max_img_seq_len=IMG, max_seq_len=LA + OD,
                          max_seq_a_len=LA, max_masked_tokens=2)
    rng = random.Random(0)
    feats = np.ones((5, 8), np.float32)
    ids, segs, attn, f, mpos, mids, seq_a_len = t.tensorize(
        "the red dog", feats, text_b="dog cat", rng=rng)
    assert ids.shape == (LA + OD,) and attn.shape == (LA + OD + IMG,) * 2
    assert f.shape == (IMG, 8)
    n_masked = int((mids > 0).sum())
    assert 1 <= n_masked <= 2
    for j in range(n_masked):
        assert 1 <= mpos[j] < seq_a_len


def _setup_model():
    model = BertForImageCaptioning(CFG)
    t = CaptionTensorizer(TOK, max_img_seq_len=IMG, max_seq_len=LA + OD,
                          max_seq_a_len=LA, max_masked_tokens=2)
    feats = np.random.RandomState(0).randn(IMG, 8).astype(np.float32)
    ids, segs, attn, f, mpos, mids, _ = t.tensorize(
        "the red dog is", feats, text_b="dog", rng=random.Random(1))
    batch = (jnp.asarray(ids[None]), jnp.asarray(attn[None]),
             jnp.asarray(segs[None]), jnp.asarray(f[None]),
             jnp.asarray(mpos[None]), jnp.asarray(mids[None]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch[0], batch[1],
                                 batch[2], batch[3], batch[4], batch[5])
    return model, params, t, feats, batch


@pytest.mark.slow
def test_caption_training_loss_decreases():
    model, params, t, feats, _ = _setup_model()
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    caption = "the red dog is on the left"
    rng = random.Random(3)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            loss, _ = model.apply(p, *batch)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for i in range(30):
        ids, segs, attn, f, mpos, mids, _ = t.tensorize(
            caption, feats, text_b="dog", rng=rng)
        batch = (jnp.asarray(ids[None]), jnp.asarray(attn[None]),
                 jnp.asarray(segs[None]), jnp.asarray(f[None]),
                 jnp.asarray(mpos[None]), jnp.asarray(mids[None]))
        params, opt, loss = step(params, opt, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_smoothed_loss_excludes_padding():
    logits = jnp.zeros((3, 5))
    targets = jnp.asarray([2, 0, 0])   # two padded slots
    loss_one = smoothed_caption_loss(logits[:1], targets[:1], 0.0)
    loss_all = smoothed_caption_loss(logits, targets, 0.0)
    np.testing.assert_allclose(float(loss_one), float(loss_all), rtol=1e-6)


def _gen_context(feats):
    t = CaptionTensorizer(TOK, max_img_seq_len=IMG, max_seq_len=LA + OD,
                          max_seq_a_len=LA, is_train=False)
    ids, segs, attn, f, _, _, _ = t.tensorize("", feats, text_b="dog")
    return (jnp.asarray(segs[None]), jnp.asarray(attn[None]),
            jnp.asarray(f[None]))


@pytest.mark.slow
def test_greedy_and_beam_shapes():
    model, params, _, feats, _ = _setup_model()
    segs, attn, f = _gen_context(feats)
    tokens, scores = greedy_or_sample(model, params, GEN, segs, attn, f)
    assert tokens.shape == (1, LA) and int(tokens[0, 0]) == GEN.bos_token_id
    assert np.isfinite(float(scores[0]))

    btokens, bscores = beam_search(model, params, GEN, segs, attn, f)
    assert btokens.shape == (1, 1, LA)
    assert np.isfinite(np.asarray(bscores)).all()
    text = decode_caption(TOK, np.asarray(btokens[0, 0]), GEN)
    assert isinstance(text, str)


@pytest.mark.slow
def test_sampling_is_deterministic_given_key():
    import dataclasses

    model, params, _, feats, _ = _setup_model()
    segs, attn, f = _gen_context(feats)
    cfg = dataclasses.replace(GEN, do_sample=True, top_k=5)
    t1, _ = greedy_or_sample(model, params, cfg, segs, attn, f,
                             jax.random.PRNGKey(7))
    t2, _ = greedy_or_sample(model, params, cfg, segs, attn, f,
                             jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_cider_scores():
    refs = {"a": [["the", "red", "dog"], ["a", "red", "dog"]],
            "b": [["a", "blue", "cat"]]}
    scorer = CiderD(refs)
    perfect = scorer.score("a", ["the", "red", "dog"])
    partial = scorer.score("a", ["the", "dog"])
    wrong = scorer.score("a", ["purple", "train"])
    assert perfect > partial > wrong >= 0.0


def test_scst_advantages_baselines():
    from cpt_tpu.engine.scst import scst_advantages

    s = np.array([[1.0, 3.0, 5.0], [2.0, 2.0, 2.0]])
    g = np.array([2.0, 4.0])
    adv_g = scst_advantages(s, g, "greedy")
    np.testing.assert_allclose(adv_g, s - g[:, None])
    # leave-one-out sample baseline (caption_evaluate.py:143-144):
    # per image the advantages sum to zero
    adv_s = scst_advantages(s, None, "sample")
    np.testing.assert_allclose(adv_s.sum(1), 0.0, atol=1e-6)
    np.testing.assert_allclose(adv_s[0], [1.0 - 4.0, 3.0 - 3.0, 5.0 - 2.0])
    with pytest.raises(AssertionError):
        scst_advantages(s[:, :1], None, "sample")
    with pytest.raises(ValueError):
        scst_advantages(s, g, "mean")


def test_drop_worst_loss_excludes_worst_slots():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, 32, size=(8,)).astype(np.int32))
    full = smoothed_caption_loss(logits, targets, 0.1, 0.0)
    dropped = smoothed_caption_loss(logits, targets, 0.1, 0.25)
    # dropping the worst quarter can only lower the mean per-slot loss
    assert float(dropped) <= float(full)


@pytest.mark.slow
def test_scst_step_multisample_sample_baseline():
    from cpt_tpu.engine.scst import scst_step

    model, params, _, feats, _ = _setup_model()
    segs, attn, f = _gen_context(feats)
    refs = {"img0": [["the", "red", "dog"]]}
    scorer = CiderD(refs)
    grads, r_s, r_b = scst_step(model, params, None, GEN, scorer, TOK,
                                (segs, attn, f), ["img0"],
                                jax.random.PRNGKey(0), sample_n=3,
                                baseline_type="sample")
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.isfinite(r_s) and np.isfinite(r_b)


@pytest.mark.slow
def test_scst_step_finite():
    from cpt_tpu.engine.scst import scst_step

    model, params, _, feats, _ = _setup_model()
    segs, attn, f = _gen_context(feats)
    refs = {"img0": [["the", "red", "dog"]]}
    scorer = CiderD(refs)
    grads, r_s, r_g = scst_step(model, params, None, GEN, scorer, TOK,
                                (segs, attn, f), ["img0"],
                                jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.isfinite(r_s) and np.isfinite(r_g)


@pytest.mark.slow
def test_scst_step_beam_baseline_finite():
    """--sc_beam_size > 1: the SCST baseline decode runs beam search
    (reference run_captioning.py:543)."""
    from cpt_tpu.engine.scst import scst_step

    model, params, _, feats, _ = _setup_model()
    segs, attn, f = _gen_context(feats)
    refs = {"img0": [["the", "red", "dog"]]}
    scorer = CiderD(refs)
    grads, r_s, r_g = scst_step(model, params, None, GEN, scorer, TOK,
                                (segs, attn, f), ["img0"],
                                jax.random.PRNGKey(0), baseline_beams=2)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.isfinite(r_s) and np.isfinite(r_g)


@pytest.mark.slow
def test_untied_decoder_matches_tied_when_equal():
    """tie_weights=False (the reference captioning default,
    modeling_bert.py:616-625): the head owns a separate decoder table;
    with decoder == embedding table the logits equal the tied model's,
    and the converter imports cls.predictions.decoder.weight."""
    import dataclasses

    from cpt_tpu.utils.convert import (convert_bert_state_dict,
                                       random_oscar_state_dict)

    model_t, params_t, _, feats, batch = _setup_model()
    cfg_u = dataclasses.replace(CFG, tie_weights=False)
    model_u = BertForImageCaptioning(cfg_u)
    params_u = jax.jit(model_u.init)(jax.random.PRNGKey(0), *batch)
    assert "decoder" in params_u["params"]["mlm_head"]
    table = params_t["params"]["bert"]["embeddings"][
        "word_embeddings"]["embedding"]
    pu = jax.tree_util.tree_map(lambda x: x, params_t)  # copy of tied tree
    pu["params"]["mlm_head"] = dict(pu["params"]["mlm_head"],
                                    decoder=table)
    _, logits_t = model_t.apply(params_t, *batch[:4])
    _, logits_u = model_u.apply(pu, *batch[:4])
    np.testing.assert_allclose(np.asarray(logits_u), np.asarray(logits_t),
                               rtol=1e-6, atol=1e-6)

    # converter keeps the (diverged) decoder only when untied
    sd = random_oscar_state_dict(CFG, seed=3)
    conv_t = convert_bert_state_dict(sd, CFG)
    conv_u = convert_bert_state_dict(sd, cfg_u)
    assert "decoder" not in conv_t["mlm_head"]
    np.testing.assert_array_equal(conv_u["mlm_head"]["decoder"],
                                  sd["cls.predictions.decoder.weight"])


def test_freeze_params_zeroes_masked_updates():
    """engine.train.freeze_params: updates for paths containing the
    substring are exactly zero (requires_grad=False equivalent,
    --freeze_embedding)."""
    from cpt_tpu.engine.train import freeze_params

    params = {"bert": {"embeddings": {"word_embeddings":
                                      {"embedding": jnp.ones((4, 3))}},
                       "dense": {"kernel": jnp.ones((3, 3))}}}
    tx = freeze_params(optax.adam(1e-2), "word_embeddings")
    opt = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, opt, params)
    emb = upd["bert"]["embeddings"]["word_embeddings"]["embedding"]
    ker = upd["bert"]["dense"]["kernel"]
    assert float(jnp.abs(emb).max()) == 0.0
    assert float(jnp.abs(ker).max()) > 0.0


def test_fsm_single_and_phrase_constraints():
    # constraint 0: token 5; constraint 1: phrase (6, 7)
    trans, nsat = build_fsm([[5], [6, 7]], vocab_size=10)
    assert nsat[0] == 0
    s1 = trans[0, 5]
    assert nsat[s1] == 1            # single-token constraint satisfied
    chain = trans[0, 6]
    assert nsat[chain] == 0          # mid-phrase
    done = trans[chain, 7]
    assert nsat[done] == 1           # phrase completed
    assert trans[chain, 3] == 0      # broken phrase falls back
    both = trans[s1, 6]
    assert nsat[trans[both, 7]] == 2


def test_constrained_beam_search_forces_constraint():
    vocab = 10
    # logits always favor token 3; constraint token is 5
    def step_fn(params, tokens, step):
        base = np.full((tokens.shape[0], vocab), -5.0, np.float32)
        base[:, 3] = 5.0
        base[:, 5] = 2.0
        return jnp.asarray(base)

    trans, nsat = build_fsm([[5]], vocab_size=vocab)
    tokens, score = constrained_beam_search(
        step_fn, None, (), transitions=trans, num_satisfied=nsat,
        beams_per_state=2, max_len=6, bos_id=1, eos_id=2, pad_id=0,
        min_constraints=1)
    assert 5 in np.asarray(tokens).tolist(), "constraint token not emitted"


def test_bleu4():
    from cpt_tpu.utils.cider import bleu4

    refs = [["the", "red", "dog", "runs", "fast"]]
    assert bleu4(["the", "red", "dog", "runs", "fast"], refs) == pytest.approx(1.0)
    partial = bleu4(["the", "red", "dog"], refs)
    assert 0.0 < partial < 1.0
    assert bleu4(["purple", "train"], refs) < partial
    assert bleu4([], refs) == 0.0


def test_meteor_exact():
    from cpt_tpu.utils.cider import meteor_exact

    refs = [["the", "cat", "sat", "on", "the", "mat"]]
    perfect = meteor_exact(["the", "cat", "sat", "on", "the", "mat"], refs)
    # perfect match: fmean 1, single chunk -> penalty gamma*(1/6)^3
    assert perfect == pytest.approx(1.0 - 0.5 * (1 / 6) ** 3, abs=1e-9)
    partial = meteor_exact(["the", "cat", "sat"], refs)
    assert 0.0 < partial < perfect
    # scrambled order: same P/R but more chunks -> lower score
    scrambled = meteor_exact(["mat", "the", "on", "sat", "cat", "the"], refs)
    assert scrambled < perfect
    assert meteor_exact(["zebra"], refs) == 0.0
    assert meteor_exact([], refs) == 0.0
    # multiple references: best one wins
    two = meteor_exact(["a", "dog"], [["a", "dog"], ["the", "cat"]])
    assert two == pytest.approx(1.0 - 0.5 * (1 / 2) ** 3, abs=1e-9)


@pytest.mark.slow
def test_run_captioning_dataset_yaml(tmp_path):
    """--dataset_yaml: the reference CaptionTSVDataset layout (feature TSV
    with b64-concatenated features, label TSV, COCO-style caption json)
    drives run_captioning end-to-end without conversion."""
    import base64
    import json

    import yaml

    from cpt_tpu.tools.run_captioning import main
    from cpt_tpu.utils.tsv import tsv_writer

    rng = np.random.RandomState(0)
    D = 24
    feat_rows, label_rows, caps = [], [], []
    for q in range(6):
        feats = (rng.randn(4, D) * 0.1).astype(np.float32)
        feat_rows.append([f"im{q}", json.dumps(
            {"num_boxes": 4,
             "features": base64.b64encode(feats.tobytes()).decode()})])
        label_rows.append([f"im{q}", json.dumps(
            [{"class": "dog" if q % 2 else "cat"},
             {"class": "park"}])])
        caps.append({"image_id": f"im{q}",
                     "caption": f"the {'red dog' if q % 2 else 'blue cat'}"})
    tsv_writer(feat_rows, str(tmp_path / "features.tsv"))
    tsv_writer(label_rows, str(tmp_path / "labels.tsv"))
    json.dump(caps, open(tmp_path / "captions.json", "w"))
    yaml.safe_dump({"feature": "features.tsv", "label": "labels.tsv",
                    "caption": "captions.json"},
                   open(tmp_path / "cap.yaml", "w"))

    cider, outputs = main([
        "--dataset_yaml", str(tmp_path / "cap.yaml"),
        "--max_seq_length", "24", "--max_seq_a_length", "10",
        "--max_img_seq_length", "6", "--train_steps", "12",
        "--learning_rate", "3e-3", "--per_gpu_train_batch_size", "6",
        "--num_beams", "1",
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", str(D)])
    assert len(outputs) == 6 and np.isfinite(cider)

    # --val_yaml/--test_yaml (reference run_captioning.py:809-813):
    # during-training eval and the final decode run on held-out datasets
    feat_rows2, label_rows2, caps2 = [], [], []
    for q in range(3):
        feats = (rng.randn(4, D) * 0.1).astype(np.float32)
        feat_rows2.append([f"test{q}", json.dumps(
            {"num_boxes": 4,
             "features": base64.b64encode(feats.tobytes()).decode()})])
        label_rows2.append([f"test{q}", json.dumps([{"class": "park"}])])
        caps2.append({"image_id": f"test{q}", "caption": "a green park"})
    tsv_writer(feat_rows2, str(tmp_path / "features2.tsv"))
    tsv_writer(label_rows2, str(tmp_path / "labels2.tsv"))
    json.dump(caps2, open(tmp_path / "captions2.json", "w"))
    yaml.safe_dump({"feature": "features2.tsv", "label": "labels2.tsv",
                    "caption": "captions2.json"},
                   open(tmp_path / "cap2.yaml", "w"))

    cider2, outputs2 = main([
        "--dataset_yaml", str(tmp_path / "cap.yaml"),
        "--val_yaml", str(tmp_path / "cap2.yaml"),
        "--test_yaml", str(tmp_path / "cap2.yaml"),
        "--eval_every", "6", "--eval_subset", "2",
        "--max_seq_length", "24", "--max_seq_a_length", "10",
        "--max_img_seq_length", "6", "--train_steps", "6",
        "--learning_rate", "3e-3", "--per_gpu_train_batch_size", "6",
        "--num_beams", "1",
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", str(D)])
    assert set(outputs2) == {"test0", "test1", "test2"}
    assert np.isfinite(cider2)
