"""Parity vs the REFERENCE's own BertForImageCaptioning, executed directly
(`/root/reference/Oscar/oscar/modeling/modeling_bert.py:604-913` via
``pytorch_transformers_shim``): the label-smoothed masked training loss,
the inference logits, and a FULL GREEDY DECODE through the reference's
``generate``/``_generate_no_beam_search``/``prepare_inputs_for_generation``
machinery vs our fixed-canvas decoding loop (``engine/generation``).
"""
import os.path as op
import sys

import numpy as np
import pytest

import jax.numpy as jnp
import torch

sys.path.insert(0, op.dirname(op.abspath(__file__)))
import pytorch_transformers_shim as shim

from cpt_tpu.config.bert import tiny_bert_config
from cpt_tpu.engine.generation import GenerationConfig, greedy_or_sample
from cpt_tpu.models.bert.captioning import (BertForImageCaptioning,
                                            caption_attention_mask)
from cpt_tpu.utils import convert as cv

OSCAR_ROOT = "/root/reference/Oscar"

shim.install()
if OSCAR_ROOT not in sys.path:
    sys.path.insert(0, OSCAR_ROOT)

ref_mb = pytest.importorskip("oscar.modeling.modeling_bert")

BOS, EOS, MASK, PAD = 101, 102, 103, 0


def _np(x):
    return x.detach().numpy()


def _cfg(**kw):
    return tiny_bert_config(max_position_embeddings=96, **kw)


def _ref_config(cfg, **extra):
    return shim.BertConfig(
        vocab_size_or_config_json_file=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps,
        img_feature_dim=cfg.img_feature_dim,
        img_feature_type=cfg.img_feature_type,
        use_img_layernorm=False, img_layer_norm_eps=cfg.img_layer_norm_eps,
        tie_weights=True, freeze_embedding=False,
        **extra)


def _build(cfg, seed=0, **ref_extra):
    torch.manual_seed(seed)
    ref = ref_mb.BertForImageCaptioning(_ref_config(cfg, **ref_extra))
    ref.eval()
    # BertOnlyMLMHead keys are cls.predictions.* — the pretraining layout
    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    ours_params = {"bert": params["bert"], "mlm_head": params["mlm_head"]}
    return ref, ours_params


def _canvas(cfg, B=2, La=8, R=3, seed=1):
    """Caption-only canvas (no od labels): [La text][R img]."""
    rng = np.random.RandomState(seed)
    S = La + R
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    mask = np.stack([caption_attention_mask(La, 0, R, La, 0, R)
                     for _ in range(B)])
    tt = np.zeros((B, La), np.int32)
    return feats, mask, tt, S


@pytest.mark.parametrize("drop_worst", [0.0, 0.25])
def test_caption_training_loss_parity(drop_worst):
    """Reference encode_forward(is_training=True) + BertCaptioningLoss vs
    our masked forward + smoothed_caption_loss."""
    cfg = _cfg()
    ref, params = _build(cfg, seed=0, label_smoothing=0.1,
                         drop_worst_ratio=drop_worst, drop_worst_after=0)
    B, La, R, M = 2, 8, 3, 2
    feats, mask, tt, S = _canvas(cfg)
    rng = np.random.RandomState(2)
    ids = rng.randint(4, cfg.vocab_size, (B, La)).astype(np.int32)
    ids[:, 0] = BOS
    masked_pos_idx = np.array([[2, 5], [3, 6]], np.int32)
    masked_ids = rng.randint(4, cfg.vocab_size, (B, M)).astype(np.int64)
    indicator = np.zeros((B, La), np.int64)
    for b in range(B):
        indicator[b, masked_pos_idx[b]] = 1

    # the reference loss keeps drop-worst INACTIVE until iter >
    # drop_worst_after; its counter starts at 0 and increments before the
    # check, so the first call is always undropped — advance it once
    if drop_worst > 0:
        ref.loss.iter = 1

    with torch.no_grad():
        loss_t, logits_t = ref.encode_forward(
            torch.tensor(ids, dtype=torch.long), torch.tensor(feats),
            torch.tensor(mask, dtype=torch.long),
            torch.tensor(indicator),
            masked_ids=torch.tensor(masked_ids),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            is_training=True)[:2]

    ours = BertForImageCaptioning(cfg)
    loss_j, logits_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt), img_feats=jnp.asarray(feats),
        masked_pos=jnp.asarray(masked_pos_idx),
        masked_ids=jnp.asarray(masked_ids.astype(np.int32)),
        label_smoothing=0.1, drop_worst_ratio=drop_worst)
    np.testing.assert_allclose(np.asarray(logits_j).reshape(-1,
                                                            cfg.vocab_size),
                               _np(logits_t), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_caption_inference_logits_parity():
    cfg = _cfg()
    ref, params = _build(cfg, seed=1)
    B, La, R = 2, 8, 3
    feats, mask, tt, S = _canvas(cfg, seed=4)
    rng = np.random.RandomState(5)
    ids = rng.randint(4, cfg.vocab_size, (B, La)).astype(np.int32)

    with torch.no_grad():
        (logits_t,) = ref.encode_forward(
            torch.tensor(ids, dtype=torch.long), torch.tensor(feats),
            torch.tensor(mask, dtype=torch.long),
            torch.tensor(np.ones((B, La), np.int64)),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            is_training=False)[:1]

    ours = BertForImageCaptioning(cfg)
    _, logits_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt), img_feats=jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(logits_j)[:, :La], _np(logits_t),
                               atol=2e-5, rtol=1e-4)


def test_caption_greedy_decode_parity():
    """Full greedy decode: the reference's generate() (no-past recompute
    mode, its real prepare_inputs_for_generation slicing) must produce the
    same token sequences as our fixed-canvas scan decoder."""
    cfg = _cfg()
    ref, params = _build(cfg, seed=2)
    B, La, R = 3, 10, 3
    rng = np.random.RandomState(6)
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    full_mask = np.stack([caption_attention_mask(La, 0, R, La, 0, R)
                          for _ in range(B)])
    tt = np.zeros((B, La), np.int64)

    with torch.no_grad():
        out_ids, out_logprobs = ref.generate(
            torch.tensor(feats),
            torch.tensor(full_mask, dtype=torch.long),
            torch.tensor(np.ones((B, La), np.int64)),   # masked_pos
            token_type_ids=torch.tensor(tt),
            input_ids=torch.zeros((B, La), dtype=torch.long),
            max_length=La, do_sample=False, num_beams=1,
            temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
            bos_token_id=BOS, pad_token_id=PAD, eos_token_ids=[EOS],
            mask_token_id=MASK, length_penalty=1.0,
            num_return_sequences=1, num_keep_best=1, is_decode=True,
            od_labels_start_posid=La)

    gen_cfg = GenerationConfig(max_seq_a_len=La, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD,
                               mask_token_id=MASK)
    ours = BertForImageCaptioning(cfg)
    tokens, scores = greedy_or_sample(
        ours, {"params": params}, gen_cfg, jnp.asarray(tt.astype(np.int32)),
        jnp.asarray(full_mask), jnp.asarray(feats))

    ref_rows = _np(out_ids[:, 0])            # [B, La] incl. BOS
    our_rows = np.asarray(tokens)
    for b in range(B):
        ref_seq = ref_rows[b].tolist()
        our_seq = our_rows[b].tolist()       # [BOS, t1, t2, ...]
        n_steps = None
        for i, t in enumerate(ref_seq):
            if t == EOS and i == len(ref_seq) - 1 and our_seq[i] != EOS:
                # reference force-writes EOS into the last slot when the
                # length budget runs out (modeling_utils.py: cur_len ==
                # max_length branch); the greedy token itself still matches
                n_steps = i
                break
            assert our_seq[i] == t, (b, i, ref_seq, our_seq)
            if t == EOS:
                n_steps = i
                break
        if n_steps is None:
            n_steps = len(ref_seq) - 1
        # reference returns MEAN logprob over the generated tokens; ours
        # is the SUM over the same steps (the forced-EOS slot keeps the
        # pre-replacement token's logprob on both sides)
        np.testing.assert_allclose(float(np.asarray(scores)[b]),
                                   float(_np(out_logprobs[:, 0])[b])
                                   * n_steps, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("num_beams,num_keep_best,length_penalty",
                         [(2, 1, 1.0), (3, 2, 0.6)])
def test_caption_beam_decode_parity(num_beams, num_keep_best,
                                    length_penalty):
    """Full beam decode: the reference's _generate_beam_search +
    BeamHypotheses (hypothesis bank, 2K-candidate fan-out, length-penalty
    normalization, EOS appended at decode) vs our static-shape scan beam
    search — identical hypothesis token rows and normalized scores."""
    from cpt_tpu.engine.generation import beam_search

    cfg = _cfg()
    ref, params = _build(cfg, seed=3)
    B, La, R = 2, 9, 3
    rng = np.random.RandomState(9)
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    full_mask = np.stack([caption_attention_mask(La, 0, R, La, 0, R)
                          for _ in range(B)])
    tt = np.zeros((B, La), np.int64)

    with torch.no_grad():
        out_ids, out_logprobs = ref.generate(
            torch.tensor(feats),
            torch.tensor(full_mask, dtype=torch.long),
            torch.tensor(np.ones((B, La), np.int64)),
            token_type_ids=torch.tensor(tt),
            input_ids=torch.zeros((B, La), dtype=torch.long),
            max_length=La, do_sample=False, num_beams=num_beams,
            temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
            bos_token_id=BOS, pad_token_id=PAD, eos_token_ids=[EOS],
            mask_token_id=MASK, length_penalty=length_penalty,
            num_return_sequences=1, num_keep_best=num_keep_best,
            is_decode=True, od_labels_start_posid=La)

    gen_cfg = GenerationConfig(max_seq_a_len=La, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD,
                               mask_token_id=MASK, num_beams=num_beams,
                               num_keep_best=num_keep_best,
                               length_penalty=length_penalty)
    ours = BertForImageCaptioning(cfg)
    tokens, scores = beam_search(
        ours, {"params": params}, gen_cfg, jnp.asarray(tt.astype(np.int32)),
        jnp.asarray(full_mask), jnp.asarray(feats))

    ref_ids = _np(out_ids)                  # [B, nb, La]
    ref_lp = _np(out_logprobs)              # [B, nb]
    our_ids = np.asarray(tokens)
    our_sc = np.asarray(scores)
    assert our_ids.shape == ref_ids.shape
    for b in range(B):
        for h in range(num_keep_best):
            assert our_ids[b, h].tolist() == ref_ids[b, h].tolist(), (
                b, h, ref_ids[b], our_ids[b])
            np.testing.assert_allclose(our_sc[b, h], ref_lp[b, h],
                                       rtol=1e-4, atol=1e-5)


def test_caption_cbs_decode_parity():
    """Constrained beam search: the reference's generate(use_cbs=True) —
    its vendored updown ConstrainedBeamSearch over an FSM adjacency +
    select_best_beam_with_constraints — vs our dense-FSM scan CBS.
    Same winning token row and normalized score."""
    from cpt_tpu.engine.generation import make_step_logits_fn
    from cpt_tpu.utils.cbs import build_fsm, constrained_beam_search

    cfg = _cfg()
    ref, params = _build(cfg, seed=5)
    La, R, K = 9, 3, 3
    constraints = [[7], [11, 13]]          # single token + 2-token phrase
    trans, nsat = build_fsm(constraints, cfg.vocab_size)
    S, V = trans.shape
    adj = np.zeros((1, S, S, V), np.int64)
    adj[0, np.arange(S)[:, None], trans, np.arange(V)[None, :]] = 1

    ours = BertForImageCaptioning(cfg)
    gen_cfg = GenerationConfig(max_seq_a_len=La, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD,
                               mask_token_id=MASK, num_beams=K)
    base_step = make_step_logits_fn(ours, gen_cfg)

    for img_seed in (10, 11):
        rng = np.random.RandomState(img_seed)
        feats = rng.randn(1, R, cfg.img_feature_dim).astype(np.float32)
        full_mask = caption_attention_mask(La, 0, R, La, 0, R)[None]
        tt = np.zeros((1, La), np.int64)

        with torch.no_grad():
            out_ids, out_lp = ref.generate(
                torch.tensor(feats),
                torch.tensor(full_mask, dtype=torch.long),
                torch.tensor(np.ones((1, La), np.int64)),
                token_type_ids=torch.tensor(tt),
                input_ids=torch.zeros((1, La), dtype=torch.long),
                max_length=La, do_sample=False, num_beams=K,
                temperature=1.0, top_k=0, top_p=1.0,
                repetition_penalty=1.0, bos_token_id=BOS, pad_token_id=PAD,
                eos_token_ids=[EOS], mask_token_id=MASK, length_penalty=1.0,
                num_return_sequences=1, num_keep_best=1, is_decode=True,
                od_labels_start_posid=La, use_cbs=True,
                fsm=torch.tensor(adj),
                num_constraints=torch.tensor([len(constraints)]),
                min_constraints_to_satisfy=2)

        def step_fn(params, tokens, step, segs, attn, f,
                    _bs=base_step):
            n = tokens.shape[0]
            return _bs(params, tokens, step, jnp.repeat(segs, n, 0),
                       jnp.repeat(attn, n, 0), jnp.repeat(f, n, 0))

        ctx = (jnp.asarray(tt.astype(np.int32)), jnp.asarray(full_mask),
               jnp.asarray(feats))
        toks, score = constrained_beam_search(
            step_fn, {"params": params}, ctx, transitions=trans,
            num_satisfied=nsat, beams_per_state=K, max_len=La,
            bos_id=BOS, eos_id=EOS, pad_id=PAD, min_constraints=2,
            num_group_states=1 << len(constraints))

        ref_row = _np(out_ids[0, 0]).tolist()   # generated tokens, EOS-pad
        our_row = np.asarray(toks).tolist()     # BOS + generated + EOS/PAD
        assert our_row[0] == BOS
        for i, t in enumerate(ref_row):
            if 1 + i >= len(our_row):
                # reference pads the canvas tail with artificial EOS
                assert t == EOS, (img_seed, i, ref_row, our_row)
                break
            assert our_row[1 + i] == t, (img_seed, i, ref_row, our_row)
            if t == EOS:
                break
        np.testing.assert_allclose(float(score), float(_np(out_lp[0, 0])),
                                   rtol=1e-4, atol=1e-5)


def test_caption_decode_with_od_labels_parity():
    """Greedy AND beam decode with od-label context: the reference feeds
    the od token ids through generate(add_od_labels=True); our decoders
    must carry them via base_ids (the canvas previously zeroed them — a
    real conditioning bug this test pins)."""
    from cpt_tpu.engine.generation import beam_search
    from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

    class _Tok(BertTokenizer):
        mask_token, cls_token, sep_token, pad_token = (
            "[MASK]", "[CLS]", "[SEP]", "[PAD]")

    tok = _Tok(toy_vocab(["red", "dog", "park", "cat", "bench"]))
    cfg = _cfg(vocab_size=len(tok.vocab))
    ref, params = _build(cfg, seed=6)
    B, La, L, R = 2, 8, 14, 3
    od_len = L - La

    from cpt_tpu.models.bert.captioning import CaptionTensorizer

    tens = CaptionTensorizer(tok, max_img_seq_len=R, max_seq_len=L,
                             max_seq_a_len=La, is_train=False)
    rng = np.random.RandomState(12)
    rows = []
    for b in range(B):
        feats = rng.randn(R, cfg.img_feature_dim).astype(np.float32)
        rows.append(tens.tensorize("", feats, text_b="red dog park"))
    ids = np.stack([r[0] for r in rows])
    segs = np.stack([r[1] for r in rows])
    attn = np.stack([r[2] for r in rows])
    feats = np.stack([r[3] for r in rows])

    common = dict(
        token_type_ids=torch.tensor(segs, dtype=torch.long),
        input_ids=torch.tensor(ids, dtype=torch.long),
        max_length=La, do_sample=False, temperature=1.0, top_k=0,
        top_p=1.0, repetition_penalty=1.0, bos_token_id=BOS,
        pad_token_id=PAD, eos_token_ids=[EOS], mask_token_id=MASK,
        length_penalty=1.0, num_return_sequences=1, is_decode=True,
        add_od_labels=True, od_labels_start_posid=La)
    with torch.no_grad():
        g_ids, g_lp = ref.generate(
            torch.tensor(feats), torch.tensor(attn, dtype=torch.long),
            torch.tensor(np.ones((B, L), np.int64)),
            num_beams=1, num_keep_best=1, **common)
        b_ids, b_lp = ref.generate(
            torch.tensor(feats), torch.tensor(attn, dtype=torch.long),
            torch.tensor(np.ones((B, L), np.int64)),
            num_beams=3, num_keep_best=1, **common)

    gen_cfg = GenerationConfig(max_seq_a_len=La, bos_token_id=BOS,
                               eos_token_id=EOS, pad_token_id=PAD,
                               mask_token_id=MASK)
    ours = BertForImageCaptioning(cfg)
    toks_g, _ = greedy_or_sample(
        ours, {"params": params}, gen_cfg, jnp.asarray(segs),
        jnp.asarray(attn), jnp.asarray(feats),
        base_ids=jnp.asarray(ids))
    ref_g = _np(g_ids[:, 0])
    our_g = np.asarray(toks_g)
    for b in range(B):
        for i, t in enumerate(ref_g[b].tolist()):
            if t == EOS and i == La - 1 and our_g[b, i] != EOS:
                break               # forced final EOS
            assert our_g[b, i] == t, (b, i, ref_g[b], our_g[b])
            if t == EOS:
                break

    import dataclasses
    beam_cfg = dataclasses.replace(gen_cfg, num_beams=3)
    toks_b, sc_b = beam_search(
        ours, {"params": params}, beam_cfg, jnp.asarray(segs),
        jnp.asarray(attn), jnp.asarray(feats),
        base_ids=jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(toks_b)[:, 0],
                                  _np(b_ids[:, 0]))
    np.testing.assert_allclose(np.asarray(sc_b)[:, 0], _np(b_lp[:, 0]),
                               rtol=1e-4, atol=1e-5)


def test_caption_greedy_repetition_penalty_parity():
    """Greedy decode with repetition penalty 1.3: the reference's
    per-token set() loop vs our vectorized penalty (which also touches
    the PAD logit from canvas padding — must not change the decode)."""
    cfg = _cfg()
    ref, params = _build(cfg, seed=7)
    B, La, R = 3, 10, 3
    rng = np.random.RandomState(20)
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    full_mask = np.stack([caption_attention_mask(La, 0, R, La, 0, R)
                          for _ in range(B)])
    tt = np.zeros((B, La), np.int64)

    with torch.no_grad():
        out_ids, _ = ref.generate(
            torch.tensor(feats),
            torch.tensor(full_mask, dtype=torch.long),
            torch.tensor(np.ones((B, La), np.int64)),
            token_type_ids=torch.tensor(tt),
            input_ids=torch.zeros((B, La), dtype=torch.long),
            max_length=La, do_sample=False, num_beams=1,
            temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=1.3,
            bos_token_id=BOS, pad_token_id=PAD, eos_token_ids=[EOS],
            mask_token_id=MASK, length_penalty=1.0,
            num_return_sequences=1, num_keep_best=1, is_decode=True,
            od_labels_start_posid=La)

    import dataclasses
    gen_cfg = dataclasses.replace(
        GenerationConfig(max_seq_a_len=La, bos_token_id=BOS,
                         eos_token_id=EOS, pad_token_id=PAD,
                         mask_token_id=MASK), repetition_penalty=1.3)
    ours = BertForImageCaptioning(cfg)
    tokens, _ = greedy_or_sample(
        ours, {"params": params}, gen_cfg, jnp.asarray(tt.astype(np.int32)),
        jnp.asarray(full_mask), jnp.asarray(feats))
    ref_rows = _np(out_ids[:, 0])
    our_rows = np.asarray(tokens)
    for b in range(B):
        for i, t in enumerate(ref_rows[b].tolist()):
            if t == EOS and i == La - 1 and our_rows[b, i] != EOS:
                break
            assert our_rows[b, i] == t, (b, i, ref_rows[b], our_rows[b])
            if t == EOS:
                break


@pytest.mark.parametrize("top_k,top_p", [(5, 1.0), (0, 0.8), (4, 0.7)])
def test_top_k_top_p_filter_parity(top_k, top_p):
    """Sampling filter vs the reference's own top_k_top_p_filtering
    (modeling_utils.py): identical kept/masked token sets."""
    from oscar.modeling.modeling_utils import top_k_top_p_filtering

    from cpt_tpu.engine.generation import _filter_top_k_top_p

    rng = np.random.RandomState(21)
    logits = rng.randn(4, 32).astype(np.float32) * 2.0
    ref = top_k_top_p_filtering(torch.tensor(logits).clone(),
                                top_k=top_k, top_p=top_p)
    ours = np.asarray(_filter_top_k_top_p(jnp.asarray(logits),
                                          top_k, top_p))
    ref_masked = np.isinf(_np(ref)) & (_np(ref) < 0)
    our_masked = ours <= -1e8
    np.testing.assert_array_equal(our_masked, ref_masked)
    np.testing.assert_allclose(np.where(our_masked, 0.0, ours),
                               np.where(ref_masked, 0.0, _np(ref)),
                               rtol=1e-6)
