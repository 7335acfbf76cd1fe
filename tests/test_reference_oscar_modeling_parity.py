"""Parity vs the REFERENCE's own Oscar modeling code, executed directly.

``/root/reference/Oscar/oscar/modeling/modeling_bert.py`` (BertImgModel with
the CaptionBert* attention stack, BertImgForPreTraining) and
``modeling_rec.py`` (REC_MLM_CPT) are imported through
``pytorch_transformers_shim`` (the era-exact BERT building blocks their
missing ``transformers.pytorch_transformers`` submodule provided) and run
with random weights; our flax stack must match their outputs after
``convert_bert_state_dict`` on the reference model's real ``state_dict()``.

This executes the reference's actual subclass code — the image-embedding
concat (``modeling_bert.py:244-273``), the -10000 additive mask
(``:211-223``), the KV-history attention (``:30-70``), the contrastive-head
width rule and the classifier variants — rather than an HF proxy.
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
from cpt_tpu.models.bert.heads import (BertImgForPreTraining,
                                       ImageBertForMultipleChoice,
                                       ImageBertForSequenceClassification,
                                       NSPCPT, NSPFT, REC_FT, REC_MLM_CPT)
from cpt_tpu.models.bert.model import BertImgModel
from cpt_tpu.utils import convert as cv

OSCAR_ROOT = "/root/reference/Oscar"

shim.install()
if OSCAR_ROOT not in sys.path:
    sys.path.insert(0, OSCAR_ROOT)

ref_mb = pytest.importorskip("oscar.modeling.modeling_bert")
ref_rec = pytest.importorskip("oscar.modeling.modeling_rec")
ref_vcr = pytest.importorskip("oscar.modeling.modeling_vcr")
ref_gqa = pytest.importorskip("oscar.modeling.modeling_gqa")


def _np(x):
    return x.detach().numpy()


def _ref_config(our_cfg, **extra):
    return shim.BertConfig(
        vocab_size_or_config_json_file=our_cfg.vocab_size,
        hidden_size=our_cfg.hidden_size,
        num_hidden_layers=our_cfg.num_hidden_layers,
        num_attention_heads=our_cfg.num_attention_heads,
        intermediate_size=our_cfg.intermediate_size,
        max_position_embeddings=our_cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=our_cfg.layer_norm_eps,
        img_feature_dim=our_cfg.img_feature_dim,
        img_feature_type=our_cfg.img_feature_type,
        use_img_layernorm=our_cfg.use_img_layernorm,
        img_layer_norm_eps=our_cfg.img_layer_norm_eps,
        num_contrast_classes=our_cfg.num_contrast_classes,
        num_labels=our_cfg.num_labels, loss_type=our_cfg.loss_type,
        classifier=our_cfg.classifier,
        cls_hidden_scale=our_cfg.cls_hidden_scale,
        **extra)


def _inputs(cfg, B=2, T=9, R=4, seed=1):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, cfg.vocab_size, (B, T)).astype(np.int32)
    tt = rng.randint(0, 2, (B, T)).astype(np.int32)
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    mask = np.ones((B, T + R), np.int32)
    mask[0, T + 2:] = 0     # padded image slots
    mask[1, T - 2:T] = 0    # padded text slots
    return ids, tt, feats, mask


@pytest.mark.parametrize("img_ln", [False, True])
def test_bert_img_for_pretraining_parity(img_ln):
    """Reference BertImgForPreTraining forward (MLM + 3-way contrastive
    logits, MLM loss with NSP zeroed) vs our flax wrapper."""
    cfg = tiny_bert_config(num_contrast_classes=3, use_img_layernorm=img_ln)
    torch.manual_seed(0)
    ref = ref_mb.BertImgForPreTraining(_ref_config(cfg))
    ref.eval()

    ids, tt, feats, mask = _inputs(cfg)
    # labels span the full text+img sequence, -1 beyond text (as the
    # pretraining batcher pads them)
    mlm_labels = np.full((ids.shape[0], ids.shape[1] + feats.shape[1]),
                         -1, np.int64)
    mlm_labels[:, 2] = ids[:, 3]

    with torch.no_grad():
        loss_t, mlm_t, nsp_t, _mlm_only = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(feats),
            masked_lm_labels=torch.tensor(mlm_labels),
            next_sentence_label=torch.zeros(ids.shape[0], dtype=torch.long))

    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    model = BertImgForPreTraining(cfg)
    loss_j, mlm_j, nsp_j = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(feats),
        masked_lm_labels=jnp.asarray(mlm_labels.astype(np.int32)))

    assert nsp_t.shape[-1] == 3 and nsp_j.shape[-1] == 3
    np.testing.assert_allclose(np.asarray(mlm_j), _np(mlm_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nsp_j), _np(nsp_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_rec_mlm_cpt_parity():
    """Reference REC_MLM_CPT (built through its own
    copy_from_pretraining_model) vs our REC_MLM_CPT — full-logit path AND
    the gathered mask_pos fast path."""
    cfg = tiny_bert_config()
    torch.manual_seed(1)
    pre = ref_mb.BertImgForPreTraining(_ref_config(cfg))
    rec = ref_rec.REC_MLM_CPT(_ref_config(cfg))
    rec.copy_from_pretraining_model(pre)
    rec.eval()

    ids, tt, feats, mask = _inputs(cfg, seed=2)
    with torch.no_grad():
        (scores_t,) = rec(torch.tensor(ids, dtype=torch.long),
                          token_type_ids=torch.tensor(tt, dtype=torch.long),
                          attention_mask=torch.tensor(mask, dtype=torch.long),
                          img_feats=torch.tensor(feats))[:1]

    sd = {k: _np(v) for k, v in pre.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    ours = REC_MLM_CPT(cfg)
    rec_params = {"bert": params["bert"], "mlm_head": params["mlm_head"]}
    _, logits = ours.apply({"params": rec_params}, jnp.asarray(ids),
                           jnp.asarray(tt), jnp.asarray(mask),
                           img_feats=jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(logits),
                               _np(scores_t)[:, :logits.shape[1]],
                               atol=2e-5, rtol=1e-4)

    mask_pos = np.array([2, 4], np.int32)
    _, fast = ours.apply({"params": rec_params}, jnp.asarray(ids),
                         jnp.asarray(tt), jnp.asarray(mask),
                         img_feats=jnp.asarray(feats),
                         mask_pos=jnp.asarray(mask_pos))
    for b, pos in enumerate(mask_pos):
        np.testing.assert_allclose(np.asarray(fast)[b], _np(scores_t)[b, pos],
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("classifier", ["linear", "mlp"])
def test_sequence_classification_parity(classifier):
    """Reference ImageBertForSequenceClassification (both classifier
    variants) vs ours: logits and CE loss."""
    cfg = tiny_bert_config(num_labels=5, classifier=classifier,
                           loss_type="xe")
    torch.manual_seed(2)
    ref = ref_mb.ImageBertForSequenceClassification(_ref_config(cfg))
    ref.eval()

    ids, tt, feats, mask = _inputs(cfg, seed=3)
    labels = np.array([1, 4], np.int64)
    with torch.no_grad():
        loss_t, logits_t = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(feats),
            labels=torch.tensor(labels))[:2]

    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    if classifier == "mlp":
        params["cls_hidden"] = {"kernel": cv._t(sd["classifier.0.weight"]),
                                "bias": sd["classifier.0.bias"]}
        params["cls_out"] = {"kernel": cv._t(sd["classifier.2.weight"]),
                             "bias": sd["classifier.2.bias"]}
    else:
        params["cls_out"] = {"kernel": cv._t(sd["classifier.weight"]),
                             "bias": sd["classifier.bias"]}
    ours = ImageBertForSequenceClassification(cfg)
    loss_j, logits_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(feats),
        labels=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(logits_j), _np(logits_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_vcr_nspcpt_and_nspft_parity():
    """Reference VCR NSPCPT (pretrained NSP head via its own
    copy_from_pretraining_model) and NSPFT (fresh 2-way classifier) vs
    our NSPCPT/NSPFT: scores and CE losses."""
    cfg = tiny_bert_config(num_contrast_classes=2)
    torch.manual_seed(4)
    pre = ref_mb.BertImgForPreTraining(_ref_config(cfg))
    nspcpt = ref_vcr.NSPCPT(_ref_config(cfg))
    nspcpt.copy_from_pretraining_model(pre)
    nspcpt.eval()
    nspft = ref_vcr.NSPFT(_ref_config(cfg))
    nspft.eval()

    ids, tt, feats, mask = _inputs(cfg, seed=5)
    labels = np.array([0, 1], np.int64)
    kw = dict(token_type_ids=torch.tensor(tt, dtype=torch.long),
              attention_mask=torch.tensor(mask, dtype=torch.long),
              img_feats=torch.tensor(feats),
              next_sentence_label=torch.tensor(labels))
    with torch.no_grad():
        loss_cpt_t, score_cpt_t = nspcpt(
            torch.tensor(ids, dtype=torch.long), **kw)[:2]
        loss_ft_t, score_ft_t = nspft(
            torch.tensor(ids, dtype=torch.long), **kw)[:2]

    params = cv.convert_bert_state_dict(
        {k: _np(v) for k, v in pre.state_dict().items()}, cfg)
    ours_cpt = NSPCPT(cfg)
    loss_cpt_j, score_cpt_j = ours_cpt.apply(
        {"params": {"bert": params["bert"], "nsp_head": params["nsp_head"]}},
        jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(mask),
        img_feats=jnp.asarray(feats),
        next_sentence_label=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(score_cpt_j), _np(score_cpt_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_cpt_j), float(loss_cpt_t),
                               rtol=1e-5)

    ft_sd = {k: _np(v) for k, v in nspft.state_dict().items()}
    ft_params = cv.convert_bert_state_dict(ft_sd, cfg)
    ft_params["classifier"] = {"dense": {
        "kernel": cv._t(ft_sd["classifier.0.weight"]),
        "bias": ft_sd["classifier.0.bias"]}}
    ours_ft = NSPFT(cfg)
    loss_ft_j, score_ft_j = ours_ft.apply(
        {"params": {"bert": ft_params["bert"],
                    "classifier": ft_params["classifier"]}},
        jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(mask),
        img_feats=jnp.asarray(feats),
        next_sentence_label=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(score_ft_j), _np(score_ft_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_ft_j), float(loss_ft_t), rtol=1e-5)


def test_gqa_ft_parity():
    """Reference modeling_gqa.FT (pooled linear over n_class answers) vs
    our gqa --model_variant ft head (ImageBertForSequenceClassification
    linear/xe)."""
    n_class = 7
    cfg = tiny_bert_config(num_labels=n_class, classifier="linear",
                           loss_type="xe")
    torch.manual_seed(5)
    ref = ref_gqa.FT(_ref_config(cfg), n_class)
    ref.eval()

    ids, tt, feats, mask = _inputs(cfg, seed=6)
    labels = np.array([2, 5], np.int64)
    with torch.no_grad():
        loss_t, logits_t = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(feats),
            next_sentence_label=torch.tensor(labels))[:2]

    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    params["cls_out"] = {"kernel": cv._t(sd["classifier.0.weight"]),
                         "bias": sd["classifier.0.bias"]}
    ours = ImageBertForSequenceClassification(cfg)
    loss_j, logits_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(feats),
        labels=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(logits_j), _np(logits_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_rec_ft_parity():
    """Reference REC_FT (per-box MLP scorer over image hiddens at text
    offset 70, CE over candidates) vs our REC_FT."""
    cfg = tiny_bert_config(max_position_embeddings=96, loss_type="cls")
    torch.manual_seed(6)
    ref = ref_rec.REC_FT(_ref_config(cfg))
    ref.train()  # reference computes loss only in training mode (dropout=0)

    B, T, R = 2, 70, 4
    rng = np.random.RandomState(7)
    ids = rng.randint(0, cfg.vocab_size, (B, T)).astype(np.int32)
    tt = np.zeros((B, T), np.int32)
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    mask = np.ones((B, T + R), np.int32)
    target = np.array([1, 3], np.int64)
    labels_t = [torch.eye(R)[t] for t in target]

    with torch.no_grad():
        loss_t, logits_t, pred_t = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(feats), labels=labels_t)

    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    params.update({
        "cls_dense": {"kernel": cv._t(sd["classifier.0.weight"]),
                      "bias": sd["classifier.0.bias"]},
        "cls_LayerNorm": {"scale": sd["classifier.2.weight"],
                          "bias": sd["classifier.2.bias"]},
        "cls_out": {"kernel": cv._t(sd["classifier.3.weight"]),
                    "bias": sd["classifier.3.bias"]},
    })
    ours = REC_FT(cfg, txt_seq_len=T)
    loss_j, scores_j, pred_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(feats),
        box_mask=jnp.ones((B, R), bool),
        target_idx=jnp.asarray(target.astype(np.int32)))
    ref_scores = np.stack([_np(s) for s in logits_t])
    np.testing.assert_allclose(np.asarray(scores_j), ref_scores,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    assert [int(p) for p in pred_j] == [int(p) for p in pred_t]


@pytest.mark.parametrize("classifier,img_ln", [("linear", False),
                                               ("mlp", False),
                                               ("mlp", True)])
def test_multiple_choice_parity(classifier, img_ln):
    """Reference ImageBertForMultipleChoice (classifier over the
    CONCATENATED per-choice pooled outputs) vs ours, all classifier
    variants incl. the use_img_layernorm mlp."""
    NC = 2
    cfg = tiny_bert_config(num_labels=2, classifier=classifier,
                           loss_type="xe", use_img_layernorm=img_ln)
    torch.manual_seed(7)
    ref = ref_mb.ImageBertForMultipleChoice(
        _ref_config(cfg, num_choice=NC))
    ref.eval()

    B, T, R = 2, 7, 3
    rng = np.random.RandomState(8)
    ids = rng.randint(0, cfg.vocab_size, (B, NC, T)).astype(np.int32)
    tt = np.zeros((B, NC, T), np.int32)
    feats = rng.randn(B, NC, R, cfg.img_feature_dim).astype(np.float32)
    mask = np.ones((B, NC, T + R), np.int32)
    mask[0, 1, T + 1:] = 0
    labels = np.array([0, 1], np.int64)

    with torch.no_grad():
        loss_t, logits_t = ref(
            torch.tensor(ids.reshape(B, NC, T), dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(feats),
            labels=torch.tensor(labels))[:2]

    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    if classifier == "mlp":
        params["cls_hidden"] = {"kernel": cv._t(sd["classifier.0.weight"]),
                                "bias": sd["classifier.0.bias"]}
        if img_ln:
            params["cls_LayerNorm"] = {"scale": sd["classifier.2.weight"],
                                       "bias": sd["classifier.2.bias"]}
            out_key = "classifier.3"
        else:
            out_key = "classifier.2"
    else:
        out_key = "classifier"
    params["cls_out"] = {"kernel": cv._t(sd[out_key + ".weight"]),
                         "bias": sd[out_key + ".bias"]}
    ours = ImageBertForMultipleChoice(cfg, num_choices=NC)
    loss_j, logits_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(feats),
        labels=jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(logits_j), _np(logits_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_history_state_parity():
    """KV-history attention (incremental caption decoding): reference
    ``encoder_history_states`` vs our ``history_states`` — one new query
    token attending over per-layer history."""
    cfg = tiny_bert_config()
    torch.manual_seed(3)
    ref = ref_mb.BertImgModel(_ref_config(cfg))
    ref.eval()

    B, H, Q = 2, 6, 1
    rng = np.random.RandomState(4)
    ids = rng.randint(0, cfg.vocab_size, (B, Q)).astype(np.int32)
    tt = np.zeros((B, Q), np.int32)
    hist = [rng.randn(B, H, cfg.hidden_size).astype(np.float32)
            for _ in range(cfg.num_hidden_layers)]
    # 3-D mask: each query position sees history + itself
    mask3 = np.ones((B, Q, H + Q), np.int32)
    mask3[1, :, 2] = 0  # a masked history slot

    with torch.no_grad():
        seq_t, pooled_t = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask3, dtype=torch.long),
            encoder_history_states=[torch.tensor(h) for h in hist])[:2]

    # position ids must continue from the history length on our side and
    # the reference's: the reference embeds positions starting at 0 for the
    # new token too (arange over the current ids), so ours must as well —
    # both apply arange(Q), keeping the two paths identical.
    sd = {f"bert.{k}": _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    model = BertImgModel(cfg)
    seq_j, pooled_j = model.apply(
        {"params": params["bert"]}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask3),
        history_states=tuple(jnp.asarray(h) for h in hist))
    np.testing.assert_allclose(np.asarray(seq_j), _np(seq_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled_j), _np(pooled_t),
                               atol=2e-5, rtol=1e-4)


def test_vcr_qar_twin_heads_parity():
    """Reference VCRQAR_NSPCPT (both twin heads seeded from the pretrained
    NSP head via its own copy_from_pretraining_model deepcopy) and
    VCR_QAR_NSPFT (fresh per-head classifiers) vs our twin-head models,
    per head."""
    from cpt_tpu.models.bert.heads import VCR_QAR_NSPFT, VCRQAR_NSPCPT

    cfg = tiny_bert_config(num_contrast_classes=2)
    torch.manual_seed(8)
    pre = ref_mb.BertImgForPreTraining(_ref_config(cfg))
    qar = ref_vcr.VCRQAR_NSPCPT(_ref_config(cfg))
    qar.copy_from_pretraining_model(pre)
    qar.eval()
    ft = ref_vcr.VCR_QAR_NSPFT(_ref_config(cfg))
    ft.eval()

    ids, tt, feats, mask = _inputs(cfg, seed=9)
    labels = np.array([1, 0], np.int64)
    params = cv.convert_bert_state_dict(
        {k: _np(v) for k, v in pre.state_dict().items()}, cfg)
    ours_cpt = VCRQAR_NSPCPT(cfg)
    cpt_params = {"bert": params["bert"],
                  "cls_ans": params["nsp_head"],
                  "cls_rat": params["nsp_head"]}

    ft_sd = {k: _np(v) for k, v in ft.state_dict().items()}
    ft_params = cv.convert_bert_state_dict(ft_sd, cfg)
    for side in ("ans", "rat"):
        ft_params[f"classifier_{side}"] = {"dense": {
            "kernel": cv._t(ft_sd[f"classifier_{side}.0.weight"]),
            "bias": ft_sd[f"classifier_{side}.0.bias"]}}
    ours_ft = VCR_QAR_NSPFT(cfg)

    kw = dict(token_type_ids=torch.tensor(tt, dtype=torch.long),
              attention_mask=torch.tensor(mask, dtype=torch.long),
              img_feats=torch.tensor(feats),
              next_sentence_label=torch.tensor(labels))
    for head in ("ans", "rat"):
        with torch.no_grad():
            loss_t, score_t = qar(torch.tensor(ids, dtype=torch.long),
                                  head=head, **kw)[:2]
            loss_ft_t, score_ft_t = ft(torch.tensor(ids, dtype=torch.long),
                                       head=head, **kw)[:2]
        loss_j, score_j = ours_cpt.apply(
            {"params": cpt_params}, jnp.asarray(ids), jnp.asarray(tt),
            jnp.asarray(mask), img_feats=jnp.asarray(feats),
            next_sentence_label=jnp.asarray(labels.astype(np.int32)),
            head=head)
        np.testing.assert_allclose(np.asarray(score_j), _np(score_t),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
        loss_fj, score_fj = ours_ft.apply(
            {"params": ft_params}, jnp.asarray(ids), jnp.asarray(tt),
            jnp.asarray(mask), img_feats=jnp.asarray(feats),
            next_sentence_label=jnp.asarray(labels.astype(np.int32)),
            head=head)
        np.testing.assert_allclose(np.asarray(score_fj), _np(score_ft_t),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(float(loss_fj), float(loss_ft_t),
                                   rtol=1e-5)


def test_vgft_parity():
    """Reference VGFT (modeling_vg.py:23-73 — subject/object image hiddens
    at text offset 70, Linear(2·hidden → 51) over their concatenation, CE
    over flattened pairs) vs our VGFT, including the padded-slot path."""
    ref_vg = pytest.importorskip("oscar.modeling.modeling_vg")
    from cpt_tpu.models.bert.heads import VGFT

    cfg = tiny_bert_config(max_position_embeddings=96)
    torch.manual_seed(11)
    ref = ref_vg.VGFT(_ref_config(cfg))
    ref.train()  # reference computes loss only in training mode (dropout=0)

    B, T, R, P = 2, 70, 5, 3
    rng = np.random.RandomState(12)
    ids = rng.randint(0, cfg.vocab_size, (B, T)).astype(np.int32)
    tt = np.zeros((B, T), np.int32)
    feats = rng.randn(B, R, cfg.img_feature_dim).astype(np.float32)
    mask = np.ones((B, T + R), np.int32)

    # element 0: three pairs; element 1: two (ours pads the third slot)
    ref_pairs = [[[0, 2], [1, 4], [3, 0]], [[2, 1], [4, 4]]]
    ref_labels = np.array([7, 0, 50, 13, 2], np.int64)
    with torch.no_grad():
        logits_t, loss_t = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(feats), pairs=ref_pairs,
            rel_labels=torch.tensor(ref_labels))

    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    params["classifier"] = {"kernel": cv._t(sd["classifier.weight"]),
                            "bias": sd["classifier.bias"]}
    pairs = np.array([ref_pairs[0], ref_pairs[1] + [[0, 0]]], np.int32)
    labels = np.array([[7, 0, 50], [13, 2, -100]], np.int32)
    ours = VGFT(cfg, txt_seq_len=T)
    loss_j, logits_j = ours.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(feats),
        pairs=jnp.asarray(pairs), rel_labels=jnp.asarray(labels))

    ours_flat = np.concatenate([np.asarray(logits_j)[0],
                                np.asarray(logits_j)[1, :2]])
    np.testing.assert_allclose(ours_flat, _np(logits_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


@pytest.mark.parametrize("variant", ["dis_code", "dis_code_t"])
def test_dis_code_parity(variant):
    """VQ-VAE discrete-code image-feature variants vs the reference
    executed directly (``modeling_bert.py:167-176, 249-259``): code ids →
    padding-idx embedding (→ transpose for ``_t``) → linear projection →
    joint encoder. ``dis_code_t`` feeds [B, code_size] ids and yields a
    code_dim-long image segment."""
    from dataclasses import replace

    cfg = replace(tiny_bert_config(), img_feature_type=variant,
                  code_voc=17, code_dim=8, code_size=5)
    torch.manual_seed(6)
    ref = ref_mb.BertImgModel(_ref_config(cfg, code_voc=17, code_dim=8,
                                          code_size=5))
    ref.eval()

    B, T = 2, 6
    rng = np.random.RandomState(7)
    ids = rng.randint(0, cfg.vocab_size, (B, T)).astype(np.int32)
    tt = rng.randint(0, 2, (B, T)).astype(np.int32)
    n_in = 4 if variant == "dis_code" else cfg.code_size
    n_img = 4 if variant == "dis_code" else cfg.code_dim
    codes = rng.randint(0, cfg.code_voc, (B, n_in)).astype(np.int32)
    mask = np.ones((B, T + n_img), np.int32)
    mask[0, T + n_img - 1] = 0

    with torch.no_grad():
        seq_t, pooled_t = ref(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            img_feats=torch.tensor(codes, dtype=torch.long))[:2]

    sd = {f"bert.{k}": _np(v) for k, v in ref.state_dict().items()}
    params = cv.convert_bert_state_dict(sd, cfg)
    model = BertImgModel(cfg)
    seq_j, pooled_j = model.apply(
        {"params": params["bert"]}, jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(mask), img_feats=jnp.asarray(codes))
    np.testing.assert_allclose(np.asarray(seq_j), _np(seq_t),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled_j), _np(pooled_t),
                               atol=2e-5, rtol=1e-4)
