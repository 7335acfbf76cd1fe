"""Oscar cross-modal BERT (``BertImgModel``) — TPU-native flax implementation.

Capability-parity with the reference's ``BertImgModel``
(``Oscar/oscar/modeling/modeling_bert.py:150-279``): a BERT encoder whose
input sequence is the concatenation of text-token embeddings and linearly
projected image-region features (2054 → hidden), with joint self-attention,
additive ``(1-mask)*-10000`` attention bias, optional image-embedding
LayerNorm, the discrete-code feature variants, and per-layer
``history_state`` KV concatenation used for incremental caption decoding
(``CaptionBertSelfAttention``, reference ``modeling_bert.py:30-70``).

TPU-first design choices (not translations):
  * fused QKV projection — one ``(hidden, 3*hidden)`` matmul per layer keeps
    the MXU busy instead of three skinny matmuls;
  * attention softmax accumulated in float32 regardless of compute dtype;
  * all shapes static: text and image segments are fixed-length and padded,
    masking carried in the attention bias;
  * parameters stay float32, activations run in ``dtype`` (bfloat16 on TPU).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cpt_tpu.config.bert import BertConfig

Array = jax.Array

ATTN_MASK_BIAS = -10000.0  # reference additive-mask constant


def gelu_exact(x: Array) -> Array:
    """erf-based GELU — bit-matches BERT's original activation."""
    return jax.nn.gelu(x, approximate=False)


ACT = {"gelu": gelu_exact, "relu": jax.nn.relu,
       "gelu_new": lambda x: jax.nn.gelu(x, approximate=True)}


def extend_attention_mask(mask: Array, dtype: Any) -> Array:
    """[B, S] or [B, S, S] 0/1 mask → additive bias [B, 1, {1|S}, S]."""
    if mask.ndim == 2:
        ext = mask[:, None, None, :]
    elif mask.ndim == 3:
        ext = mask[:, None, :, :]
    else:
        raise ValueError(f"attention mask must be 2D or 3D, got {mask.ndim}D")
    return (1.0 - ext.astype(dtype)) * ATTN_MASK_BIAS


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, token_type_ids: Array,
                 position_ids: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        c = self.config
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[-1])[None, :]
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                        dtype=self.dtype)(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings", dtype=self.dtype)(position_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings", dtype=self.dtype)(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        return nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)


class _GeneralDense(nn.Module):
    """Parameter container with nn.DenseGeneral's exact tree
    ({kernel, bias}, init drawn at the flattened fan-in/out like
    DenseGeneral) — lets BertLayer route the attention sub-block through
    either the einsum ops or the fused Pallas kernel without changing
    checkpoints."""

    kshape: Tuple[int, ...]
    bshape: Tuple[int, ...]
    fan_in: int
    fan_out: int

    @nn.compact
    def __call__(self):
        def kernel_init(key, shape, dtype):
            flat = nn.initializers.lecun_normal()(
                key, (self.fan_in, self.fan_out), dtype)
            return flat.reshape(shape)

        k = self.param("kernel", kernel_init, self.kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, self.bshape,
                       jnp.float32)
        return k, b


class BertSelfAttention(nn.Module):
    """Joint self-attention with fused QKV and optional KV history.

    ``history_state`` (reference ``CaptionBertSelfAttention:30-70``): when
    provided, keys/values are computed over ``concat([history, hidden])``
    while queries come from ``hidden`` only — the incremental-decoding path.
    """

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        h, nh, hd = c.hidden_size, c.num_attention_heads, c.head_dim
        self.qkv = _GeneralDense((h, 3, nh, hd), (3, nh, hd), h, 3 * nh * hd)
        self.out = _GeneralDense((nh, hd, h), (h,), nh * hd, h)
        self.probs_dropout = nn.Dropout(c.attention_probs_dropout_prob)

    def fused_params(self) -> Tuple[Array, Array, Array, Array]:
        """(wqkv [H, 3H] q|k|v head-major, bqkv [3H], wo [H, H] rows
        head-major, bo [H]) — the layout ops/fused_attention.py expects."""
        c = self.config
        h = c.hidden_size
        kq, bq = self.qkv()
        ko, bo = self.out()
        return kq.reshape(h, 3 * h), bq.reshape(3 * h), ko.reshape(h, h), bo

    def __call__(self, hidden: Array, attn_bias: Array,
                 history_state: Optional[Array] = None,
                 head_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        c = self.config
        h, nh, hd = c.hidden_size, c.num_attention_heads, c.head_dim
        dt = self.dtype
        kv_input = hidden if history_state is None else (
            jnp.concatenate([history_state, hidden], axis=1))

        kq, bq = self.qkv()
        kq, bq = kq.astype(dt), bq.astype(dt)
        if history_state is None:
            proj = jnp.einsum("bsh,hknd->bsknd", hidden, kq) + bq
            q, k, v = proj[..., 0, :, :], proj[..., 1, :, :], proj[..., 2, :, :]
        else:
            pk = jnp.einsum("bsh,hknd->bsknd", kv_input, kq) + bq
            q = (jnp.einsum("bsh,hknd->bsknd", hidden, kq) + bq)[..., 0, :, :]
            k, v = pk[..., 1, :, :], pk[..., 2, :, :]

        use_flash = (c.attention_impl == "flash" and history_state is None
                     and head_mask is None
                     and (deterministic or c.attention_probs_dropout_prob == 0.0))
        if use_flash:
            from cpt_tpu.ops.attention import flash_mha

            # [B, S, H, D] → [B, H, S, D]; bias broadcasts over heads/rows
            ctx = flash_mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                            v.transpose(0, 2, 1, 3), bias=attn_bias,
                            sm_scale=1.0 / float(hd) ** 0.5)
            ctx = ctx.transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(self.dtype)
            scores = scores + attn_bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            probs = self.probs_dropout(probs, deterministic=deterministic)
            if head_mask is not None:
                probs = probs * head_mask
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ko, bo = self.out()
        return jnp.einsum("bqnd,ndh->bqh", ctx, ko.astype(dt)) + bo.astype(dt)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree ({kernel, bias},
    same initializers) — lets the FFN route compute through either the
    flax ops or the fused Pallas kernel without changing checkpoints."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.fin, self.fout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.fout,),
                       jnp.float32)
        return k, b


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


def _fused_ffn_available() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, attn_bias: Array,
                 history_state: Optional[Array] = None,
                 head_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        c = self.config
        attn = BertSelfAttention(c, self.dtype, name="attention")
        gamma_a, beta_a = _LNParams(c.hidden_size,
                                    name="attention_out_LayerNorm")()

        dropout_h = c.hidden_dropout_prob > 0.0 and not deterministic
        dropout_a = (c.attention_probs_dropout_prob > 0.0
                     and not deterministic)
        key_bias_only = attn_bias.ndim == 4 and attn_bias.shape[2] == 1
        use_fused_attn = (
            (c.attention_impl == "fused"
             or (c.attention_impl == "auto" and _fused_ffn_available()))
            and history_state is None and head_mask is None
            and not dropout_h and not dropout_a and key_bias_only
            and c.hidden_size % 128 == 0 and hidden.shape[1] % 128 == 0)
        if use_fused_attn:
            from cpt_tpu.ops.fused_attention import fused_attention_block

            wqkv, bqkv, wo, bo = attn.fused_params()
            key_bias = attn_bias[:, 0, 0, :].astype(jnp.float32)
            # tb=2 is the measured knee on v5e (PERF.md round 3); fall
            # back to 1 for odd batch sizes
            tb = 2 if hidden.shape[0] % 2 == 0 else 1
            hidden = fused_attention_block(
                hidden, wqkv, bqkv, wo, bo, gamma_a, beta_a, key_bias,
                c.num_attention_heads, c.layer_norm_eps, tb)
        else:
            attn_out = attn(hidden, attn_bias, history_state, head_mask,
                            deterministic)
            attn_out = nn.Dropout(c.hidden_dropout_prob)(
                attn_out, deterministic=deterministic)
            # numerically identical to the former nn.LayerNorm
            y = (hidden + attn_out).astype(jnp.float32)
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y), axis=-1,
                           keepdims=True) - jnp.square(mu)
            y = (y - mu) * jax.lax.rsqrt(var + c.layer_norm_eps)
            hidden = (y * gamma_a + beta_a).astype(self.dtype)

        w1, b1 = _DenseParams(c.hidden_size, c.intermediate_size,
                              name="intermediate")()
        w2, b2 = _DenseParams(c.intermediate_size, c.hidden_size,
                              name="output")()
        gamma, beta = _LNParams(c.hidden_size, name="output_LayerNorm")()

        dropout_active = (c.hidden_dropout_prob > 0.0 and not deterministic)
        use_fused = (c.ffn_impl == "fused"
                     or (c.ffn_impl == "auto" and _fused_ffn_available()
                         and not dropout_active
                         and c.hidden_act in ("gelu", "gelu_new")
                         and c.hidden_size % 128 == 0
                         and c.intermediate_size % 128 == 0))
        if use_fused:
            assert not dropout_active, (
                "ffn_impl='fused' has no dropout; train with 'auto' "
                "(falls back to the dense path when dropout applies)")
            from cpt_tpu.ops.fused_ffn import fused_ffn

            return fused_ffn(hidden, w1, b1, w2, b2, gamma, beta,
                             eps=c.layer_norm_eps,
                             approximate=(c.hidden_act == "gelu_new"))

        # reference path, numerically identical to the former
        # nn.Dense/nn.LayerNorm composition
        dt = self.dtype
        inter = jnp.dot(hidden, w1.astype(dt)) + b1.astype(dt)
        inter = ACT[c.hidden_act](inter)
        out = jnp.dot(inter, w2.astype(dt)) + b2.astype(dt)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        y = (hidden + out).astype(jnp.float32)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mu)
        y = (y - mu) * jax.lax.rsqrt(var + c.layer_norm_eps)
        return (y * gamma + beta).astype(dt)


class BertEncoder(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, attn_bias: Array,
                 history_states: Optional[Tuple[Array, ...]] = None,
                 head_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        for i in range(self.config.num_hidden_layers):
            hs = None if history_states is None else history_states[i]
            hm = None if head_mask is None else head_mask[i]
            hidden = BertLayer(self.config, self.dtype, name=f"layer_{i}")(
                hidden, attn_bias, hs, hm, deterministic)
        return hidden


class BertPooler(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sequence_output: Array) -> Array:
        first = sequence_output[:, 0]
        return jnp.tanh(nn.Dense(self.config.hidden_size, name="dense",
                                 dtype=self.dtype)(first))


class BertImgModel(nn.Module):
    """Text ⊕ image-region joint encoder (reference ``BertImgModel``).

    Setup-style so ``embed`` (the pre-encoder half) is independently
    callable — the pipeline-parallel path (``parallel/pipeline.py``) runs
    ``apply(vars, ..., method="embed")`` and pipelines the encoder itself.
    Attribute names match the former inline names; the param tree is
    unchanged."""

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.embeddings = BertEmbeddings(c, self.dtype)
        if c.img_feature_type.startswith("dis_code"):
            self.code_embeddings = nn.Embed(c.code_voc, c.code_dim,
                                            dtype=self.dtype)
        self.img_embedding = nn.Dense(c.hidden_size, dtype=self.dtype)
        if c.use_img_layernorm:
            self.img_LayerNorm = nn.LayerNorm(epsilon=c.img_layer_norm_eps,
                                              dtype=self.dtype)
        self.img_dropout = nn.Dropout(c.hidden_dropout_prob)
        self.encoder = BertEncoder(c, self.dtype)
        self.pooler = BertPooler(c, self.dtype)

    def embed(self,
              input_ids: Array,
              token_type_ids: Optional[Array] = None,
              attention_mask: Optional[Array] = None,
              position_ids: Optional[Array] = None,
              img_feats: Optional[Array] = None,
              deterministic: bool = True) -> Tuple[Array, Array]:
        """→ (embeddings ⊕ projected image features, extended attention
        bias) — everything before the encoder stack."""
        c = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if attention_mask is None:
            n_img = 0 if img_feats is None else img_feats.shape[1]
            attention_mask = jnp.ones(
                (input_ids.shape[0], input_ids.shape[1] + n_img),
                input_ids.dtype)
        attn_bias = extend_attention_mask(attention_mask, self.dtype)

        emb = self.embeddings(input_ids, token_type_ids, position_ids,
                              deterministic)

        if img_feats is not None:
            if c.img_feature_type.startswith("dis_code"):
                code = self.code_embeddings(img_feats)
                if c.img_feature_type == "dis_code_t":
                    code = jnp.swapaxes(code, 1, 2)
                img_emb = self.img_embedding(code)
            else:
                img_emb = self.img_embedding(img_feats)
                if c.use_img_layernorm:
                    img_emb = self.img_LayerNorm(img_emb)
                img_emb = self.img_dropout(img_emb,
                                           deterministic=deterministic)
            emb = jnp.concatenate([emb, img_emb], axis=1)

        return emb, attn_bias

    def __call__(self,
                 input_ids: Array,
                 token_type_ids: Optional[Array] = None,
                 attention_mask: Optional[Array] = None,
                 position_ids: Optional[Array] = None,
                 img_feats: Optional[Array] = None,
                 history_states: Optional[Tuple[Array, ...]] = None,
                 head_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        emb, attn_bias = self.embed(input_ids, token_type_ids,
                                    attention_mask, position_ids, img_feats,
                                    deterministic)
        seq = self.encoder(emb, attn_bias, history_states, head_mask,
                           deterministic)
        pooled = self.pooler(seq)
        return seq, pooled
