"""A faithful ``pytorch_transformers``-era BERT shim so the REFERENCE's own
Oscar modeling code (`/root/reference/Oscar/oscar/modeling/modeling_bert.py`,
``modeling_rec.py``, ...) can be imported and EXECUTED for parity tests.

The reference vendors huggingface's old ``pytorch_transformers`` as a git
submodule (``transformers.pytorch_transformers``) that is absent from the
checkout.  Its BERT building blocks are the standard, well-known BERT-base
blocks — written here from scratch (torch) with the 1.x-era API surface the
Oscar subclasses rely on:

  * ``BertSelfAttention`` exposing ``query/key/value``, ``dropout``,
    ``transpose_for_scores``, ``attention_head_size``, ``all_head_size``,
    ``output_attentions`` (the Caption* subclasses override ``forward``).
  * ``BertLMPredictionHead`` with ``decoder`` (bias-free Linear) plus a
    separate ``bias`` parameter.
  * ``BertPreTrainedModel.init_weights(module)`` as an ``apply``-style
    per-module initializer, and ``PreTrainedModel._tie_or_clone_weights``.

Numerics are the exact-erf gelu + standard LayerNorm the era used, which is
also what HF's modern BertModel computes — so parity demanded against code
built on this shim is parity against the published Oscar/CPT stack.
"""
import math
import sys
import types

import torch
from torch import nn
import torch.nn.functional as F

BERT_PRETRAINED_MODEL_ARCHIVE_MAP = {}
WEIGHTS_NAME = "pytorch_model.bin"
TF_WEIGHTS_NAME = "model.ckpt"


def load_tf_weights_in_bert(*a, **k):  # pragma: no cover - never used
    raise NotImplementedError


def cached_path(path, *a, **k):
    return path


def gelu(x):
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


def swish(x):
    return x * torch.sigmoid(x)


ACT2FN = {"gelu": gelu, "relu": F.relu, "swish": swish}

BertLayerNorm = nn.LayerNorm


class BertConfig(object):
    """Attribute-bag config with BERT-base defaults (pytorch_transformers
    ``BertConfig`` minus the serialization plumbing)."""

    # driver modules enumerate this at import (run_nlvr.py:59)
    pretrained_config_archive_map = {}

    def __init__(self, vocab_size_or_config_json_file=30522, hidden_size=768,
                 num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2,
                 initializer_range=0.02, layer_norm_eps=1e-12,
                 output_attentions=False, output_hidden_states=False,
                 torchscript=False, **kwargs):
        self.vocab_size = vocab_size_or_config_json_file
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.output_attentions = output_attentions
        self.output_hidden_states = output_hidden_states
        self.torchscript = torchscript
        for k, v in kwargs.items():
            setattr(self, k, v)


class BertEmbeddings(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.word_embeddings = nn.Embedding(config.vocab_size,
                                            config.hidden_size, padding_idx=0)
        self.position_embeddings = nn.Embedding(config.max_position_embeddings,
                                                config.hidden_size)
        self.token_type_embeddings = nn.Embedding(config.type_vocab_size,
                                                  config.hidden_size)
        self.LayerNorm = BertLayerNorm(config.hidden_size,
                                       eps=config.layer_norm_eps)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, input_ids, token_type_ids=None, position_ids=None):
        seq_length = input_ids.size(1)
        if position_ids is None:
            position_ids = torch.arange(seq_length, dtype=torch.long,
                                        device=input_ids.device)
            position_ids = position_ids.unsqueeze(0).expand_as(input_ids)
        if token_type_ids is None:
            token_type_ids = torch.zeros_like(input_ids)
        embeddings = (self.word_embeddings(input_ids)
                      + self.position_embeddings(position_ids)
                      + self.token_type_embeddings(token_type_ids))
        return self.dropout(self.LayerNorm(embeddings))


class BertSelfAttention(nn.Module):
    def __init__(self, config):
        super().__init__()
        if config.hidden_size % config.num_attention_heads != 0:
            raise ValueError("hidden_size not a multiple of heads")
        self.output_attentions = config.output_attentions
        self.num_attention_heads = config.num_attention_heads
        self.attention_head_size = (config.hidden_size
                                    // config.num_attention_heads)
        self.all_head_size = (self.num_attention_heads
                              * self.attention_head_size)
        self.query = nn.Linear(config.hidden_size, self.all_head_size)
        self.key = nn.Linear(config.hidden_size, self.all_head_size)
        self.value = nn.Linear(config.hidden_size, self.all_head_size)
        self.dropout = nn.Dropout(config.attention_probs_dropout_prob)

    def transpose_for_scores(self, x):
        new_shape = x.size()[:-1] + (self.num_attention_heads,
                                     self.attention_head_size)
        return x.view(*new_shape).permute(0, 2, 1, 3)

    def forward(self, hidden_states, attention_mask, head_mask=None):
        q = self.transpose_for_scores(self.query(hidden_states))
        k = self.transpose_for_scores(self.key(hidden_states))
        v = self.transpose_for_scores(self.value(hidden_states))
        scores = torch.matmul(q, k.transpose(-1, -2))
        scores = scores / math.sqrt(self.attention_head_size) + attention_mask
        probs = self.dropout(nn.Softmax(dim=-1)(scores))
        if head_mask is not None:
            probs = probs * head_mask
        ctx = torch.matmul(probs, v).permute(0, 2, 1, 3).contiguous()
        ctx = ctx.view(*(ctx.size()[:-2] + (self.all_head_size,)))
        return (ctx, probs) if self.output_attentions else (ctx,)


class BertSelfOutput(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.hidden_size, config.hidden_size)
        self.LayerNorm = BertLayerNorm(config.hidden_size,
                                       eps=config.layer_norm_eps)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, hidden_states, input_tensor):
        return self.LayerNorm(self.dropout(self.dense(hidden_states))
                              + input_tensor)


class BertAttention(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.self = BertSelfAttention(config)
        self.output = BertSelfOutput(config)

    def forward(self, input_tensor, attention_mask, head_mask=None):
        self_outputs = self.self(input_tensor, attention_mask, head_mask)
        attention_output = self.output(self_outputs[0], input_tensor)
        return (attention_output,) + self_outputs[1:]


class BertIntermediate(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.hidden_size, config.intermediate_size)
        self.intermediate_act_fn = (ACT2FN[config.hidden_act]
                                    if isinstance(config.hidden_act, str)
                                    else config.hidden_act)

    def forward(self, hidden_states):
        return self.intermediate_act_fn(self.dense(hidden_states))


class BertOutput(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.intermediate_size, config.hidden_size)
        self.LayerNorm = BertLayerNorm(config.hidden_size,
                                       eps=config.layer_norm_eps)
        self.dropout = nn.Dropout(config.hidden_dropout_prob)

    def forward(self, hidden_states, input_tensor):
        return self.LayerNorm(self.dropout(self.dense(hidden_states))
                              + input_tensor)


class BertLayer(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.attention = BertAttention(config)
        self.intermediate = BertIntermediate(config)
        self.output = BertOutput(config)

    def forward(self, hidden_states, attention_mask, head_mask=None):
        attention_outputs = self.attention(hidden_states, attention_mask,
                                           head_mask)
        attention_output = attention_outputs[0]
        layer_output = self.output(self.intermediate(attention_output),
                                   attention_output)
        return (layer_output,) + attention_outputs[1:]


class BertEncoder(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.output_attentions = config.output_attentions
        self.output_hidden_states = config.output_hidden_states
        self.layer = nn.ModuleList(
            [BertLayer(config) for _ in range(config.num_hidden_layers)])

    def forward(self, hidden_states, attention_mask, head_mask=None):
        all_hidden, all_attn = (), ()
        for i, layer_module in enumerate(self.layer):
            if self.output_hidden_states:
                all_hidden = all_hidden + (hidden_states,)
            layer_outputs = layer_module(
                hidden_states, attention_mask,
                None if head_mask is None else head_mask[i])
            hidden_states = layer_outputs[0]
            if self.output_attentions:
                all_attn = all_attn + (layer_outputs[1],)
        if self.output_hidden_states:
            all_hidden = all_hidden + (hidden_states,)
        outputs = (hidden_states,)
        if self.output_hidden_states:
            outputs = outputs + (all_hidden,)
        if self.output_attentions:
            outputs = outputs + (all_attn,)
        return outputs


class BertPooler(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.hidden_size, config.hidden_size)
        self.activation = nn.Tanh()

    def forward(self, hidden_states):
        return self.activation(self.dense(hidden_states[:, 0]))


class BertPredictionHeadTransform(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.dense = nn.Linear(config.hidden_size, config.hidden_size)
        self.transform_act_fn = (ACT2FN[config.hidden_act]
                                 if isinstance(config.hidden_act, str)
                                 else config.hidden_act)
        self.LayerNorm = BertLayerNorm(config.hidden_size,
                                       eps=config.layer_norm_eps)

    def forward(self, hidden_states):
        return self.LayerNorm(self.transform_act_fn(
            self.dense(hidden_states)))


class BertLMPredictionHead(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.transform = BertPredictionHeadTransform(config)
        self.decoder = nn.Linear(config.hidden_size, config.vocab_size,
                                 bias=False)
        self.bias = nn.Parameter(torch.zeros(config.vocab_size))

    def forward(self, hidden_states):
        return self.decoder(self.transform(hidden_states)) + self.bias


class BertOnlyMLMHead(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.predictions = BertLMPredictionHead(config)

    def forward(self, sequence_output):
        return self.predictions(sequence_output)


class PreTrainedModel(nn.Module):
    config_class = None
    pretrained_model_archive_map = {}
    load_tf_weights = None
    base_model_prefix = ""

    def __init__(self, config, *inputs, **kwargs):
        super().__init__()
        self.config = config

    def _tie_or_clone_weights(self, output_embeddings, input_embeddings):
        if getattr(self.config, "torchscript", False):
            output_embeddings.weight = nn.Parameter(
                input_embeddings.weight.clone())
        else:
            output_embeddings.weight = input_embeddings.weight

    @classmethod
    def from_pretrained(cls, *a, **k):  # pragma: no cover - zero egress
        raise NotImplementedError("shim has no pretrained hub")


class BertPreTrainedModel(PreTrainedModel):
    config_class = BertConfig
    pretrained_model_archive_map = BERT_PRETRAINED_MODEL_ARCHIVE_MAP
    load_tf_weights = None
    base_model_prefix = "bert"

    def init_weights(self, module):
        if isinstance(module, (nn.Linear, nn.Embedding)):
            module.weight.data.normal_(mean=0.0,
                                       std=self.config.initializer_range)
        elif isinstance(module, BertLayerNorm):
            module.bias.data.zero_()
            module.weight.data.fill_(1.0)
        if isinstance(module, nn.Linear) and module.bias is not None:
            module.bias.data.zero_()


class BertTokenizer(object):  # pragma: no cover - drivers only
    @classmethod
    def from_pretrained(cls, *a, **k):
        raise NotImplementedError("shim has no pretrained hub")


def install():
    """Register the fake ``transformers.pytorch_transformers`` modules (and a
    minimal ``anytree`` used by oscar.utils.cbs at import time)."""
    existing = sys.modules.get("transformers.pytorch_transformers")
    if existing is not None and getattr(existing, "_IS_PT_SHIM", False):
        return
    if existing is not None:
        # overwrite a pre-existing permissive auto-stub (e.g. the one
        # test_reference_prompt_parity installs) — parity tests need the
        # real era classes — and evict reference modules already imported
        # against the stub so they re-import against the shim
        for name in [n for n in sys.modules
                     if n == "oscar" or n.startswith("oscar.")]:
            del sys.modules[name]
    this = sys.modules[__name__]

    pkg = types.ModuleType("transformers.pytorch_transformers")
    pkg._IS_PT_SHIM = True
    pkg.BertTokenizer = BertTokenizer
    pkg.BertConfig = BertConfig
    pkg.AdamW = torch.optim.AdamW          # era AdamW ≈ torch.optim.AdamW
    pkg.WEIGHTS_NAME = WEIGHTS_NAME
    pkg.TF_WEIGHTS_NAME = TF_WEIGHTS_NAME
    for _name in ("WarmupLinearSchedule", "WarmupConstantSchedule"):
        setattr(pkg, _name,
                type(_name, (), {"__init__": lambda self, *a, **k: None}))

    def _pkg_getattr(attr):
        # permissive fallback for reference DRIVER modules importing names
        # the parity tests never execute (same behavior as the pre-shim
        # auto-stub in test_reference_prompt_parity)
        if attr.startswith("__"):
            raise AttributeError(attr)
        return type(attr, (torch.nn.Module,),
                    {"__init__":
                     lambda self, *a, **k: torch.nn.Module.__init__(self)})

    pkg.__getattr__ = _pkg_getattr

    mb = types.ModuleType("transformers.pytorch_transformers.modeling_bert")
    for name in ("BertEmbeddings", "BertSelfAttention", "BertAttention",
                 "BertEncoder", "BertLayer", "BertSelfOutput",
                 "BertIntermediate", "BertOutput", "BertPooler",
                 "BertLayerNorm", "BertPreTrainedModel",
                 "BertPredictionHeadTransform", "BertOnlyMLMHead",
                 "BertLMPredictionHead", "BertConfig",
                 "BERT_PRETRAINED_MODEL_ARCHIVE_MAP",
                 "load_tf_weights_in_bert", "ACT2FN", "gelu"):
        setattr(mb, name, getattr(this, name))

    mu = types.ModuleType("transformers.pytorch_transformers.modeling_utils")
    mu.PreTrainedModel = PreTrainedModel
    mu.WEIGHTS_NAME = WEIGHTS_NAME
    mu.TF_WEIGHTS_NAME = TF_WEIGHTS_NAME

    fu = types.ModuleType("transformers.pytorch_transformers.file_utils")
    fu.cached_path = cached_path

    import transformers as real_transformers

    real_transformers.pytorch_transformers = pkg
    pkg.modeling_bert = mb
    pkg.modeling_utils = mu
    pkg.file_utils = fu
    sys.modules["transformers.pytorch_transformers"] = pkg
    sys.modules["transformers.pytorch_transformers.modeling_bert"] = mb
    sys.modules["transformers.pytorch_transformers.modeling_utils"] = mu
    sys.modules["transformers.pytorch_transformers.file_utils"] = fu

    if "anytree" not in sys.modules:
        anytree = types.ModuleType("anytree")
        anytree.AnyNode = type("AnyNode", (), {})
        anytree.search = types.SimpleNamespace(findall=lambda *a, **k: ())
        sys.modules["anytree"] = anytree
