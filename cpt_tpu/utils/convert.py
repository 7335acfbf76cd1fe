"""PyTorch → JAX weight conversion.

One-time converters from the reference checkpoints into this framework's
parameter pytrees:

  * ``convert_bert_state_dict`` — Oscar ``pytorch_model.bin``
    (``BertImgForPreTraining``, checkpoint-2000000) or any HF-style BERT
    state_dict → flax params for the ``cpt_tpu.models.bert`` stack. Handles
    the fused-QKV repacking (three ``(out,in)`` torch matrices → one
    ``(in, 3, heads, head_dim)`` kernel) and functional weight tying (the
    torch ``cls.predictions.decoder.weight`` clone is dropped — our decoder
    reads the embedding table directly).
  * ``load_torch_file`` — torch.load wrapper that works without CUDA.

The detector converter (``vinvl_vg_x152c4.pth``) lives in
``cpt_tpu.models.detector.convert``.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from cpt_tpu.config.bert import BertConfig


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob and isinstance(blob["model"], dict):
        blob = blob["model"]  # DetectronCheckpointer layout
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in blob.items()}


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(np.transpose(w))


def _strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if prefix and any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):] if k.startswith(prefix) else k: v
                for k, v in sd.items()}
    return dict(sd)


def convert_bert_encoder(sd: Mapping[str, np.ndarray], config: BertConfig) -> Dict[str, Any]:
    """Convert ``bert.*`` weights (embeddings/encoder/pooler/img_embedding)."""
    c = config
    nh, hd, h = c.num_attention_heads, c.head_dim, c.hidden_size
    p: Dict[str, Any] = {}

    p["embeddings"] = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "LayerNorm": {"scale": sd["embeddings.LayerNorm.weight"],
                      "bias": sd["embeddings.LayerNorm.bias"]},
    }

    enc: Dict[str, Any] = {}
    for i in range(c.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        qw, kw, vw = (sd[pre + f"attention.self.{n}.weight"] for n in ("query", "key", "value"))
        qb, kb, vb = (sd[pre + f"attention.self.{n}.bias"] for n in ("query", "key", "value"))
        qkv_kernel = np.stack([_t(qw), _t(kw), _t(vw)], axis=1)  # (h, 3, h)
        qkv_kernel = qkv_kernel.reshape(h, 3, nh, hd)
        qkv_bias = np.stack([qb, kb, vb], axis=0).reshape(3, nh, hd)
        out_kernel = _t(sd[pre + "attention.output.dense.weight"]).reshape(nh, hd, h)
        enc[f"layer_{i}"] = {
            "attention": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {"kernel": out_kernel,
                        "bias": sd[pre + "attention.output.dense.bias"]},
            },
            "attention_out_LayerNorm": {
                "scale": sd[pre + "attention.output.LayerNorm.weight"],
                "bias": sd[pre + "attention.output.LayerNorm.bias"]},
            "intermediate": {"kernel": _t(sd[pre + "intermediate.dense.weight"]),
                             "bias": sd[pre + "intermediate.dense.bias"]},
            "output": {"kernel": _t(sd[pre + "output.dense.weight"]),
                       "bias": sd[pre + "output.dense.bias"]},
            "output_LayerNorm": {"scale": sd[pre + "output.LayerNorm.weight"],
                                 "bias": sd[pre + "output.LayerNorm.bias"]},
        }
    p["encoder"] = enc

    if "pooler.dense.weight" in sd:
        p["pooler"] = {"dense": {"kernel": _t(sd["pooler.dense.weight"]),
                                 "bias": sd["pooler.dense.bias"]}}
    if "img_embedding.weight" in sd:
        p["img_embedding"] = {"kernel": _t(sd["img_embedding.weight"]),
                              "bias": sd["img_embedding.bias"]}
    if "LayerNorm.weight" in sd:  # use_img_layernorm variant
        p["img_LayerNorm"] = {"scale": sd["LayerNorm.weight"],
                              "bias": sd["LayerNorm.bias"]}
    if "code_embeddings.weight" in sd:
        p["code_embeddings"] = {"embedding": sd["code_embeddings.weight"]}
    return p


def convert_bert_state_dict(sd: Mapping[str, np.ndarray], config: BertConfig,
                            *, dtype=np.float32) -> Dict[str, Any]:
    """Full ``BertImgForPreTraining`` state_dict → flax params.

    Returns a tree with top-level keys ``bert`` (+ ``mlm_head`` / ``nsp_head``
    when the corresponding ``cls.*`` weights exist). Task models reuse
    subtrees (the "copy_from_pretraining_model" pattern, reference
    ``modeling_rec.py:111-114``).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bert_sd = _strip_prefix({k: v for k, v in sd.items() if k.startswith("bert.")},
                            "bert.")
    if not bert_sd:  # bare BertModel state_dict
        bert_sd = {k: v for k, v in sd.items() if not k.startswith("cls.")}
    if "embeddings.word_embeddings.weight" not in bert_sd:
        # nonstandard nesting (e.g. "module." wrapper): suffix-align onto
        # the canonical Oscar layout (model_serialization.py:35 analogue)
        sd = align_state_dict(sd, random_oscar_state_dict(config))
        bert_sd = _strip_prefix(
            {k: v for k, v in sd.items() if k.startswith("bert.")}, "bert.")
    params: Dict[str, Any] = {"bert": convert_bert_encoder(bert_sd, config)}

    if "cls.predictions.transform.dense.weight" in sd:
        params["mlm_head"] = {
            "transform": {
                "dense": {"kernel": _t(sd["cls.predictions.transform.dense.weight"]),
                          "bias": sd["cls.predictions.transform.dense.bias"]},
                "LayerNorm": {"scale": sd["cls.predictions.transform.LayerNorm.weight"],
                              "bias": sd["cls.predictions.transform.LayerNorm.bias"]},
            },
            # decoder weight is tied to the embedding table (dropped here);
            # the standalone bias is kept
            "bias": sd["cls.predictions.bias"],
        }
        if "cls.predictions.decoder.weight" in sd:
            if not config.tie_weights:
                # untied captioning decoder (modeling_bert.py:616-625): a
                # finetuned checkpoint's decoder has diverged from the
                # embedding table — keep it
                params["mlm_head"]["decoder"] = \
                    sd["cls.predictions.decoder.weight"]
            else:
                import numpy as _np

                emb = sd.get("bert.embeddings.word_embeddings.weight")
                dec = sd["cls.predictions.decoder.weight"]
                if emb is not None and (emb.shape != dec.shape
                                        or not _np.allclose(
                                            _np.asarray(emb),
                                            _np.asarray(dec))):
                    # reference captioning checkpoints train UNTIED by
                    # default (run_captioning.py --tie_weights is opt-in);
                    # silently substituting the embedding table would
                    # degrade decoding
                    print("WARNING: checkpoint has an untied "
                          "cls.predictions.decoder.weight that differs "
                          "from the embedding table, but tie_weights=True "
                          "drops it — pass --no_tie_weights to keep the "
                          "finetuned decoder")
    if "cls.seq_relationship.weight" in sd:
        params["nsp_head"] = {"dense": {
            "kernel": _t(sd["cls.seq_relationship.weight"]),
            "bias": sd["cls.seq_relationship.bias"]}}

    return _cast_tree(params, dtype)


def _cast_tree(tree: Any, dtype) -> Any:
    if isinstance(tree, dict):
        return {k: _cast_tree(v, dtype) for k, v in tree.items()}
    arr = np.asarray(tree)
    return arr.astype(dtype) if np.issubdtype(arr.dtype, np.floating) else arr


def params_for_task(pretrain_params: Dict[str, Any], task: str) -> Dict[str, Any]:
    """Map converted pretraining params onto a task model's expected tree.

    Mirrors each task model's ``copy_from_pretraining_model``:
      * rec_mlm_cpt (REC_MLM_CPT): bert + mlm_head
      * nsp_cpt (NSPCPT): bert + nsp_head
      * vcr_qar_nsp_cpt (VCRQAR_NSPCPT): bert + twin copies of nsp_head
      * ft heads: bert only (fresh classifiers keep their init)
    """
    import copy

    bert = pretrain_params["bert"]
    if task == "rec_mlm_cpt":
        return {"bert": bert, "mlm_head": pretrain_params["mlm_head"]}
    if task == "nsp_cpt":
        return {"bert": bert, "nsp_head": pretrain_params["nsp_head"]}
    if task == "vcr_qar_nsp_cpt":
        return {"bert": bert,
                "cls_ans": copy.deepcopy(pretrain_params["nsp_head"]),
                "cls_rat": copy.deepcopy(pretrain_params["nsp_head"])}
    if task == "bert_only":
        return {"bert": bert}
    raise ValueError(f"unknown task {task!r}")


def merge_pretrained_into_init(init_params: Dict[str, Any],
                               pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay pretrained subtrees onto a freshly-initialized param tree,
    keeping init values for any leaf the checkpoint does not provide (fresh
    task classifiers). Shapes must match where both exist."""
    out = dict(init_params)
    for k, v in pretrained.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_pretrained_into_init(out[k], v)
        else:
            have = out.get(k)
            if have is not None and hasattr(have, "shape"):
                vs = np.asarray(v)
                if tuple(have.shape) != tuple(vs.shape):
                    raise ValueError(
                        f"shape mismatch for {k}: init {tuple(have.shape)} "
                        f"vs checkpoint {tuple(vs.shape)}")
            out[k] = v
    return out


def random_oscar_state_dict(config: BertConfig, seed: int = 0
                            ) -> Dict[str, np.ndarray]:
    """Random state dict in the Oscar ``pytorch_model.bin`` key layout
    (``bert.*`` BertImgModel + ``cls.*`` pretraining heads). Lets the
    checkpoint pipeline dry-run before the real weights are available
    (``tools/validate_checkpoints.py --dryrun``)."""
    rng = np.random.RandomState(seed)
    c = config
    h, im, vs = c.hidden_size, c.intermediate_size, c.vocab_size

    def r(*shape):
        return (rng.randn(*shape) * 0.02).astype(np.float32)

    sd: Dict[str, np.ndarray] = {
        "bert.embeddings.word_embeddings.weight": r(vs, h),
        "bert.embeddings.position_embeddings.weight":
            r(c.max_position_embeddings, h),
        "bert.embeddings.token_type_embeddings.weight":
            r(c.type_vocab_size, h),
        "bert.embeddings.LayerNorm.weight": np.ones(h, np.float32),
        "bert.embeddings.LayerNorm.bias": r(h),
        "bert.pooler.dense.weight": r(h, h),
        "bert.pooler.dense.bias": r(h),
        "bert.img_embedding.weight": r(h, c.img_feature_dim),
        "bert.img_embedding.bias": r(h),
        "cls.predictions.transform.dense.weight": r(h, h),
        "cls.predictions.transform.dense.bias": r(h),
        "cls.predictions.transform.LayerNorm.weight": np.ones(h, np.float32),
        "cls.predictions.transform.LayerNorm.bias": r(h),
        "cls.predictions.bias": r(vs),
        "cls.predictions.decoder.weight": r(vs, h),
        "cls.seq_relationship.weight": r(2, h),
        "cls.seq_relationship.bias": r(2),
    }
    for i in range(c.num_hidden_layers):
        pre = f"bert.encoder.layer.{i}."
        for n in ("query", "key", "value"):
            sd[pre + f"attention.self.{n}.weight"] = r(h, h)
            sd[pre + f"attention.self.{n}.bias"] = r(h)
        sd[pre + "attention.output.dense.weight"] = r(h, h)
        sd[pre + "attention.output.dense.bias"] = r(h)
        sd[pre + "attention.output.LayerNorm.weight"] = np.ones(h, np.float32)
        sd[pre + "attention.output.LayerNorm.bias"] = r(h)
        sd[pre + "intermediate.dense.weight"] = r(im, h)
        sd[pre + "intermediate.dense.bias"] = r(im)
        sd[pre + "output.dense.weight"] = r(h, im)
        sd[pre + "output.dense.bias"] = r(h)
        sd[pre + "output.LayerNorm.weight"] = np.ones(h, np.float32)
        sd[pre + "output.LayerNorm.bias"] = r(h)
    return sd


def align_state_dict(loaded: Mapping[str, np.ndarray],
                     expected: Mapping[str, Any],
                     skip_mismatched: bool = True) -> Dict[str, np.ndarray]:
    """Suffix-match checkpoint keys onto the converter's expected names
    (reference ``model_serialization.py:35-100`` align_and_update_state_dicts).

    For each expected key, pick the loaded key related by suffix — either
    direction, so both "model keys carry extra nesting" (reference's case)
    and "checkpoint keys carry extra prefixes" (``module.``/``model.`` DDP
    wrappers) align — preferring exact matches, then the longest common
    suffix. Shape-mismatched picks are skipped (logged semantics of
    ``skip_unmatched_layers=True``) so fresh task heads keep their init.
    """
    out: Dict[str, np.ndarray] = {}
    loaded_keys = list(loaded.keys())
    for ek, ev in expected.items():
        best, best_len = None, -1
        for lk in loaded_keys:
            if lk == ek:
                best, best_len = lk, 1 << 30
                break
            if lk.endswith("." + ek) or ek.endswith("." + lk):
                score = min(len(lk), len(ek))
                if score > best_len:
                    best, best_len = lk, score
        if best is None:
            continue
        v = np.asarray(loaded[best])
        eshape = getattr(ev, "shape", None)
        if (skip_mismatched and eshape is not None
                and tuple(v.shape) != tuple(eshape)):
            continue
        out[ek] = v
    return out
