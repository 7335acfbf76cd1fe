"""Jitted scoring functions + host-side task scoring rules.

Device side: one jitted forward per task model returning the quantities the
scoring rules need (MLM logits gathered at the [MASK] position, NSP
probabilities). Host side: the exact reference decision rules —

  * RefCOCO (reference ``Oscar/oscar/fewshot/refcoco_cpt.py:258-315``):
    per copy, score_c = logits[mask, color_c] / logits[mask, "none"];
    concatenate scores over all copies of a query, argmax → predicted box;
    accuracy = IoU(pred, gt) > 0.5.
  * GQA (``gqa_cpt.py:590-614``): argmax over answer-vocab first-token
    logits at the mask.
  * VCR (``vcr_nsp_cpt.py``): candidate score = 1 − softmax(NSP)[1],
    argmax over the 4 choices.
  * VG (``vg_cpt.py:255-306``): mean log-prob over k mask slots per
    predicate template, both pair directions.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.data.refcoco import FlatBatch, RefcocoCPTData, RefcocoExample, iter_eval_batches
from cpt_tpu.structures.boxes import xywh_iou
from cpt_tpu.utils.tokenization import BertTokenizer


def make_mlm_at_mask_fn(model, mesh=None) -> Callable:
    """Returns jitted fn(params, batch arrays) → float32 [N, vocab] logits
    gathered at each sequence's mask position.

    With ``mesh`` (a Mesh with a "dp" axis), the batch is sharded over dp
    and params replicated — XLA runs the forward SPMD (the reference's
    DistributedSampler + all_gather eval, without the gather)."""

    def raw(params, input_ids, segment_ids, attention_mask, img_feats,
            mask_pos):
        # fast path: vocab projection only at the gathered [MASK] positions
        _, at_mask = model.apply(params, input_ids, segment_ids,
                                 attention_mask, img_feats=img_feats,
                                 mask_pos=mask_pos)
        return at_mask.astype(jnp.float32)

    if mesh is None:
        return jax.jit(raw)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_s = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    jfn = jax.jit(raw, in_shardings=(rep,) + (batch_s,) * 5,
                  out_shardings=batch_s)

    def fn(params, *batch):
        return jfn(params, *batch)

    return fn


def run_mlm_batch(fn, params, batch: FlatBatch) -> np.ndarray:
    t = batch.tensors
    return np.asarray(fn(params, t.input_ids, t.segment_ids,
                         t.attention_mask, t.img_feats, t.mask_pos))


def refcoco_collect_scores(at_mask: np.ndarray, batch: FlatBatch,
                           tokenizer: BertTokenizer
                           ) -> Dict[int, Tuple[List[float], List[List[float]]]]:
    """Group the reference's color/none ratio scores per example index.

    Returns {example idx in batch: (scores, rects)} with scores parallel to
    the flattened candidate rect list."""
    none_id = tokenizer.convert_tokens_to_ids("none")
    grouped: Dict[int, Tuple[List[float], List[List[float]]]] = {}
    for slot, (ex_i, _copy_i) in enumerate(batch.slot_meta):
        color_ids = tokenizer.convert_tokens_to_ids(batch.slot_colors[slot])
        ratios = at_mask[slot, color_ids] / at_mask[slot, none_id]
        scores, rects = grouped.setdefault(ex_i, ([], []))
        scores.extend(float(r) for r in ratios)
        rects.extend(batch.slot_rects[slot])
    return grouped


def refcoco_evaluate(model, params, data: RefcocoCPTData,
                     tokenizer: BertTokenizer, batch_size: int = 128,
                     indices: Optional[List[int]] = None, mesh=None,
                     host_sharded: bool = False,
                     ) -> Tuple[float, Dict[str, List[float]]]:
    """Zero/few-shot RefCOCO grounding eval; returns (accuracy·100, preds).
    With ``mesh``, batches shard over the dp axis (batch_size must divide).
    With ``host_sharded`` on a multi-host pod, each process evaluates its
    ``host_shard`` of the queries and the accuracy counts are all-reduced
    (reference DDP eval, ``refcoco_cpt.py:516-522`` + DistributedSampler);
    the returned predictions hold only this host's shard."""
    if host_sharded and indices is None:
        from cpt_tpu.parallel.distributed import host_shard

        indices = host_shard(range(len(data)))
    fn = make_mlm_at_mask_fn(model, mesh=mesh)
    predictions: Dict[str, List[float]] = {}
    n_correct, n_total = 0, 0
    for batch, examples in iter_eval_batches(data, batch_size, indices):
        at_mask = run_mlm_batch(fn, params, batch)
        grouped = refcoco_collect_scores(at_mask, batch, tokenizer)
        for ex_i, (scores, rects) in grouped.items():
            ex = examples[ex_i]
            best = int(np.argmax(scores))
            pred = rects[best]
            predictions[ex.img_key] = pred
            if ex.gt_bbox is not None:
                pred_xywh = [pred[0], pred[1], pred[2] - pred[0] + 1,
                             pred[3] - pred[1] + 1]
                n_correct += xywh_iou(pred_xywh, ex.gt_bbox) > 0.5
                n_total += 1
    if host_sharded:
        from cpt_tpu.parallel.distributed import allreduce_sum

        n_correct, n_total = allreduce_sum(float(n_correct), float(n_total))
    acc = 100.0 * n_correct / max(n_total, 1)
    return acc, predictions


def make_nsp_score_fn(model, head: Optional[str] = None) -> Callable:
    """VCR candidate scorer: returns jitted fn → [N] score = 1 − P(class 1)."""
    kwargs = {} if head is None else {"head": head}

    @jax.jit
    def fn(params, input_ids, segment_ids, attention_mask, img_feats):
        _, logits = model.apply(params, input_ids, segment_ids,
                                attention_mask, img_feats=img_feats, **kwargs)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return 1.0 - probs[:, 1]

    return fn


def gqa_answer_scores(at_mask: np.ndarray, answer_token_ids: np.ndarray
                      ) -> np.ndarray:
    """[N, vocab] mask logits → [N, num_answers] scores over the answer
    vocabulary's first tokens (reference ``gqa_cpt.py:590-614``)."""
    return at_mask[:, answer_token_ids]


def multi_mask_logprob(logits: np.ndarray, mask_positions: List[int],
                       token_ids: List[int]) -> float:
    """Mean log-prob of ``token_ids`` at ``mask_positions`` (VG rule,
    reference ``vg_cpt.py:255-306``): score for a k-token predicate."""
    assert len(mask_positions) == len(token_ids)
    logp = logits - _logsumexp(logits, axis=-1, keepdims=True)
    vals = [logp[p, t] for p, t in zip(mask_positions, token_ids)]
    return float(np.mean(vals))


def _logsumexp(x, axis=None, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)
