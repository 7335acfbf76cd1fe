"""Sigmoid focal loss (RetinaNet path).

Parity with reference ``csrc/cuda/SigmoidFocalLoss_cuda.cu`` /
``layers/sigmoid_focal_loss.py``: per-anchor, per-class focal term with the
class-indexed positive convention (classes are 1-indexed; targets == 0 means
background). Pure XLA — the elementwise math fuses; the CUDA kernel's only
job was avoiding materializing the [N, C] intermediate, which XLA does for
free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sigmoid_focal_loss(logits: Array, targets: Array, *, gamma: float = 2.0,
                       alpha: float = 0.25) -> Array:
    """logits [N, C] (classes 1..C mapped to columns 0..C-1);
    targets [N] int (0 = background, c>=1 = positive for column c-1).

    Returns the per-element loss [N, C] (caller reduces), matching the CUDA
    kernel's elementwise output.
    """
    n, c = logits.shape
    class_ids = jnp.arange(1, c + 1)[None, :]                # [1, C]
    t = targets[:, None]
    pos = (t == class_ids).astype(jnp.float32)
    neg = ((t != class_ids) & (t >= 0)).astype(jnp.float32)

    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    term_pos = -pos * alpha * ((1 - p) ** gamma) * jnp.log(
        jnp.maximum(p, 1e-12))
    term_neg = -neg * (1 - alpha) * (p ** gamma) * jnp.log(
        jnp.maximum(1 - p, 1e-12))
    return term_pos + term_neg
