"""Feature Pyramid Network backbone variant + multi-level RoI pooling.

Parity with the reference backbone zoo's FPN builders
(``modeling/backbone/fpn.py``, ``backbone.py:build_resnet_fpn_backbone``)
and the multi-level ``Pooler``/``LevelMapper`` (``poolers.py:10-43,95-120``):

  * lateral 1×1 convs on C2..C5, top-down **bilinear** upsampling
    (``fpn.py:63-65``: F.interpolate(..., mode='bilinear',
    align_corners=False) in this fork), 3×3 output convs, optional extra
    max-pool level (``LastLevelMaxPool``)
  * level assignment ``⌊4 + log2(√area / 224)⌋`` clamped to the pyramid
    (Eq. 1 of the FPN paper, the reference's LevelMapper with k0=4)

Not used by the VinVL C4 config — capability parity for the R-*-FPN model
family. NHWC, bf16-ready, static shapes.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.config import BackboneConfig
from cpt_tpu.models.detector.resnet import Stem, Stage
from cpt_tpu.ops.roi_align import roi_align

Array = jax.Array


class FPNTopDown(nn.Module):
    """The FPN top-down module alone (``fpn.py:8-77``): lateral 1×1s,
    bilinear upsample-and-add, 3×3 output convs, P6 max-pool. Takes the
    C2..C5 list; separable from the body for parity testing."""

    out_channels: int = 256
    with_p6: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> List[Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"fpn_inner{i+1}",
                    dtype=self.dtype)(f)
            for i, f in enumerate(features)
        ]
        outs: List[Array] = [None] * len(laterals)
        last = laterals[-1]
        outs[-1] = nn.Conv(self.out_channels, (3, 3),
                           padding=((1, 1), (1, 1)),
                           name=f"fpn_layer{len(laterals)}",
                           dtype=self.dtype)(last)
        for i in range(len(laterals) - 2, -1, -1):
            # bilinear, align_corners=False (this fork, fpn.py:63-65)
            up = jax.image.resize(last, laterals[i].shape, method="linear")
            last = laterals[i] + up
            outs[i] = nn.Conv(self.out_channels, (3, 3),
                              padding=((1, 1), (1, 1)),
                              name=f"fpn_layer{i+1}", dtype=self.dtype)(last)
        if self.with_p6:
            # LastLevelMaxPool: P6 = maxpool(P5, 1x1 window stride 2)
            outs = outs + [nn.max_pool(outs[-1], (1, 1), strides=(2, 2))]
        return outs


class ResNetFPN(nn.Module):
    """ResNet body returning C2..C5 + FPN pyramid P2..P6."""

    config: BackboneConfig
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        c = self.config
        x = Stem(c.stem_out_channels, self.dtype, name="stem")(x)
        features = []
        for i, blocks in enumerate(c.stage_blocks):
            factor = 2 ** i
            x = Stage(blocks, c.stage2_bottleneck_channels * factor,
                      c.res2_out_channels * factor, c.num_groups,
                      1 if i == 0 else 2, c.stride_in_1x1, self.dtype,
                      name=f"layer{i + 1}")(x)
            features.append(x)
        return FPNTopDown(self.out_channels, dtype=self.dtype,
                          name="fpn")(features)


def fpn_level_map(boxes: Array, *, k_min: int = 2, k_max: int = 5,
                  canonical_scale: int = 224, canonical_level: int = 4
                  ) -> Array:
    """LevelMapper: level per RoI by box area (``poolers.py:10-43``)."""
    from cpt_tpu.structures.boxes import box_area

    s = jnp.sqrt(box_area(boxes))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32) - k_min


def multilevel_roi_align(pyramid: Sequence[Array], boxes: Array, *,
                         scales: Sequence[float], pooled: int = 7,
                         sampling: int = 2) -> Array:
    """Pool each RoI from its assigned pyramid level (``Pooler.forward``
    multi-level branch): compute per-level pooled maps (static shapes) and
    select per RoI by the level map."""
    levels = fpn_level_map(boxes, k_min=2, k_max=2 + len(scales) - 1)
    per_level = jnp.stack([
        roi_align(feat, boxes, spatial_scale=scale, pooled=pooled,
                  sampling=sampling)
        for feat, scale in zip(pyramid, scales)
    ])                                                    # [L, N, P, P, C]
    onehot = jax.nn.one_hot(levels, len(scales),
                            dtype=per_level.dtype)        # [N, L]
    return jnp.einsum("lnpqc,nl->npqc", per_level, onehot)
