"""FBNet mobile backbone zoo — TPU-native.

Parity with the reference's FBNet builder
(``modeling/backbone/fbnet.py``, ``fbnet_builder.py``,
``fbnet_modeldef.py``): inverted-residual (IRF) blocks with expansion t,
depthwise k×k, optional squeeze-excite and mid channel-shuffle, assembled
from an arch definition {block_op_type, block_cfg:{first, stages:[t,c,n,s]}}.
The 30-lambda ``PRIMITIVES`` table (``fbnet_builder.py:37-180``) collapses
to one op-name parser: ``ir_k{K}[_e{E}|_s4][_se]`` or ``skip``.

TPU notes: NHWC; depthwise convs via ``feature_group_count``; BatchNorm is
inference-style scale/bias (the detection configs freeze BN); residual adds
fuse into the conv epilogue under XLA. Unused by CPT — backbone-zoo parity.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# the reference's "default" arch (fbnet_modeldef.py:12-45), trunk stages
# 0-3 (head stages are built separately there)
DEFAULT_ARCH: Dict[str, Any] = {
    "block_op_type": [["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3,
                      ["ir_k3"] * 7],
    "block_cfg": {
        "first": [32, 2],
        "stages": [
            [[1, 16, 1, 1]],
            [[6, 24, 2, 2]],
            [[6, 32, 3, 2]],
            [[6, 64, 4, 2], [6, 96, 3, 1]],
        ],
    },
}

_OP_RE = re.compile(r"^ir_k(\d+)(?:_e(\d+)|_s(4))?(_se)?$")


def parse_op(op: str, default_expansion: int) -> Dict[str, Any]:
    """'ir_k5_e3_se' → {kernel, expansion, shuffle, se} (PRIMITIVES)."""
    if op == "skip":
        return {"skip": True}
    m = _OP_RE.match(op)
    if not m:
        raise ValueError(f"unknown FBNet op {op!r}")
    k, e, s4, se = m.groups()
    return {"skip": False, "kernel": int(k),
            "expansion": int(e) if e else (4 if s4 else default_expansion),
            "shuffle": bool(s4), "se": bool(se)}


def _bn(x: Array, name: str, mdl: nn.Module) -> Array:
    scale = mdl.param(f"{name}_scale", nn.initializers.ones,
                      (x.shape[-1],))
    bias = mdl.param(f"{name}_bias", nn.initializers.zeros,
                     (x.shape[-1],))
    return x * scale + bias


class IRFBlock(nn.Module):
    """Inverted residual (``fbnet_builder.py:445-560``): 1×1 expand →
    depthwise k×k (stride) [→ SE] → 1×1 project; residual when
    stride 1 and C_in == C_out."""

    out_channels: int
    expansion: int = 6
    kernel: int = 3
    stride: int = 1
    se: bool = False
    shuffle: bool = False
    pw_group: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        mid = cin * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, name="pw",
                        feature_group_count=(self.pw_group
                                             if self.shuffle else 1),
                        dtype=self.dtype)(y)
            y = nn.relu(_bn(y, "pw_bn", self))
        if self.shuffle:                       # mid channel shuffle
            b, h, w, c = y.shape
            y = y.reshape(b, h, w, self.pw_group, c // self.pw_group)
            y = y.transpose(0, 1, 2, 4, 3).reshape(b, h, w, c)
        pad = self.kernel // 2
        y = nn.Conv(y.shape[-1], (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=y.shape[-1], use_bias=False,
                    name="dw", dtype=self.dtype)(y)
        y = nn.relu(_bn(y, "dw_bn", self))
        if self.se:
            s = y.mean(axis=(1, 2))
            s = nn.relu(nn.Dense(max(y.shape[-1] // 4, 1), name="se_fc1",
                                 dtype=self.dtype)(s))
            s = jax.nn.sigmoid(nn.Dense(y.shape[-1], name="se_fc2",
                                        dtype=self.dtype)(s))
            y = y * s[:, None, None, :]
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    feature_group_count=(self.pw_group
                                         if self.shuffle else 1),
                    name="pwl", dtype=self.dtype)(y)
        y = _bn(y, "pwl_bn", self)
        if self.stride == 1 and cin == self.out_channels:
            y = y + x
        return y


class FBNetTrunk(nn.Module):
    """First conv + IRF stages from an arch def (``fbnet.py:26-70``).
    Returns the final stage's [B, H/s, W/s, C] feature map."""

    arch: Dict[str, Any] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        arch = self.arch or DEFAULT_ARCH
        first_c, first_s = arch["block_cfg"]["first"]
        x = nn.Conv(first_c, (3, 3), strides=(first_s,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="first",
                    dtype=self.dtype)(x)
        x = nn.relu(_bn(x, "first_bn", self))

        idx = 0
        for si, (ops, cfgs) in enumerate(zip(arch["block_op_type"],
                                             arch["block_cfg"]["stages"])):
            # expand [t, c, n, s] rows into per-block configs
            blocks: List[Tuple[int, int, int]] = []
            for t, c, n, s in cfgs:
                for j in range(n):
                    blocks.append((t, c, s if j == 0 else 1))
            assert len(blocks) == len(ops), (
                f"stage {si}: {len(ops)} ops vs {len(blocks)} blocks")
            for op, (t, c, s) in zip(ops, blocks):
                p = parse_op(op, t)
                if p.get("skip"):
                    if s != 1 or x.shape[-1] != c:
                        x = nn.Conv(c, (1, 1), strides=(s, s),
                                    use_bias=False, name=f"block{idx}_skip",
                                    dtype=self.dtype)(x)
                else:
                    x = IRFBlock(c, expansion=p["expansion"],
                                 kernel=p["kernel"], stride=s, se=p["se"],
                                 shuffle=p["shuffle"], dtype=self.dtype,
                                 name=f"block{idx}")(x)
                idx += 1
        return x
