"""On-device colorful-prompt rendering.

Replaces the reference's PIL alpha-paste CPU hot spot (one full image copy
per candidate region, ``refcocodataset.py:290-302``, ``vcrdataset.py:259-288``,
``gqadataset.py:151-156``): the base image is uploaded once and every colored
copy is composited on device with integer math bit-identical to PIL's
``Image.paste(fg, box, fg)``:

    out = (fg·α + bg·(255−α) + 127) // 255        (verified vs PIL per-pixel)

Box-extent conventions differ per reference dataset and are preserved:
RefCOCO paints ``[x1, x2)`` of the *inclusive* box (i.e. w−1 pixels wide,
``refcocodataset.py:296-302``); GQA/VCR paint ``x2−x1+1`` wide
(``gqadataset.py:153-156``).

All functions are jit-friendly: rectangles become coordinate masks
(broadcasted iota comparisons), so shapes stay static and rendering fuses
into the input pipeline of the detector forward.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def alpha_composite_u8(bg: Array, fg_rgb: Array, alpha: Array) -> Array:
    """PIL-exact integer alpha compositing.

    bg [H, W, 3] uint8 · fg_rgb [3] or [H, W, 3] · alpha [H, W] (0..255)
    → [H, W, 3] uint8
    """
    bg_i = bg.astype(jnp.int32)
    fg_i = jnp.broadcast_to(jnp.asarray(fg_rgb, jnp.int32), bg_i.shape)
    a = alpha.astype(jnp.int32)[..., None]
    out = (fg_i * a + bg_i * (255 - a) + 127) // 255
    return out.astype(jnp.uint8)


def rect_alpha(h: int, w: int, rect: Array, alpha_value: Array,
               inclusive: bool = False) -> Array:
    """Alpha map for a rectangle paste.

    rect [4] xyxy (float or int). ``inclusive=False`` paints ``[x1, x2)``
    (RefCOCO convention on inclusive boxes: w−1 wide); ``inclusive=True``
    paints ``[x1, x2]`` (GQA/VCR).
    """
    x1 = rect[0].astype(jnp.int32)
    y1 = rect[1].astype(jnp.int32)
    x2 = rect[2].astype(jnp.int32)
    y2 = rect[3].astype(jnp.int32)
    if inclusive:
        x2 = x2 + 1
        y2 = y2 + 1
        # GQA clamps degenerate boxes to at least 1px (max(x2-x1+1, 1))
        x2 = jnp.maximum(x2, x1 + 1)
        y2 = jnp.maximum(y2, y1 + 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
    return jnp.where(inside, alpha_value.astype(jnp.int32), 0)


def paste_rect(image: Array, rect: Array, color_rgba: Array,
               inclusive: bool = False) -> Array:
    """Composite one colored rectangle onto an RGB uint8 image."""
    h, w = image.shape[:2]
    alpha = rect_alpha(h, w, rect, color_rgba[3], inclusive)
    return alpha_composite_u8(image, color_rgba[:3], alpha)


def paste_rects(image: Array, rects: Array, colors_rgba: Array,
                valid: Array, inclusive: bool = False) -> Array:
    """Sequentially composite K rectangles (later rects over earlier, the
    reference's paste loop order). rects [K, 4] · colors [K, 4] · valid [K]."""

    def body(img, inputs):
        rect, color, ok = inputs
        pasted = paste_rect(img, rect, color, inclusive)
        return jnp.where(ok, pasted, img), ()

    out, _ = jax.lax.scan(body, image, (rects, colors_rgba, valid))
    return out


def paste_mask(image: Array, mask: Array, color_rgba: Array) -> Array:
    """Segmentation-mask paste (RefCOCO RLE / VCR polygons, decoded host-side
    to a binary [H, W] mask): fg color with per-pixel alpha = α·mask."""
    alpha = mask.astype(jnp.int32) * color_rgba[3].astype(jnp.int32)
    return alpha_composite_u8(image, color_rgba[:3], alpha)


def render_copies(image: Array, rects: Array, colors_rgba: Array,
                  inclusive: bool = False) -> Array:
    """One colored copy per candidate rect (the RefCOCO per-copy expansion):
    image [H, W, 3] · rects [N, 4] · colors [N, 4] → [N, H, W, 3]."""
    return jax.vmap(lambda r, c: paste_rect(image, r, c, inclusive))(
        rects, colors_rgba)


def to_detector_input(image_u8_rgb: Array, pixel_mean_bgr: Tuple[float, ...],
                      dtype=jnp.float32) -> Array:
    """RGB uint8 → BGR255 float minus per-channel mean (the reference's
    ToTensor + TO_BGR255 + Normalize transform, ``transforms/build.py:26-45``)."""
    bgr = image_u8_rgb[..., ::-1].astype(dtype)
    return bgr - jnp.asarray(pixel_mean_bgr, dtype)
