"""RGBA transfer function: LUT + value range + opacity scale.

Mirrors the reference's host Transfunc (ref: common/transfunc.h:29-49) and
device-side classification (ref: icon_rt/deviceCode.cu:127-135), including
the reference's asymmetric lerp quirk — the second LUT sample is scaled by
(1, 1, 1, opacityScale) but the first is not — which we port faithfully for
image parity rather than "fixing".

The LUT is a fixed-size device array so live transfer-function edits never
change shapes (no recompilation); the reference resamples user LUTs to 300
entries in batch mode for the same reason (ref: common/pipeline.cu:469-473).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

DEFAULT_LUT_SIZE = 300

# Default 5-point blue-white-red LUT (ref: icon_rt/hostCode.cu:828-834)
DEFAULT_COLORS = np.array([
    [0.149, 0.015, 0.705, 1.00],
    [0.486, 0.603, 0.956, 0.75],
    [0.866, 0.866, 0.866, 0.50],
    [0.996, 0.690, 0.552, 0.25],
    [0.752, 0.298, 0.231, 0.00],
], np.float32)


class Transfunc(NamedTuple):
    """Device pytree.  `values` has static shape (size, 4)."""
    values: jnp.ndarray        # (S, 4) f32 RGBA LUT
    value_range: jnp.ndarray   # (2,) f32 absolute data range mapped to [0, 1]
    opacity_scale: jnp.ndarray  # () f32
    rel_range: jnp.ndarray     # (2,) f32 (kept for .xf parity; editor state)

    @property
    def size(self) -> int:
        return self.values.shape[0]


def resample_lut(src: np.ndarray, dst_size: int) -> np.ndarray:
    """Linear resample of an (S, 4) LUT to (dst_size, 4).

    Matches the reference's resampleLUT including its inverted lerp weight
    (ref: common/dvr_course-common.h:44-70): entry i blends
    src[a]*(1-frac) ... with the reference's lerp(a, b, x) = x*a + (1-x)*b
    called as lerp(rgb1, rgb2, 1-frac), i.e. result = (1-frac)*src[a] + frac*src[b].
    """
    src = np.asarray(src, np.float32)
    s = src.shape[0]
    out = np.empty((dst_size, 4), np.float32)
    for i in range(dst_size):
        f = np.float32(i) / np.float32(dst_size) * (s - 1)
        a = int(f)
        b = min(a + 1, s - 1)
        frac = np.float32(f - a)
        out[i] = (1.0 - frac) * src[a] + frac * src[b]
    return out


def make_transfunc(colors: np.ndarray | None = None,
                   value_range=(0.0, 1.0),
                   opacity_scale: float = 1.0,
                   rel_range=(0.0, 1.0),
                   size: int = DEFAULT_LUT_SIZE) -> Transfunc:
    if colors is None:
        colors = DEFAULT_COLORS
    colors = np.asarray(colors, np.float32)
    if colors.shape[0] != size:
        colors = resample_lut(colors, size)
    return Transfunc(
        values=jnp.asarray(colors),
        value_range=jnp.asarray(value_range, jnp.float32),
        opacity_scale=jnp.asarray(opacity_scale, jnp.float32),
        rel_range=jnp.asarray(rel_range, jnp.float32),
    )


def post_classify(tf: Transfunc, v):
    """Scalar -> RGBA via the LUT (ref: icon_rt/deviceCode.cu:127-135).

    Ports the reference arithmetic exactly:
      v normalized by valueRange; idx = int(v*size) (trunc toward zero);
      frac = v*size - idx;
      result = lut[clamp(idx)] * frac
             + lut[clamp(idx+1)] * (1-frac) * (1, 1, 1, opacityScale)
    """
    size = tf.size
    vn = (v - tf.value_range[0]) / (tf.value_range[1] - tf.value_range[0])
    vs = vn * jnp.float32(size)
    idx = vs.astype(jnp.int32)  # C int cast: trunc toward zero
    frac = vs - idx.astype(jnp.float32)
    v1 = tf.values[jnp.clip(idx, 0, size - 1)]
    v2 = tf.values[jnp.clip(idx + 1, 0, size - 1)]
    scale = jnp.stack([jnp.float32(1), jnp.float32(1), jnp.float32(1),
                       tf.opacity_scale.astype(jnp.float32)])
    return v1 * frac[..., None] + v2 * (1.0 - frac)[..., None] * scale


def pack_lut(tf: Transfunc):
    """(S, 4) LUT -> a pack_table-layout (ceil(S/32), 128) device array so
    per-lane classification gathers are aligned 128-lane bursts instead of
    4-wide misaligned rows (CLAUDE.md gather-width rule; the row pad never
    reads — indices are clipped to S-1).  Pure jnp: usable inside jit."""
    size = tf.size
    pad = (-size) % 32
    v = tf.values
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, 4), v.dtype)])
    return v.reshape(-1, 128)


def post_classify_packed(tf: Transfunc, lut_packed, v):
    """post_classify reading from a pack_lut'd LUT (bit-identical
    arithmetic; hot-loop variant for per-lane shade-time classification)."""
    from ..utils.layout import packed_gather
    size = tf.size
    vn = (v - tf.value_range[0]) / (tf.value_range[1] - tf.value_range[0])
    vs = vn * jnp.float32(size)
    idx = vs.astype(jnp.int32)  # C int cast: trunc toward zero
    frac = vs - idx.astype(jnp.float32)
    v1 = packed_gather(lut_packed, jnp.clip(idx, 0, size - 1), 4)
    v2 = packed_gather(lut_packed, jnp.clip(idx + 1, 0, size - 1), 4)
    scale = jnp.stack([jnp.float32(1), jnp.float32(1), jnp.float32(1),
                       tf.opacity_scale.astype(jnp.float32)])
    return v1 * frac[..., None] + v2 * (1.0 - frac)[..., None] * scale
