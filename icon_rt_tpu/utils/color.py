"""Color conversion and RGBA8 packing, matching the reference bit-for-bit.

ref: common/dvr_course-common-both.h:30-35 (linear_to_srgb),
     :89-110 (make_8bit / make_rgba).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_to_srgb(x):
    """sRGB OETF; branch at 0.0031308 exactly as the reference."""
    return jnp.where(x <= 0.0031308,
                     12.92 * x,
                     1.055 * jnp.power(x, 1.0 / 2.4) - 0.055).astype(jnp.float32)


def make_8bit(f):
    """min(255, max(0, int(f*256))) with C truncation-toward-zero."""
    i = (jnp.asarray(f, jnp.float32) * 256.0).astype(jnp.int32)
    return jnp.clip(i, 0, 255).astype(jnp.uint32)


def make_rgba(color):
    """(..., 4) float RGBA -> packed uint32 little-endian R|G<<8|B<<16|A<<24."""
    r = make_8bit(color[..., 0])
    g = make_8bit(color[..., 1])
    b = make_8bit(color[..., 2])
    a = make_8bit(color[..., 3])
    return r | (g << jnp.uint32(8)) | (b << jnp.uint32(16)) | (a << jnp.uint32(24))


def make_rgba3(color):
    """(..., 3) float RGB -> packed uint32 with alpha forced to 0xff."""
    r = make_8bit(color[..., 0])
    g = make_8bit(color[..., 1])
    b = make_8bit(color[..., 2])
    return r | (g << jnp.uint32(8)) | (b << jnp.uint32(16)) | (jnp.uint32(0xFF) << jnp.uint32(24))


def unpack_rgba(packed):
    """Packed uint32 (...,) -> uint8 (..., 4) RGBA channels."""
    packed = np.asarray(packed, np.uint32)
    out = np.empty(packed.shape + (4,), np.uint8)
    out[..., 0] = packed & 0xFF
    out[..., 1] = (packed >> 8) & 0xFF
    out[..., 2] = (packed >> 16) & 0xFF
    out[..., 3] = (packed >> 24) & 0xFF
    return out
