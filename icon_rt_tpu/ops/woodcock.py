"""Woodcock (delta) tracking — the innermost hot loop.

Port of the reference's free-flight sampling loop
(ref: icon_rt/deviceCode.cu:149-186) to a lane-masked `lax.while_loop`:
one iteration = one tentative collision.  Under `vmap` every pixel runs the
same loop with per-lane done flags, which is exactly the wavefront shape
XLA vectorizes well.

RNG discipline matters for image parity with the CUDA reference: each
iteration consumes one uniform for the flight distance, and one more for
the acceptance test ONLY if the sample point landed inside the volume and
before the segment end — the same consumption order as the reference.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.lcg import lcg_next


class WoodcockResult(NamedTuple):
    t: jnp.ndarray           # () f32: min(t, t1) at loop exit
    albedo: jnp.ndarray      # (3,) f32
    extinction: jnp.ndarray  # () f32
    rng: jnp.ndarray         # () uint32


def woodcock_track(sample_fn: Callable, classify_fn: Callable,
                   org, direction, t0, t1, majorant, rng,
                   unit_distance, active=True) -> WoodcockResult:
    """Track one ray segment [t0, t1] against a constant majorant.

    sample_fn(pos) -> (hit: bool, value: f32); classify_fn(value) -> (4,) RGBA.
    All arguments are per-ray scalars/vectors; vmap over rays outside.
    """
    rate = majorant / unit_distance  # ref: deviceCode.cu:165 divides by this

    def cond(st):
        return ~st[4]

    def body(st):
        t, rng_s, albedo, ext, _ = st
        rng1, xi = lcg_next(rng_s)
        t_new = t - jnp.log(1.0 - xi) / rate
        beyond = t_new > t1
        pos = org + direction * t_new
        hit, value = sample_fn(pos)
        rgba = classify_fn(value)
        rng2, u = lcg_next(rng1)
        sampled = (~beyond) & hit          # acceptance draw happens only here
        accept = sampled & (rgba[3] >= u * majorant)
        rng_out = jnp.where(sampled, rng2, rng1)
        albedo_out = jnp.where(accept, rgba[:3], albedo)
        ext_out = jnp.where(accept, rgba[3], ext)
        done = beyond | accept
        return (t_new, rng_out, albedo_out, ext_out, done)

    init = (jnp.asarray(t0, jnp.float32), rng,
            jnp.zeros(3, jnp.float32), jnp.float32(0.0),
            # ref: deviceCode.cu:161-162 breaks immediately on majorant<=0;
            # inactive lanes (missed rays) skip the loop entirely
            (majorant <= 0.0) | ~jnp.asarray(active, jnp.bool_))
    t, rng_out, albedo, ext, _ = jax.lax.while_loop(cond, body, init)
    return WoodcockResult(jnp.minimum(t, t1), albedo, ext, rng_out)
