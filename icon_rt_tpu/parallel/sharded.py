"""Multi-chip rendering over a `jax.sharding.Mesh`.

The reference is a single-process, single-GPU renderer
(owlContextCreate(nullptr, 1), ref: common/pipeline.cu:314); scaling out is
a first-class axis of the TPU rebuild.  Two orthogonal mesh axes:

  * "tiles"   — the framebuffer is sharded by pixel rows; each device
                renders its own tile; no communication until display
                gather.  This is the reference's one-thread-per-pixel data
                parallelism (ref: common/pipeline.cu:1064-1072) spread over
                chips.
  * "samples" — each device renders the SAME pixels at a different
                accumulation sample id; a `psum` mean over ICI composites
                the batch into the progressive average.  Semantics: for
                pixels whose rays all hit (or all miss) the volume AABB
                this equals sequential accumulation; at silhouette pixels
                the batch average weights written samples uniformly where
                the reference's running average would weight by arrival
                order — an intentional, documented difference of the
                batch-parallel mode.

The scene (cells, LUT, accel, locator) is replicated; only framebuffer
state is sharded.  All collectives ride ICI via `shard_map`; nothing else
is needed — the reference has no communication backend to port (SURVEY
§2.4).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cells import Cells
from ..models.locator import Locator
from ..models.transfunc import Transfunc
from ..ops.render import (LaunchParams, _finalize, frame_pixels_accel,
                          frame_pixels_ae)


def make_mesh(devices=None, tiles: int | None = None, samples: int = 1,
              axis_names=("tiles", "samples")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tiles is None:
        tiles = n // samples
    assert tiles * samples == n, f"{tiles}x{samples} != {n} devices"
    dev = np.asarray(devices).reshape(tiles, samples)
    return Mesh(dev, axis_names)


def shard_frame(mesh: Mesh, accum, fb):
    """Place framebuffer state row-sharded over the 'tiles' axis."""
    sh_accum = NamedSharding(mesh, P("tiles", None))
    sh_fb = NamedSharding(mesh, P("tiles"))
    return jax.device_put(accum, sh_accum), jax.device_put(fb, sh_fb)


def render_frame_sharded(mesh: Mesh, cells: Cells, tf: Transfunc, accel,
                         lp: LaunchParams, accum, fb, *,
                         width: int, height: int,
                         accel_mode: str = "grid", sampler: str = "locator",
                         locator: Locator | None = None,
                         raygen: str = "accel",
                         packed=None, bands=None):
    """One progressive render step, framebuffer tile-sharded over 'tiles'
    and sample-sharded over 'samples' (psum composite).

    With a (T, S) mesh this performs S accumulation samples per call:
    device (t, s) renders rows-tile t at accum_id = lp.accum_id * S + s.
    raygen: 'accel' | 'ae' | 'fast' (fast needs packed + bands + locator).
    Returns (accum, fb) with the same shardings as the inputs.
    """
    n_tiles = mesh.shape["tiles"]
    n_samples = mesh.shape["samples"]
    total = width * height
    assert total % n_tiles == 0, "pixel count must divide the tiles axis"
    p_local = total // n_tiles

    def body(cells_, tf_, accel_, locator_, packed_, bands_, lp_,
             accum_local, fb_local):
        t = jax.lax.axis_index("tiles")
        s = jax.lax.axis_index("samples")
        accum_id = lp_.accum_id * n_samples + s
        lp_s = lp_._replace(accum_id=accum_id)
        pix = t * p_local + jnp.arange(p_local, dtype=jnp.int32)
        ys, xs = jnp.divmod(pix, width)
        if raygen == "fast":
            from ..ops.fast import render_fast
            wrote, ca = render_fast(cells_, packed_, locator_, bands_, lp_s,
                                    xs, ys, width, height)
        elif raygen == "ae" or accel_ is None:
            wrote, ca = frame_pixels_ae(cells_, tf_, lp_s, xs, ys,
                                        width, height, sampler, locator_)
        else:
            wrote, ca = frame_pixels_accel(cells_, tf_, accel_, lp_s, xs, ys,
                                           width, height, accel_mode,
                                           sampler, locator_)
        if n_samples > 1:
            # batch composite over ICI: average written samples
            n_wrote = jax.lax.psum(wrote.astype(jnp.float32), "samples")
            ca_sum = jax.lax.psum(jnp.where(wrote[:, None], ca, 0.0), "samples")
            wrote = n_wrote > 0.0
            ca = ca_sum / jnp.maximum(n_wrote, 1.0)[:, None]
        return _finalize(wrote, ca, accum_local, fb_local, lp_.accum_id)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(),
                  P("tiles", None), P("tiles")),
        out_specs=(P("tiles", None), P("tiles")),
        check_vma=False)
    return fn(cells, tf, accel, locator, packed, bands, lp, accum, fb)


def jit_render_frame_sharded(mesh, *, width, height, accel_mode="grid",
                             sampler="locator", raygen="accel", donate=True):
    """Jitted closure over the static configuration."""
    def step(cells, tf, accel, lp, accum, fb, locator=None,
             packed=None, bands=None):
        return render_frame_sharded(mesh, cells, tf, accel, lp, accum, fb,
                                    width=width, height=height,
                                    accel_mode=accel_mode, sampler=sampler,
                                    locator=locator, raygen=raygen,
                                    packed=packed, bands=bands)
    kw = dict(donate_argnums=(4, 5)) if donate else {}
    return jax.jit(step, **kw)


def gather_frame(fb) -> np.ndarray:
    """Collect the sharded framebuffer to the host for display
    (the one DEVICE->HOST boundary, as in ref: common/pipeline.cu:1084-1086)."""
    return np.asarray(jax.device_get(fb))
