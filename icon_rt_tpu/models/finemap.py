"""Fine primary-candidate map: the two-stage locate's first stage.

The R2B9 profile (docs/ROUND3.md) shows the per-pending-lane locate is
~95% candidate test-row gathers: the coarse lat/lon locator averages 8+
candidates per bin (k_cap = 16 rows fetched), at ~375 of the ~395 ns/lane
locate cost.  This module trades those 16 row gathers for ONE map row:

  * a lat/lon grid `factor`x finer per axis than the locator stores, per
    fine bin, the cell containing the bin CENTER (c0) and the most likely
    second cell (c1: the nearest neighboring bin's differing c0) — at
    factor 2 a fine bin is smaller than a cell, so {c0, c1} covers every
    query point in the bin except near cell vertices;
  * the render-side primary locate (ops/fastq._locate_q_fine) gathers the
    (c0, c1) pair + 2 test rows instead of bins row + 16 test rows
    (~51 vs ~375 ns/lane measured at R2B9);
  * query points in neither candidate KEEP their pending flag and are
    resolved by the full coarse-locator query on a compacted second stage
    (ops/fast._make_refresh with primary_fn) — the two-stage locate is
    therefore EXACT: stage 1 is only ever a short-cut to the same
    containing column the full query returns (up to f32 boundary ties).

Build runs on the device in chunked calls (the 60 s TPU worker ceiling,
README): c0 = lateral containment of fine-bin centers against the coarse
bin's candidates — side planes pass through the origin (column edges are
radial), so containment of a UNIT-SPHERE point is exact for every radius
and no radial window is needed.  c1 is a pure map-space pass (nearest
differing neighbor in the c0 image).

Reference analog: cuBQL BVH point queries (ref: icon_rt/hostCode.cu
cell-locator usage); the reference pays per-query tree traversal where
this design pays one precomputed row.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["FineMap", "build_finemap"]


class FineMap(NamedTuple):
    pairs: object          # packed (F_lat*F_lon, 2) i32 (c0, c1), -1 empty
                           # (utils/layout.pack_table layout: (n/64, 128))
    lat_lo: object         # () f32 — same angular window as the Locator
    lat_hi: object
    lon_lo: object
    lon_hi: object
    dims: object           # (2,) i32 (F_lat, F_lon)


def _centers_c0(loc, test12, k_cap: int, f_lat: int, f_lon: int,
                bids, factor: int):
    """Containing cell of each fine-bin center in `bids` (lateral test
    against the coarse bin's candidates; -1 where no candidate passes,
    which only happens on f32 ties along cell edges)."""
    import jax.numpy as jnp

    from ..utils.layout import packed_gather

    F32 = jnp.float32
    fl = bids // f_lon
    fo = bids % f_lon
    lat = loc.lat_lo + (fl.astype(F32) + 0.5) \
        * ((loc.lat_hi - loc.lat_lo) / F32(f_lat))
    lon = loc.lon_lo + (fo.astype(F32) + 0.5) \
        * ((loc.lon_hi - loc.lon_lo) / F32(f_lon))
    cl = jnp.cos(lat)
    px = cl * jnp.cos(lon)
    py = cl * jnp.sin(lon)
    pz = jnp.sin(lat)
    # the fine grid is an exact factor-x refinement: integer-divide back
    n_lon = loc.dims[1]
    bid = (fl // factor) * n_lon + (fo // factor)
    cand = packed_gather(loc.bins, bid, k_cap)       # (M, K)
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    trows = packed_gather(test12, safe, 16)          # (M, K, 16)
    ev1 = (trows[..., 0] * px[:, None] + trows[..., 1] * py[:, None]
           + trows[..., 2] * pz[:, None])
    ev2 = (trows[..., 3] * px[:, None] + trows[..., 4] * py[:, None]
           + trows[..., 5] * pz[:, None])
    ev3 = (trows[..., 6] * px[:, None] + trows[..., 7] * py[:, None]
           + trows[..., 8] * pz[:, None])
    inside = valid & (ev1 <= 0.0) & (ev2 <= 0.0) & (ev3 <= 0.0)
    hit = jnp.any(inside, axis=1)
    slot = jnp.argmax(inside, axis=1)
    k_oh = (jnp.arange(cand.shape[1])[None, :] == slot[:, None])
    cid = jnp.sum(jnp.where(k_oh, safe, 0), axis=1)
    return jnp.where(hit, cid, -1)


def _second_candidates(c0_img):
    """c1 per fine bin: the first neighboring bin (E, W, S, N, then
    diagonals) whose c0 differs — map-space arithmetic only.  Longitude
    wraps (the grid spans the full circle); latitude clamps at the poles."""
    import jax.numpy as jnp

    def shift_lat(img, d):
        if d == 0:
            return img
        if d > 0:
            return jnp.concatenate([img[d:], img[-1:].repeat(d, 0)], 0)
        return jnp.concatenate([img[:1].repeat(-d, 0), img[:d]], 0)

    c1 = jnp.full_like(c0_img, -1)
    for dl, do in ((0, 1), (0, -1), (1, 0), (-1, 0),
                   (1, 1), (1, -1), (-1, 1), (-1, -1)):
        nb = shift_lat(jnp.roll(c0_img, -do, axis=1) if do else c0_img, dl)
        take = (c1 < 0) & (nb != c0_img) & (nb >= 0)
        c1 = jnp.where(take, nb, c1)
    return c1


def build_finemap(loc, test12, k_cap: int, factor: int = 2,
                  max_call_lanes: int = 1 << 21) -> FineMap:
    """Build the fine map on the device.

    loc: models/locator.Locator (PACK-8 bins).  test12: the quantized
    tier's packed (N, 16) side-plane table (QuantizedCells.test12; only
    columns 0..8 are read).  The c0 pass is split into multiple device
    calls of whole fine-grid ROWS totalling <= max_call_lanes centers
    each: per-call both the gather wall-clock (the full R2B9 pass is
    ~65 s — over the 60 s worker ceiling as one call) AND the (M, K, 16)
    f32 test-row intermediate (2 GB at 2M lanes, k_cap 16 — 27 GB and an
    instant OOM at the 2048-row chunk this started with) stay bounded."""
    import jax
    import jax.numpy as jnp

    f_lat = int(loc.dims[0]) * factor
    f_lon = int(loc.dims[1]) * factor
    rows_per_call = min(f_lat, max(1, max_call_lanes // f_lon))

    @jax.jit
    def c0_rows(row0, loc_, t12):
        bids = row0 * f_lon + jnp.arange(rows_per_call * f_lon)
        return _centers_c0(loc_, t12, k_cap, f_lat, f_lon, bids, factor)

    parts = []
    for row0 in range(0, f_lat, rows_per_call):
        part = c0_rows(jnp.int32(row0), loc, test12)
        part.block_until_ready()    # keep ONE (M, K, 16) live at a time
        parts.append(part.reshape(rows_per_call, f_lon))
    c0_img = jnp.concatenate(parts, axis=0)[:f_lat]

    parts = None    # free the per-call aliases before the c1 pass

    @jax.jit
    def c1_pairs(img):
        # fuse c1 + interleave in one call so no (c0, c1) pair of full
        # images is ever live alongside the packed output (HBM at R2B9:
        # the scene already holds ~10.7 GB of 16 GB)
        c1 = _second_candidates(img)
        return jnp.stack([img.reshape(-1), c1.reshape(-1)], axis=-1)

    pairs = c1_pairs(c0_img)
    del c0_img
    n = pairs.shape[0]
    pad = (-n) % 64
    if pad:
        pairs = jnp.concatenate(
            [pairs, jnp.full((pad, 2), -1, jnp.int32)], axis=0)
    pairs = pairs.reshape(-1, 128)                   # pack_table layout
    return FineMap(pairs=pairs,
                   lat_lo=loc.lat_lo, lat_hi=loc.lat_hi,
                   lon_lo=loc.lon_lo, lon_hi=loc.lon_hi,
                   dims=jnp.asarray([f_lat, f_lon], jnp.int32))
