"""Grid-of-lists cell locator — the TPU-native replacement for BVH point
queries.

The reference locates the column containing a sample point with OptiX
user-geometry BVH queries or cuBQL traversal (ref: icon_rt/deviceCode.cu:
58-125, hostCode.cu:489-525).  BVH traversal is hostile to SIMD lanes; the
idiomatic TPU design is a dense 2-D (lat, lon) binning: ICON columns span
the full radial extent, so a 2-D footprint grid suffices.  Each bin holds a
fixed-width, -1-padded candidate list; a point query is

    bin = floor((lat, lon) normalized * dims)      # 2 flops
    ids = bins[bin]                                # one (K,) gather
    inside = radial check + 3 plane tests over K   # dense vector math
    first hit (lowest cell id) wins                # == brute-force order

Candidate lists are built conservatively from corner bounding boxes
(dateline-crossing cells are inserted as two wrapped lon ranges), so a
query returns exactly the brute-force result: the lowest-indexed cell
containing the point.  K is the max bin occupancy, a build-time constant —
static shapes, fully vectorizable, no divergence.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..data.icfile import ICDataset
from .cells import Cells, find_layer

F = np.float32


class Locator(NamedTuple):
    bins: jnp.ndarray      # (n_lat * n_lon, K) i32 cell ids, -1 padded
    lat_lo: jnp.ndarray    # () f32
    lat_hi: jnp.ndarray    # () f32
    lon_lo: jnp.ndarray    # () f32
    lon_hi: jnp.ndarray    # () f32
    dims: jnp.ndarray      # (2,) i32 (n_lat, n_lon)

    @property
    def k(self) -> int:
        return self.bins.shape[1]


def build_locator(ds: ICDataset, dims: tuple[int, int] | None = None,
                  pad: float = 1e-4, use_native: bool = True) -> Locator:
    """Bin cells by their (lat, lon) corner bounding boxes.

    dims defaults to roughly sqrt(2 N) per axis so mean occupancy stays a
    few cells per bin independent of the R2B level.  With use_native the
    two-pass binning runs in the C++ host module (native/icon_host.cpp) —
    identical output, load-time speed at R2B9 scale.
    """
    n = ds.num_cells
    if dims is None:
        side = max(1, int(np.sqrt(max(n, 1) * 2)))
        dims = (side, side)
    n_lat, n_lon = dims

    lat_lo = float(ds.lat.min()) - pad if n else -np.pi / 2
    lat_hi = float(ds.lat.max()) + pad if n else np.pi / 2
    lon_lo = float(ds.lon.min()) - pad if n else -np.pi
    lon_hi = float(ds.lon.max()) + pad if n else np.pi

    if use_native and n:
        from ..utils.native import native_locator_bins
        res = native_locator_bins(ds.lat, ds.lon, lat_lo, lat_hi,
                                  lon_lo, lon_hi, n_lat, n_lon)
        if res is not None:
            bins, _ = res
            return Locator(
                bins=jnp.asarray(bins),
                lat_lo=jnp.float32(lat_lo), lat_hi=jnp.float32(lat_hi),
                lon_lo=jnp.float32(lon_lo), lon_hi=jnp.float32(lon_hi),
                dims=jnp.asarray([n_lat, n_lon], jnp.int32),
            )

    def lat_bin(v):
        return np.clip(((v - lat_lo) / (lat_hi - lat_lo) * n_lat).astype(np.int64),
                       0, n_lat - 1)

    def lon_bin(v):
        return np.clip(((v - lon_lo) / (lon_hi - lon_lo) * n_lon).astype(np.int64),
                       0, n_lon - 1)

    la0 = lat_bin(ds.lat.min(axis=1))
    la1 = lat_bin(ds.lat.max(axis=1))

    # lon ranges; dateline-crossing cells (span > pi) insert two wrapped ranges
    lo_min = ds.lon.min(axis=1)
    lo_max = ds.lon.max(axis=1)
    crossing = (lo_max - lo_min) > np.pi

    entries = []  # (bin_id, cell_id) pairs, built per-axis-offset vectorized

    def insert(cell_ids, la0s, la1s, lb0s, lb1s):
        for dla in range(int((la1s - la0s).max()) + 1 if len(cell_ids) else 0):
            sel_a = dla <= (la1s - la0s)
            for dlo in range(int((lb1s - lb0s).max()) + 1 if len(cell_ids) else 0):
                sel = sel_a & (dlo <= (lb1s - lb0s))
                b = (la0s[sel] + dla) * n_lon + (lb0s[sel] + dlo)
                entries.append(np.stack([b, cell_ids[sel]], axis=1))

    ids = np.arange(n, dtype=np.int64)
    reg = ~crossing
    insert(ids[reg], la0[reg], la1[reg], lon_bin(lo_min[reg]), lon_bin(lo_max[reg]))
    if crossing.any():
        c = crossing
        # eastern part: [max of negative-side ... pi] -> use min of lons > 0
        pos_min = np.where(ds.lon[c] > 0, ds.lon[c], np.inf).min(axis=1)
        neg_max = np.where(ds.lon[c] < 0, ds.lon[c], -np.inf).max(axis=1)
        insert(ids[c], la0[c], la1[c], lon_bin(pos_min), np.full(c.sum(), n_lon - 1))
        insert(ids[c], la0[c], la1[c], np.zeros(c.sum(), np.int64), lon_bin(neg_max))

    if entries:
        all_e = np.concatenate(entries, axis=0)
        # sort by (bin, cell id) so candidate order == ascending cell id
        order = np.lexsort((all_e[:, 1], all_e[:, 0]))
        all_e = all_e[order]
        bin_ids, counts = np.unique(all_e[:, 0], return_counts=True)
        k = int(counts.max())
        bins = np.full((n_lat * n_lon, k), -1, np.int32)
        # position of each entry within its bin
        starts = np.zeros(len(all_e), np.int64)
        first = np.r_[True, all_e[1:, 0] != all_e[:-1, 0]]
        idx_in_bin = np.arange(len(all_e)) - np.maximum.accumulate(
            np.where(first, np.arange(len(all_e)), 0))
        bins[all_e[:, 0], idx_in_bin] = all_e[:, 1]
    else:
        bins = np.full((n_lat * n_lon, 1), -1, np.int32)

    return Locator(
        bins=jnp.asarray(bins),
        lat_lo=jnp.float32(lat_lo), lat_hi=jnp.float32(lat_hi),
        lon_lo=jnp.float32(lon_lo), lon_hi=jnp.float32(lon_hi),
        dims=jnp.asarray([n_lat, n_lon], jnp.int32),
    )


def sample_locator(cells: Cells, loc: Locator, pos):
    """Point query through the locator: (hit, value), one position.

    Matches sample_brute_force exactly (lowest-id containing cell) at
    O(K) instead of O(N) per query (ref fallback: deviceCode.cu:116-123).
    """
    r = jnp.sqrt(jnp.sum(pos * pos))
    lat = jnp.arcsin(pos[2] / r)
    lon = jnp.arctan2(pos[1], pos[0])
    n_lat = loc.dims[0]
    n_lon = loc.dims[1]
    bl = jnp.clip(((lat - loc.lat_lo) / (loc.lat_hi - loc.lat_lo)
                   * n_lat.astype(jnp.float32)).astype(jnp.int32), 0, n_lat - 1)
    bo = jnp.clip(((lon - loc.lon_lo) / (loc.lon_hi - loc.lon_lo)
                   * n_lon.astype(jnp.float32)).astype(jnp.int32), 0, n_lon - 1)
    cand = loc.bins[bl * n_lon + bo]                      # (K,)
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    inside_r = (r >= cells.h_bot[safe]) & (r <= cells.h_top[safe])
    planes = cells.planes[safe]                           # (K, 3, 4)
    ev = jnp.sum(planes[..., :3] * pos, axis=-1) - planes[..., 3]
    inside = valid & inside_r & jnp.all(ev <= 0.0, axis=-1)
    hit = jnp.any(inside)
    slot = jnp.argmax(inside)        # lowest-id candidate (bins sorted by id)
    idx = safe[slot]
    layer = find_layer(cells.height[idx], cells.num_layers[idx], r)
    value = jnp.where(hit, cells.value[idx, layer], 0.0)
    return hit, value
