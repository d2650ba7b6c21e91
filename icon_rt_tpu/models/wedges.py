"""Per-layer wedge (triangular prism) extraction and the unstructured
sampler — the reference's cuBQL mode (ref: icon_rt/hostCode.cu:557-650,
deviceCode.cu:90-115).

Each column layer becomes one 6-vertex wedge with FLAT bottom/top faces
(no bulge) and per-vertex scalars.  Faithful quirk: the reference's
'#if 1' branch (hostCode.cu:583-586) assigns the BOTTOM value bv to all
six vertices, where bv is the layer-midpoint average
    bv(0) = value[0];  bv(h) = (getValue(h[h-1]) + getValue(h[h])) / 2
(hostCode.cu:574), so cuBQL-mode images are piecewise constant with
smoothed, shifted values relative to the analytic sampler.

Cell location re-uses the 2-D locator: wedge side faces lie in the SAME
origin-through planes as the column side planes (corner 'verticals' are
collinear rays from the origin), so the candidate columns are identical;
only the radial layer needs a search window, whose width is bounded by the
flat-face sagitta computed at build time.  This replaces the cuBQL BVH
point query with dense gathers (SURVEY §2 row 20).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.icfile import ICDataset, MAX_LAYERS
from ..ops.uelems import intersect_wedge
from ..utils.vecmath import np_to_cartesian
from .cells import Cells, find_layer
from .locator import Locator

F = np.float32


class Wedges:
    """Pytree whose layer_pad (the static radial search-window width) is
    aux data, so it stays a Python int under jit."""

    def __init__(self, verts, scalars, cell_offset, layer_pad: int):
        self.verts = verts              # (W, 6, 3) f32
        self.scalars = scalars          # (W, 6) f32
        self.cell_offset = cell_offset  # (N,) i32: first wedge per column
        self.layer_pad = layer_pad      # static search-window width (>= 1)


jax.tree_util.register_pytree_node(
    Wedges,
    lambda w: ((w.verts, w.scalars, w.cell_offset), w.layer_pad),
    lambda pad, children: Wedges(*children, pad))


def _bv(ds: ICDataset, h: np.ndarray) -> np.ndarray:
    """Reference's per-layer wedge scalar (hostCode.cu:574): midpoint
    average of getValue at the two bounding heights; getValue(height[k])
    resolves to value[max(k-1, 0)]."""
    # getValue(height[h-1]) = value[max(h-2, 0)]; getValue(height[h]) = value[h-1]
    v_prev = ds.value[np.arange(ds.num_cells), np.maximum(h - 2, 0)]
    v_cur = ds.value[np.arange(ds.num_cells), np.maximum(h - 1, 0)]
    out = 0.5 * (v_prev + v_cur)
    return np.where(h == 0, ds.value[:, 0], out).astype(F)


def build_wedges(ds: ICDataset) -> Wedges:
    n = ds.num_cells
    counts = ds.num_layers.astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1].astype(np.int32)
    total = int(counts.sum())
    verts = np.zeros((total, 6, 3), F)
    scalars = np.zeros((total, 6), F)

    max_l = int(ds.num_layers.max()) if n else 0
    max_sag_layers = 0
    for L in range(max_l):
        sel = np.nonzero(ds.num_layers > L)[0]
        if not len(sel):
            continue
        widx = offsets[sel] + L
        hb = ds.height[sel, L]
        ht = ds.height[sel, L + 1]
        sph_b = np.stack([np.repeat(hb[:, None], 3, 1), ds.lat[sel], ds.lon[sel]],
                         axis=-1).astype(F)
        sph_t = np.stack([np.repeat(ht[:, None], 3, 1), ds.lat[sel], ds.lon[sel]],
                         axis=-1).astype(F)
        bv3 = np_to_cartesian(sph_b)   # (n_sel, 3, 3)
        tv3 = np_to_cartesian(sph_t)
        verts[widx, :3] = bv3
        verts[widx, 3:] = tv3
        s = _bv(ICDataset(ds.lat[sel], ds.lon[sel], ds.num_layers[sel],
                          ds.height[sel], ds.value[sel]), np.full(len(sel), L))
        scalars[widx] = s[:, None]
        # flat-face sagitta in units of this layer's thickness
        bary = bv3.mean(axis=1)
        sag = hb - np.sqrt(np.sum(bary * bary, axis=-1))
        thick = np.maximum(ht - hb, 1e-30)
        max_sag_layers = max(max_sag_layers, int(np.ceil((sag / thick).max())))

    return Wedges(verts=jnp.asarray(verts), scalars=jnp.asarray(scalars),
                  cell_offset=jnp.asarray(offsets),
                  layer_pad=min(max_sag_layers + 1, MAX_LAYERS))


def sample_wedges(cells: Cells, wedges: Wedges, loc: Locator, pos):
    """Point query via locator columns + radial window + Newton wedge test.
    Returns (hit, value); one position (vmap outside).

    Semantics match the reference cuBQL point query: the value of the
    first wedge whose Newton inversion contains the point (traversal order
    in the reference BVH is arbitrary; wedges tile the column, so at most
    boundary ties differ).
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
    cand = loc.bins[bl * n_lon + bo]              # (K,)
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)

    pad = wedges.layer_pad

    def per_column(cid, ok):
        base_layer = find_layer(cells.height[cid], cells.num_layers[cid], r)

        def per_offset(doff):
            layer = base_layer + doff
            in_range = (layer >= 0) & (layer < cells.num_layers[cid])
            w = wedges.cell_offset[cid] + jnp.clip(layer, 0, MAX_LAYERS - 1)
            hit, val = intersect_wedge(pos, wedges.verts[w], wedges.scalars[w])
            hit = hit & in_range & ok
            return hit, jnp.where(hit, val, 0.0)

        hits, vals = jax.vmap(per_offset)(jnp.arange(pad))
        got = jnp.any(hits)
        first = jnp.argmax(hits)
        return got, vals[first]

    hits, vals = jax.vmap(per_column)(safe, valid)
    hit = jnp.any(hits)
    first = jnp.argmax(hits)
    return hit, jnp.where(hit, vals[first], 0.0)


def bv_all(values: np.ndarray, num_layers: np.ndarray) -> np.ndarray:
    """(N, MAX_LAYERS) per-wedge constant scalar for every layer — the
    vectorized _bv (ref: hostCode.cu:574 and its getValue height-snap
    quirk): bv[0] = value[0]; bv[L] = (value[max(L-2,0)]
    + value[max(L-1,0)]) / 2.  Entries past num_layers are value[0]-ish
    garbage; callers mask by layer count."""
    values = np.asarray(values, F)
    n, ml = values.shape
    L = np.arange(ml)
    prev = values[:, np.maximum(L - 2, 0)]
    cur = values[:, np.maximum(L - 1, 0)]
    out = 0.5 * (prev + cur)
    out[:, 0] = values[:, 0]
    return out.astype(F)


def column_min_norm(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """(N,) minimum norm over the chordal hull of a column's three corner
    unit vectors: a flat triangular face at height h spans radii
    [h * mn, h], so wedge radial extents (and band majorant attribution)
    must inflate downward by this factor."""
    lat = np.asarray(lat, F)
    lon = np.asarray(lon, F)
    cl = np.cos(lat)
    u = np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)],
                 axis=-1)                                     # (N, 3, 3)

    def seg_min(a, b):
        """Min |x| over the segment a..b, per row."""
        d = b - a
        tt = -np.sum(a * d, axis=-1) / np.maximum(
            np.sum(d * d, axis=-1), 1e-30)
        tt = np.clip(tt, 0.0, 1.0)
        p = a + tt[:, None] * d
        return np.sqrt(np.sum(p * p, axis=-1))

    # closest point of the supporting plane; valid when inside the triangle
    n = np.cross(u[:, 1] - u[:, 0], u[:, 2] - u[:, 0])
    nn = np.maximum(np.sum(n * n, axis=-1), 1e-30)
    c = np.sum(u[:, 0] * n, axis=-1)
    q = (c / nn)[:, None] * n
    # barycentric inside test via same-side sign of sub-triangle dets
    def tri_in(q):
        s = []
        for i in range(3):
            a, b = u[:, i], u[:, (i + 1) % 3]
            s.append(np.sum(np.cross(b - a, q - a) * n, axis=-1))
        s = np.stack(s, axis=-1)
        return (s >= 0).all(axis=-1) | (s <= 0).all(axis=-1)

    edge_min = np.minimum(seg_min(u[:, 0], u[:, 1]),
                          np.minimum(seg_min(u[:, 1], u[:, 2]),
                                     seg_min(u[:, 2], u[:, 0])))
    mn = np.where(tri_in(q), np.minimum(np.abs(c) / np.sqrt(nn), edge_min),
                  edge_min)
    return np.minimum(mn, 1.0).astype(F)
