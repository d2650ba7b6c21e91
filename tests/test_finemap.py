"""Fine primary-candidate map (models/finemap.py): the two-stage locate.

The fine map is a pure shortcut: stage 1 serves a pending lane only when
the query point provably lies in one of the bin's two mapped candidates,
so the rendered output must be BIT-IDENTICAL to the single-stage full
locate (the authoritative second stage serves the misses).  Tests assert
(a) every fine-bin center's c0 equals brute-force containment over all
cells, (b) c1 neighbor selection is sane, and (c) quantized-tier renders
with and without the map agree bit-for-bit.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from icon_rt_tpu.data import synthetic
from icon_rt_tpu.models.cells import compute_stats
from icon_rt_tpu.models.finemap import build_finemap
from icon_rt_tpu.models.locator import build_locator_csr, densify_csr
from icon_rt_tpu.models.qcells import bake_alpha_q, quantize_cells, \
    quantize_dataset_values
from icon_rt_tpu.models.shells import build_radial_bands, \
    update_band_majorants
from icon_rt_tpu.models.transfunc import make_transfunc
from icon_rt_tpu.ops.camera import Camera
from icon_rt_tpu.ops.fastq import render_frame_fast_q
from icon_rt_tpu.ops.render import alloc_frame, make_launch_params
from icon_rt_tpu.utils.layout import unpack_table


@pytest.fixture(scope="module")
def scene():
    ds = synthetic.icosphere(subdivisions=2, num_layers=5)
    ds_q, lo, hi = quantize_dataset_values(ds)
    stats = compute_stats(ds_q)
    tf = make_transfunc(value_range=tuple(stats.data_range), size=32)
    q = bake_alpha_q(quantize_cells(ds_q), tf)
    csr, k_cap = build_locator_csr(ds_q)
    loc = densify_csr(csr, k_cap)
    bands = update_band_majorants(build_radial_bands(ds_q, 16),
                                  tf.values, tf.value_range)
    fm = build_finemap(loc, q.test12, k_cap, factor=2)
    return ds_q, stats, tf, q, loc, k_cap, bands, fm


def test_c0_matches_brute_force(scene):
    """c0 of every fine-bin center == lateral containment over ALL cells
    (the map may only ever shortcut to the true containing column)."""
    ds_q, stats, tf, q, loc, k_cap, bands, fm = scene
    f_lat, f_lon = (int(v) for v in np.asarray(fm.dims))
    n = ds_q.num_cells
    pairs = unpack_table(fm.pairs, 2, f_lat * f_lon)
    t12 = unpack_table(q.test12, 16, n)[:, :9].astype(np.float64)

    rng = np.random.default_rng(7)
    bids = rng.choice(f_lat * f_lon, size=512, replace=False)
    fl = bids // f_lon
    fo = bids % f_lon
    lat_lo, lat_hi = float(loc.lat_lo), float(loc.lat_hi)
    lon_lo, lon_hi = float(loc.lon_lo), float(loc.lon_hi)
    lat = lat_lo + (fl + 0.5) * (lat_hi - lat_lo) / f_lat
    lon = lon_lo + (fo + 0.5) * (lon_hi - lon_lo) / f_lon
    p = np.stack([np.cos(lat) * np.cos(lon),
                  np.cos(lat) * np.sin(lon),
                  np.sin(lat)], axis=1)                       # (M, 3)

    ev = np.einsum('mk,nwk->mnw', p, t12.reshape(n, 3, 3))    # (M, N, 3)
    inside = (ev <= 0.0).all(axis=2)                          # (M, N)
    for i, b in enumerate(bids):
        c0 = int(pairs[b, 0])
        winners = np.nonzero(inside[i])[0]
        if c0 < 0:
            # only f32 boundary ties may lose a center
            assert winners.size <= 1 or inside[i].sum() <= 2
        else:
            assert c0 in winners, (b, c0, winners)


def test_c1_is_differing_neighbor(scene):
    """c1 differs from c0 wherever set, and is a c0 somewhere nearby."""
    ds_q, stats, tf, q, loc, k_cap, bands, fm = scene
    f_lat, f_lon = (int(v) for v in np.asarray(fm.dims))
    pairs = unpack_table(fm.pairs, 2, f_lat * f_lon)
    c0 = pairs[:, 0].reshape(f_lat, f_lon)
    c1 = pairs[:, 1].reshape(f_lat, f_lon)
    set_ = c1 >= 0
    assert set_.any()
    assert (c1[set_] != c0[set_]).all()
    # every set c1 appears as a c0 in the 3x3 neighborhood (lon wraps)
    for (i, j) in zip(*np.nonzero(set_)):
        nb = c0[max(0, i - 1):i + 2, :][:, [(j - 1) % f_lon, j,
                                            (j + 1) % f_lon]]
        assert c1[i, j] in nb, (i, j)


def test_finemap_render_bit_identical(scene):
    """Quantized-tier render with the fine-map primary == without, bit
    for bit (same refresh cadence; stage-1 hits fill the same column)."""
    ds_q, stats, tf, q, loc, k_cap, bands, fm = scene
    W = H = 24
    cam = Camera()
    cam.set_aspect(W / H)
    cam.view_all(stats.world_bounds_lo, stats.world_bounds_hi)
    lp = make_launch_params(cam.basis(W, H), stats.world_bounds_lo,
                            stats.world_bounds_hi, unit_distance=1e4)
    for samples in (1, 3):
        a1, f1 = render_frame_fast_q(q, loc, k_cap, bands, tf, lp,
                                     *alloc_frame(W, H), width=W, height=H,
                                     samples=samples, chunk=128)
        a2, f2 = render_frame_fast_q(q, loc, k_cap, bands, tf, lp,
                                     *alloc_frame(W, H), width=W, height=H,
                                     samples=samples, chunk=128,
                                     finemap=fm)
        np.testing.assert_array_equal(np.asarray(f2), np.asarray(f1))
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(a1))
        assert (np.asarray(f1) != 0).any()
    # and composed with an explicit compact capacity
    ac, fc = render_frame_fast_q(q, loc, k_cap, bands, tf, lp,
                                 *alloc_frame(W, H), width=W, height=H,
                                 samples=3, chunk=128, finemap=fm,
                                 refresh_compact=32)
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(f1))
