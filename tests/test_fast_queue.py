"""Persistent-queue renderer: bit-identical to the chunked renderer.

Refills happen only at outer-iteration boundaries, so a pixel's
refresh/step cadence (hence its RNG draw sequence) is identical in both
schedulers; only the scheduling differs.  Every assertion here is exact.
"""
import numpy as np
import jax.numpy as jnp

from icon_rt_tpu.data import synthetic
from icon_rt_tpu.models.cells import build_cells, compute_stats
from icon_rt_tpu.models.locator import build_locator
from icon_rt_tpu.models.shells import build_radial_bands, update_band_majorants
from icon_rt_tpu.models.transfunc import make_transfunc
from icon_rt_tpu.ops.camera import Camera
from icon_rt_tpu.ops.fast import (pack_cells, render_frame_fast,
                                  render_frame_fast_queue)
from icon_rt_tpu.ops.order import inverse_order, pixel_order
from icon_rt_tpu.ops.render import alloc_frame, make_launch_params


def _scene(subdivisions=2, num_layers=3):
    ds = synthetic.icosphere(subdivisions=subdivisions, num_layers=num_layers)
    stats = compute_stats(ds)
    cells = build_cells(ds)
    loc = build_locator(ds)
    tf = make_transfunc(value_range=tuple(stats.data_range), size=32)
    bands = update_band_majorants(build_radial_bands(ds, 16),
                                  tf.values, tf.value_range)
    packed = pack_cells(cells, tf)
    return ds, stats, cells, loc, tf, bands, packed


def _camera(stats, W, H, dist=2.2):
    cam = Camera()
    cam.set_aspect(W / H)
    center = 0.5 * (stats.world_bounds_lo + stats.world_bounds_hi)
    r = float(stats.spherical_bounds_hi[0])
    cam.set_orientation(center + np.array([dist * r, 0.4 * r, 0.9 * r],
                                          np.float32),
                        center, np.array([0, 0, 1], np.float32), cam.fovy)
    return cam


def _run_both(W, H, lanes, spr, use_perm=True, samples=2, dist=2.2):
    ds, stats, cells, loc, tf, bands, packed = _scene()
    cam = _camera(stats, W, H, dist)
    lp0 = make_launch_params(cam.basis(W, H), stats.world_bounds_lo,
                             stats.world_bounds_hi, unit_distance=20.0)
    if use_perm:
        perm, n_active = pixel_order(lp0, stats.spherical_bounds_lo[0],
                                     stats.spherical_bounds_hi[0], W, H)
        inv = inverse_order(perm)
        permj = jnp.asarray(perm)
    else:
        perm = inv = permj = None
        n_active = None

    a_c, f_c = alloc_frame(W, H)
    a_q, f_q = alloc_frame(W, H)
    for s in range(samples):
        lp = lp0._replace(accum_id=jnp.int32(s))
        a_c, f_c = render_frame_fast(cells, packed, loc, bands, lp, a_c, f_c,
                                     width=W, height=H, chunk=512,
                                     steps_per_refresh=spr,
                                     pixel_perm=permj, n_active=n_active)
        a_q, f_q = render_frame_fast_queue(cells, packed, loc, bands, lp,
                                           a_q, f_q, width=W, height=H,
                                           lanes=lanes, steps_per_refresh=spr,
                                           pixel_perm=permj,
                                           n_active=n_active)
    a_c, f_c = np.asarray(a_c), np.asarray(f_c)
    if use_perm:   # chunked output lives in permuted order
        a_c, f_c = a_c[inv], f_c[inv]
    return a_c, f_c, np.asarray(a_q), np.asarray(f_q)


def test_queue_matches_chunked_sorted():
    a_c, f_c, a_q, f_q = _run_both(32, 24, lanes=256, spr=4)
    np.testing.assert_array_equal(f_c, f_q)
    np.testing.assert_array_equal(a_c, a_q)


def test_queue_matches_chunked_unsorted_full_frame():
    a_c, f_c, a_q, f_q = _run_both(16, 16, lanes=64, spr=8, use_perm=False)
    np.testing.assert_array_equal(f_c, f_q)
    np.testing.assert_array_equal(a_c, a_q)


def test_queue_lanes_exceed_queue():
    """More lanes than queued pixels (tiny scenes / final frames)."""
    a_c, f_c, a_q, f_q = _run_both(8, 8, lanes=4096, spr=4, use_perm=False,
                                   samples=1)
    np.testing.assert_array_equal(f_c, f_q)


def test_queue_empty_coverage():
    """Camera pointing away: n_active == 0 must terminate and write nothing."""
    ds, stats, cells, loc, tf, bands, packed = _scene()
    W = H = 8
    cam = _camera(stats, W, H)
    lp = make_launch_params(cam.basis(W, H), stats.world_bounds_lo,
                            stats.world_bounds_hi, unit_distance=20.0)
    perm = jnp.arange(W * H, dtype=jnp.int32)
    a, f = render_frame_fast_queue(cells, packed, loc, bands, lp,
                                   *alloc_frame(W, H), width=W, height=H,
                                   lanes=64, pixel_perm=perm, n_active=0)
    assert (np.asarray(f) == 0).all()
    assert (np.asarray(a) == 0).all()
