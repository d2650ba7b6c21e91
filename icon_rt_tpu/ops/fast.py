"""The fast TPU-native raygen: radial-band Woodcock tracking with
column-resident sampling.

Why this exists.  The reference-parity raygens (ops/traverse.py) replicate
the CUDA control flow, which costs one indexed memory lookup per Woodcock
step (cell location + LUT classify).  On TPU a random per-lane gather is
~20 ns/lane while arithmetic is ~0.5 ns/lane, so the parity paths are
gather-bound.  This raygen is a from-scratch design around that constraint
(SURVEY §7 'hard parts' (b)):

  * SoA scalar layout — every per-ray quantity is its own (L,) array; no
    (L, 3) vectors, no minor-axis reductions, so the VPU runs full-width.
  * Empty-space skipping via RADIAL majorant bands (models/shells.py):
    band crossings are closed-form sphere intersections computed from two
    per-ray scalars; the per-band majorant is a one-hot sum.  Zero memory
    traffic in the traversal.
  * Column-resident sampling: each lane caches its current column's packed
    record (side planes, radial bounds, per-layer heights and PRE-CLASSIFIED
    RGBA).  A Woodcock sample inside the cached column is pure arithmetic
    (plane tests + layer popcount + one-hot select) — classification
    included, because classify(value[layer]) is per-(cell, layer) constant
    for a fixed transfer function and is baked into the record at TF-edit
    time.  Gathers happen only when a lane's sample exits its cached
    column ("refresh"), and all stalled lanes share one batched refresh.
  * Two-phase loop: an outer while iteration performs one batched locator
    refresh, then an inner fori of `steps_per_refresh` gather-free steps.

The estimator is standard delta tracking with a conservative, piecewise-
constant-in-radius majorant: unbiased, so converged images match the
reference-parity modes (verified statistically in tests); per-sample RNG
streams differ by design.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.icfile import MAX_LAYERS
from ..models.cells import Cells
from ..models.locator import Locator
from ..models.shells import RadialBands
from ..models.transfunc import Transfunc, post_classify
from ..utils import color as colorlib
from ..utils.lcg import lcg_init, lcg_next

F32 = jnp.float32


# ===========================================================================
# Packed per-cell records
# ===========================================================================

class PackedCells(NamedTuple):
    """Per-cell data packed into single gather-rows.

    test: (N, 16) f32 — 3 side planes (nx,ny,nz,w)x3, h_bot, h_top,
          float(num_layers), pad.
    prof: (N, 32 + 32*4) f32 — per-layer top heights h[1..32] then the
          CLASSIFIED per-layer RGBA (baked at TF-edit time).
    """
    test: jnp.ndarray
    prof: jnp.ndarray


def pack_test_rows(cells: Cells) -> jnp.ndarray:
    n = cells.num_cells
    rows = jnp.zeros((n, 16), F32)
    rows = rows.at[:, 0:12].set(cells.planes.reshape(n, 12))
    rows = rows.at[:, 12].set(cells.h_bot)
    rows = rows.at[:, 13].set(cells.h_top)
    rows = rows.at[:, 14].set(cells.num_layers.astype(F32))
    return rows


@jax.jit
def pack_profile_rows(cells: Cells, tf: Transfunc) -> jnp.ndarray:
    """Bake heights + classified per-layer RGBA.  Re-run on TF edits (the
    fast-path analog of the reference's computeMaxOpacities TF-edit hook,
    ref: hostCode.cu:878-909)."""
    n = cells.num_cells
    # h[1..32]: the layer-k ceiling; entries past num_layers never match
    heights_hi = jnp.concatenate(
        [cells.height[:, 1:], cells.height[:, -1:]], axis=1)  # (N, 32)
    k = jnp.arange(1, MAX_LAYERS + 1)
    valid = k[None, :] <= cells.num_layers[:, None]
    heights_hi = jnp.where(valid, heights_hi, jnp.float32(np.inf))
    rgba = jax.vmap(jax.vmap(lambda v: post_classify(tf, v)))(cells.value)  # (N,32,4)
    return jnp.concatenate([heights_hi, rgba.reshape(n, MAX_LAYERS * 4)], axis=1)


def pack_cells(cells: Cells, tf: Transfunc) -> PackedCells:
    return PackedCells(test=pack_test_rows(cells),
                       prof=pack_profile_rows(cells, tf))


# ===========================================================================
# The render kernel
# ===========================================================================

class _State(NamedTuple):
    # woodcock / traversal (all (L,))
    t: jnp.ndarray          # current parameter
    seg_end: jnp.ndarray    # current band segment exit
    seg_hi: jnp.ndarray     # current shell segment end
    band: jnp.ndarray       # i32 current band
    m: jnp.ndarray          # current majorant
    si: jnp.ndarray         # i32 shell segment index (0 or 1)
    # pending sample
    pending: jnp.ndarray    # bool: sample at t awaits the outer refresh
    # cached column
    c_test: jnp.ndarray     # (L, 16) packed test row
    c_prof: jnp.ndarray     # (L, 160) packed profile row
    c_hit: jnp.ndarray      # bool: refresh found the point's column
    c_hit_pending: jnp.ndarray  # bool: lane is in EVAL phase
    c_valid: jnp.ndarray    # bool: cache holds some real column
    # rng + output
    rng: jnp.ndarray
    cr: jnp.ndarray
    cg: jnp.ndarray
    cb: jnp.ndarray
    alpha: jnp.ndarray
    done: jnp.ndarray
    it: jnp.ndarray         # i32 outer iteration counter


def _point_in_test_row(row, px, py, pz, r):
    """Radial + 3 side-plane containment from a packed test row."""
    ev1 = row[:, 0] * px + row[:, 1] * py + row[:, 2] * pz - row[:, 3]
    ev2 = row[:, 4] * px + row[:, 5] * py + row[:, 6] * pz - row[:, 7]
    ev3 = row[:, 8] * px + row[:, 9] * py + row[:, 10] * pz - row[:, 11]
    return ((r >= row[:, 12]) & (r <= row[:, 13])
            & (ev1 <= 0.0) & (ev2 <= 0.0) & (ev3 <= 0.0))


def _classified_at(prof, r):
    """Layer lookup + classified RGBA from a cached profile row.
    prof: (L, 160); returns (rr, gg, bb, aa) each (L,)."""
    heights_hi = prof[:, :MAX_LAYERS]                    # (L, 32), inf-padded
    layer_oh = jnp.cumsum(
        (r[:, None] <= heights_hi).astype(F32), axis=1)
    layer_oh = (layer_oh == 1.0) & (r[:, None] <= heights_hi)  # first match
    oh = layer_oh.astype(F32)
    rgba = prof[:, MAX_LAYERS:].reshape(-1, MAX_LAYERS, 4)
    rr = jnp.sum(oh * rgba[:, :, 0], axis=1)
    gg = jnp.sum(oh * rgba[:, :, 1], axis=1)
    bb = jnp.sum(oh * rgba[:, :, 2], axis=1)
    aa = jnp.sum(oh * rgba[:, :, 3], axis=1)
    return rr, gg, bb, aa


def render_fast(cells: Cells, packed: PackedCells, loc: Locator,
                bands: RadialBands, lp, xs, ys, width: int, height: int,
                steps_per_refresh: int = 16, max_outer: int = 4096):
    """One progressive sample for a batch of pixels.

    lp: ops.render.LaunchParams.  xs, ys: (L,) i32 pixel coords.
    Returns (wrote (L,) bool, color_alpha (L, 4) f32).
    """
    L = xs.shape[0]
    nb = bands.num_bands
    edges = bands.edges                      # (B+1,)
    majors = bands.max_opacities             # (B,)
    r_in = edges[0]
    r_out = edges[-1]

    ox, oy, oz = lp.cam_org[0], lp.cam_org[1], lp.cam_org[2]
    oo = ox * ox + oy * oy + oz * oz         # scalar

    # --- raygen (SoA), ref: deviceCode.cu:36-49 semantics -----------------
    seed0 = (lp.accum_id.astype(jnp.uint32) * jnp.uint32(width * height)
             + xs.astype(jnp.uint32))
    rng = lcg_init(seed0, ys.astype(jnp.uint32))
    rng, jx = lcg_next(rng)
    rng, jy = lcg_next(rng)
    u = xs.astype(F32) + 0.5 + jx
    v = ys.astype(F32) + 0.5 + jy
    dx = lp.cam_dir00[0] + u * lp.cam_du[0] + v * lp.cam_dv[0]
    dy = lp.cam_dir00[1] + u * lp.cam_du[1] + v * lp.cam_dv[1]
    dz = lp.cam_dir00[2] + u * lp.cam_du[2] + v * lp.cam_dv[2]
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv, dy * inv, dz * inv
    dx = jnp.where(jnp.abs(dx) < 1e-5, F32(1e-5), dx)
    dy = jnp.where(jnp.abs(dy) < 1e-5, F32(1e-5), dy)
    dz = jnp.where(jnp.abs(dz) < 1e-5, F32(1e-5), dz)

    od = ox * dx + oy * dy + oz * dz         # (L,)

    def sphere_ts(radius):
        disc = od * od - oo + radius * radius
        hit = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return hit, -od - sq, -od + sq

    hit_o, to0, to1 = sphere_ts(r_out)
    hit_i, ti0, ti1 = sphere_ts(r_in)

    # shell segments, clamped to t >= 0
    outer_only = hit_o & ~hit_i
    s0_lo = jnp.where(outer_only, to0, to0)
    s0_hi = jnp.where(outer_only, to1, ti0)
    s1_lo = jnp.where(outer_only, F32(np.inf), ti1)
    s1_hi = jnp.where(outer_only, -F32(np.inf), to1)
    s0_lo = jnp.maximum(s0_lo, 0.0)
    s1_lo = jnp.maximum(s1_lo, 0.0)
    wrote = hit_o & (to1 > 0.0)
    # degenerate first segment (camera inside inner sphere): skip to second
    s0_bad = s0_hi <= s0_lo
    seg_lo = jnp.where(s0_bad, s1_lo, s0_lo)
    seg_hi = jnp.where(s0_bad, s1_hi, s0_hi)
    si0 = jnp.where(s0_bad, 1, 0).astype(jnp.int32)

    r_of = lambda t: jnp.sqrt(jnp.maximum(oo + 2.0 * t * od + t * t, 1e-30))

    def band_of(r):
        return jnp.clip(
            jnp.sum((edges[None, :] < r[:, None]).astype(jnp.int32), axis=1) - 1,
            0, nb - 1)

    def select_band(arr, b):
        """One-hot select arr[b] without a gather; arr (B,) or (B+1,)."""
        oh = (jnp.arange(arr.shape[0])[None, :] == b[:, None]).astype(F32)
        return jnp.sum(oh * arr[None, :], axis=1)

    def band_exit(t, b, shi):
        """Closed-form t where the ray leaves band b, capped at shi."""
        t_star = -od
        r_lo_b = select_band(edges, b)
        r_hi_b = select_band(edges, b + 1)
        disc_in = od * od - oo + r_lo_b * r_lo_b
        t_in = -od - jnp.sqrt(jnp.maximum(disc_in, 0.0))
        disc_out = od * od - oo + r_hi_b * r_hi_b
        t_out = -od + jnp.sqrt(jnp.maximum(disc_out, 0.0))
        inward = t < t_star
        use_in = inward & (disc_in > 0.0) & (t_in > t)
        return jnp.minimum(jnp.where(use_in, t_in, t_out), shi), use_in

    band0 = band_of(r_of(seg_lo))
    seg_end0, _ = band_exit(seg_lo, band0, seg_hi)
    m0 = select_band(majors, band0)

    ud = lp.unit_distance

    def inner_step(s: _State):
        """One iteration of the gather-free phase.

        Lane lifecycle per Woodcock sample:
          STEP  — draw the flight distance; overshoot -> band/segment
                  advance; otherwise the sample point needs (hit, rgba):
                  in cached column -> evaluate now; else park as `pending`
                  (the outer refresh resolves it) and resume in EVAL.
          EVAL  — the refresh placed the point's column (or a miss flag,
                  ~c_hit) in the cache; evaluate, then back to STEP.
        Evaluation draws the acceptance uniform only when the point is
        inside the volume — same draw discipline as the reference
        (ref: deviceCode.cu:160-183).
        """
        active = (~s.done) & (~s.pending)
        in_eval = active & s.c_hit_pending          # EVAL phase
        in_step = active & ~s.c_hit_pending         # STEP phase

        # -- STEP: one tentative collision ---------------------------------
        has_m = s.m > 0.0
        rng1, xi = lcg_next(s.rng)
        stepped = in_step & has_m
        t_new = jnp.where(stepped, s.t - jnp.log(1.0 - xi) / (s.m / ud), s.t)
        rng_a = jnp.where(stepped, rng1, s.rng)
        overshoot = stepped & (t_new > s.seg_end)

        # -- band / segment advance -----------------------------------------
        adv = in_step & (overshoot | ~has_m)
        t_adv = s.seg_end
        at_seg_end = t_adv >= s.seg_hi
        _, was_in = band_exit(s.t, s.band, s.seg_hi)
        band_n = s.band + jnp.where(was_in, -1, 1)
        to_seg1 = at_seg_end & (s.si == 0) & (s1_hi > s1_lo)
        t_adv = jnp.where(to_seg1, s1_lo, t_adv)
        band_n = jnp.where(to_seg1, band_of(r_of(t_adv)), band_n)
        shi_n = jnp.where(to_seg1, s1_hi, s.seg_hi)
        exhausted = at_seg_end & ~to_seg1
        band_n = jnp.clip(band_n, 0, nb - 1)
        seg_end_n, _ = band_exit(t_adv, band_n, shi_n)
        m_n = select_band(majors, band_n)

        # -- sample classification ------------------------------------------
        samp_new = stepped & ~overshoot
        px = ox + dx * t_new
        py = oy + dy * t_new
        pz = oz + dz * t_new
        r = r_of(t_new)
        in_cache = samp_new & s.c_valid & _point_in_test_row(s.c_test, px, py, pz, r)
        to_pending = samp_new & ~in_cache
        hit_vol = in_cache | (in_eval & s.c_hit)     # point is inside the volume
        eval_miss = in_eval & ~s.c_hit
        rr, gg, bb, aa = _classified_at(s.c_prof, r)
        rng2, uu = lcg_next(rng_a)
        rng_b = jnp.where(hit_vol, rng2, rng_a)
        accept = hit_vol & (aa >= uu * s.m)

        done_n = s.done | (adv & exhausted) | accept
        del eval_miss  # miss lanes simply fall back to STEP below
        return _State(
            t=jnp.where(adv, t_adv, t_new),
            seg_end=jnp.where(adv, seg_end_n, s.seg_end),
            seg_hi=jnp.where(to_seg1, shi_n, s.seg_hi),
            band=jnp.where(adv, band_n, s.band),
            m=jnp.where(adv, m_n, s.m),
            si=jnp.where(to_seg1, 1, s.si).astype(jnp.int32),
            pending=s.pending | to_pending,
            c_test=s.c_test, c_prof=s.c_prof,
            c_hit=jnp.where(in_eval, False, s.c_hit),
            c_hit_pending=jnp.where(in_eval, False,
                                    jnp.where(to_pending, True, s.c_hit_pending)),
            c_valid=s.c_valid,
            rng=rng_b,
            cr=jnp.where(accept, rr, s.cr),
            cg=jnp.where(accept, gg, s.cg),
            cb=jnp.where(accept, bb, s.cb),
            alpha=jnp.where(accept, jnp.where(aa > 0.0, 1.0, 0.0), s.alpha),
            done=done_n, it=s.it,
        )

    n_lat = loc.dims[0]
    n_lon = loc.dims[1]

    def refresh(s: _State):
        """Batched locator query for pending lanes; refreshes caches."""
        px = ox + dx * s.t
        py = oy + dy * s.t
        pz = oz + dz * s.t
        r = r_of(s.t)
        lat = jnp.arcsin(jnp.clip(pz / r, -1.0, 1.0))
        lon = jnp.arctan2(py, px)
        bl = jnp.clip(((lat - loc.lat_lo) / (loc.lat_hi - loc.lat_lo)
                       * n_lat.astype(F32)).astype(jnp.int32), 0, n_lat - 1)
        bo = jnp.clip(((lon - loc.lon_lo) / (loc.lon_hi - loc.lon_lo)
                       * n_lon.astype(F32)).astype(jnp.int32), 0, n_lon - 1)
        bid = jnp.where(s.pending, bl * n_lon + bo, 0)
        cand = loc.bins[bid]                             # (L, K) gather
        valid = cand >= 0
        safe = jnp.maximum(cand, 0)
        trows = packed.test[safe]                        # (L, K, 16) gather
        ev1 = (trows[..., 0] * px[:, None] + trows[..., 1] * py[:, None]
               + trows[..., 2] * pz[:, None] - trows[..., 3])
        ev2 = (trows[..., 4] * px[:, None] + trows[..., 5] * py[:, None]
               + trows[..., 6] * pz[:, None] - trows[..., 7])
        ev3 = (trows[..., 8] * px[:, None] + trows[..., 9] * py[:, None]
               + trows[..., 10] * pz[:, None] - trows[..., 11])
        inside = (valid & (r[:, None] >= trows[..., 12])
                  & (r[:, None] <= trows[..., 13])
                  & (ev1 <= 0.0) & (ev2 <= 0.0) & (ev3 <= 0.0))
        hit = jnp.any(inside, axis=1)
        slot = jnp.argmax(inside, axis=1)
        k_oh = (jnp.arange(cand.shape[1])[None, :] == slot[:, None])
        cid = jnp.sum(jnp.where(k_oh, safe, 0), axis=1)
        new_test = jnp.sum(jnp.where(k_oh[..., None], trows, 0.0), axis=1)
        prow = packed.prof[jnp.where(s.pending & hit, cid, 0)]  # (L, 160)

        upd_hit = s.pending & hit
        return s._replace(
            pending=jnp.zeros_like(s.pending),
            c_test=jnp.where(upd_hit[:, None], new_test, s.c_test),
            c_prof=jnp.where(upd_hit[:, None], prow, s.c_prof),
            c_hit=upd_hit,
            c_valid=s.c_valid | upd_hit,
        )

    def outer_cond(s: _State):
        return jnp.any(~s.done) & (s.it < max_outer)

    def outer_body(s: _State):
        s = jax.lax.cond(jnp.any(s.pending), refresh, lambda x: x, s)
        s = jax.lax.fori_loop(0, steps_per_refresh,
                              lambda i, st: inner_step(st), s)
        return s._replace(it=s.it + 1)

    init = _State(
        t=seg_lo, seg_end=seg_end0, seg_hi=seg_hi, band=band0, m=m0, si=si0,
        pending=jnp.zeros(L, bool),
        c_test=jnp.zeros((L, 16), F32),
        c_prof=jnp.full((L, MAX_LAYERS * 5), jnp.float32(np.inf), F32),
        c_hit=jnp.zeros(L, bool),
        c_hit_pending=jnp.zeros(L, bool),
        c_valid=jnp.zeros(L, bool),
        rng=rng,
        cr=jnp.zeros(L, F32), cg=jnp.zeros(L, F32), cb=jnp.zeros(L, F32),
        alpha=jnp.zeros(L, F32),
        done=~(wrote & (seg_hi > seg_lo)),
        it=jnp.int32(0),
    )
    out = jax.lax.while_loop(outer_cond, outer_body, init)

    amb_r = lp.ambient_color[0] * lp.ambient_radiance
    amb_g = lp.ambient_color[1] * lp.ambient_radiance
    amb_b = lp.ambient_color[2] * lp.ambient_radiance
    color_alpha = jnp.stack(
        [out.cr * amb_r, out.cg * amb_g, out.cb * amb_b, out.alpha], axis=-1)
    return wrote, color_alpha


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "steps_per_refresh",
                                    "chunk"),
                   donate_argnames=("accum", "fb"))
def render_frame_fast(cells: Cells, packed: PackedCells, loc: Locator,
                      bands: RadialBands, lp, accum, fb, *,
                      width: int, height: int, steps_per_refresh: int = 16,
                      chunk: int = 64 * 1024, pixel_perm=None):
    """Full-frame progressive step on the fast path (drop-in peer of
    render_frame_ae / render_frame_accel).

    pixel_perm: optional (H*W,) i32 permutation (ops/order.pixel_order);
    when given, lane i renders pixel pixel_perm[i] and accum/fb are in
    PERMUTED order — unpermute with perm at present time.  Sorting by ray
    cost raises wavefront lane utilization several-fold.
    """
    from .render import _finalize  # local import to avoid cycle

    total = width * height
    pix = jnp.arange(total, dtype=jnp.int32)
    if pixel_perm is not None:
        pix = pixel_perm
    ys_all, xs_all = jnp.divmod(pix, width)

    def run(xs, ys):
        return render_fast(cells, packed, loc, bands, lp, xs, ys,
                           width, height, steps_per_refresh)

    if total <= chunk:
        wrote, ca = run(xs_all, ys_all)
    else:
        n = -(-total // chunk)
        pad = n * chunk - total
        if pad:
            xs_all = jnp.concatenate([xs_all, jnp.zeros(pad, jnp.int32)])
            ys_all = jnp.concatenate([ys_all, jnp.zeros(pad, jnp.int32)])
        wrote, ca = jax.lax.map(
            lambda c: run(c[0], c[1]),
            (xs_all.reshape(n, chunk), ys_all.reshape(n, chunk)))
        wrote = wrote.reshape(-1)[:total]
        ca = ca.reshape(-1, 4)[:total]
    return _finalize(wrote, ca, accum, fb, lp.accum_id)
