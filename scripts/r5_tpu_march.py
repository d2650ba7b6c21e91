#!/usr/bin/env python
"""Round-5 TPU session: deterministic march (ops/march.py) vs Woodcock.

The march replaces N progressive samples with ONE pass, so the honest
comparison is CONVERGED-IMAGE wall clock (VERDICT r4 next #2b): march
1-pass (+ optional AA passes) vs the Woodcock batched loop at S samples.

Stages (each its own scene build; run with --stage to isolate):
  a  r2b4  f32 closeup 1920x1080   (subdiv 5, 20k cells)
  b  r2b7  f32 closeup             (subdiv 7, 327k cells)
  c  r2b8q quantized closeup       (subdiv 8 on the device-synth path)

Worker safety (README gotchas): march chunks run ONE PER EXECUTION with
host materialization between (no multi-chunk lax.map megacall), so no
single device execution can approach the ~60 s silent crash ceiling.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe():
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    x = np.asarray(jnp.ones((8, 128)) * 2)
    print(f"probe ok ({x.sum():.0f}) {time.time()-t0:.1f}s", flush=True)


def _scene_f32(subdiv, layers):
    from icon_rt_tpu.data import synthetic
    from icon_rt_tpu.models.cells import build_cells, compute_stats
    from icon_rt_tpu.models.locator import build_locator
    from icon_rt_tpu.models.shells import (build_radial_bands,
                                           update_band_majorants)
    from icon_rt_tpu.models.transfunc import make_transfunc
    from icon_rt_tpu.ops.fast import pack_cells

    ds = synthetic.icosphere(subdivisions=subdiv, num_layers=layers)
    stats = compute_stats(ds)
    cells = build_cells(ds)
    locator = build_locator(ds)
    tf = make_transfunc(value_range=tuple(stats.data_range))
    bands = update_band_majorants(build_radial_bands(ds, 64),
                                  tf.values, tf.value_range)
    packed = pack_cells(cells, tf)
    return ds, stats, cells, locator, tf, bands, packed


def _setup_frame(stats, W, H, chunk):
    from icon_rt_tpu.ops.camera import Camera
    from icon_rt_tpu.ops.order import inverse_order, pixel_order
    from icon_rt_tpu.ops.render import make_launch_params

    cam = Camera()
    cam.set_aspect(W / H)
    center = 0.5 * (stats.world_bounds_lo + stats.world_bounds_hi)
    r_out = float(stats.spherical_bounds_hi[0])
    theta = np.arctan(1.15 * np.tan(0.5 * cam.fovy))
    d = r_out / np.sin(theta)
    direction = np.array([2.2, 0.4, 0.9], np.float32)
    direction /= np.linalg.norm(direction)
    cam.set_orientation(center + direction * d, center,
                        np.array([0, 0, 1], np.float32), cam.fovy)
    ud = 10.0 ** (np.floor(np.log10(stats.spherical_bounds_lo[0])) - 3)
    lp = make_launch_params(cam.basis(W, H), stats.world_bounds_lo,
                            stats.world_bounds_hi, unit_distance=ud)
    perm, n_active = pixel_order(lp, stats.spherical_bounds_lo[0],
                                 stats.spherical_bounds_hi[0], W, H)
    inv = inverse_order(perm)
    n_proc = min(W * H, -(-max(n_active, 1) // chunk) * chunk)
    return lp, perm, inv, n_active, n_proc


def _march_sweep(run_chunk, perm, n_proc, W, chunk, label, passes=1):
    """Per-chunk march over the covered prefix, ONE execution per chunk,
    host-materialized.  Returns (wall_s for `passes` passes incl. the
    first pass after warmup, accum rgba in PERMUTED order)."""
    import jax.numpy as jnp
    pix = np.asarray(perm[:n_proc])
    n = n_proc // chunk
    ys, xs = np.divmod(pix.reshape(n, chunk), W)
    # warm (compile) on the first chunk
    out = run_chunk(jnp.asarray(xs[0]), jnp.asarray(ys[0]), 0)
    np.asarray(out[1])
    acc = np.zeros((n_proc, 4), np.float32)
    t0 = time.perf_counter()
    for p in range(passes):
        for i in range(n):
            w, ca = run_chunk(jnp.asarray(xs[i]), jnp.asarray(ys[i]), p)
            ca = np.asarray(ca)
            acc[i * chunk:(i + 1) * chunk] += ca / passes
    dt = time.perf_counter() - t0
    print(f"  march[{label}] {passes} pass(es) x {n} chunks: {dt:.2f}s",
          flush=True)
    return dt, acc


def stage_f32(subdiv, layers, W, H, chunk, S, passes):
    import jax
    import jax.numpy as jnp
    from icon_rt_tpu.ops.fast import render_frame_fast
    from icon_rt_tpu.ops.march import march_rays
    from icon_rt_tpu.ops.render import alloc_frame

    t0 = time.time()
    ds, stats, cells, locator, tf, bands, packed = _scene_f32(subdiv, layers)
    lp, perm, inv, n_active, n_proc = _setup_frame(stats, W, H, chunk)
    perm_d = jnp.asarray(perm)
    print(f"scene subdiv={subdiv}: {ds.num_cells} cells, "
          f"n_active={n_active}, build {time.time()-t0:.1f}s", flush=True)

    # Woodcock converged reference: S in-lane-batched samples
    accum, fb = alloc_frame(W, H)
    step = lambda s, a, f, n: render_frame_fast(
        cells, packed, locator, bands, lp._replace(accum_id=jnp.int32(s)),
        a, f, width=W, height=H, pixel_perm=perm_d, n_active=n_active,
        chunk=chunk, samples=n, refresh_compact=2048)
    accum, fb = step(9000, accum, fb, 1)
    np.asarray(fb)          # warm
    accum, fb = alloc_frame(W, H)
    t0 = time.perf_counter()
    done = 0
    while done < S:
        n = min(32, S - done)     # bounded executions
        accum, fb = step(done, accum, fb, n)
        np.asarray(fb)
        done += n
    dt_wood = time.perf_counter() - t0
    aw = np.asarray(accum)
    print(f"  woodcock {S} samples: {dt_wood:.2f}s "
          f"({W*H*S/dt_wood/1e6:.1f} Mray/s full)", flush=True)

    @jax.jit
    def march_chunk(xs, ys, p):
        return march_rays(cells, packed, locator, bands,
                          lp._replace(accum_id=jnp.int32(p)), xs, ys, W, H)

    dt_m, am = _march_sweep(march_chunk, perm, n_proc, W, chunk,
                            f"f32-s{subdiv}", passes)
    cov = aw[:n_proc, 3] > 0.999
    d = np.abs(am[cov & (am[:n_proc, 3] > 0)]
               - aw[:n_proc][cov & (am[:n_proc, 3] > 0)])
    print(f"  march vs woodcock interior mean|d|: {d.mean():.4f}; "
          f"CONVERGED-IMAGE speedup: {dt_wood / max(dt_m, 1e-9):.1f}x "
          f"(march {passes}-pass {dt_m:.2f}s vs woodcock-{S} "
          f"{dt_wood:.2f}s)", flush=True)


def stage_q(subdiv, layers, W, H, chunk, S, passes, fm_factor=2,
            wood=True, spr=8, generations=3):
    import jax
    import jax.numpy as jnp
    from icon_rt_tpu.data.bigscene import (build_finemap_cached,
                                           build_locator_csr_from_scene,
                                           locator_cache_path,
                                           synth_quantized_cached)
    from icon_rt_tpu.data.device_scene import synth_quantized_device
    from icon_rt_tpu.models.qcells import bake_alpha_q
    from icon_rt_tpu.models.shells import update_band_majorants
    from icon_rt_tpu.models.transfunc import make_transfunc
    from icon_rt_tpu.ops.fastq import render_frame_fast_q
    from icon_rt_tpu.ops.march import march_rays_q
    from icon_rt_tpu.ops.render import alloc_frame

    t0 = time.time()
    dsc = synth_quantized_device(subdiv, layers)
    stats = dsc.stats
    tf = make_transfunc(value_range=tuple(stats.data_range))
    q = bake_alpha_q(dsc.cells, tf)
    bands = update_band_majorants(dsc.bands, tf.values, tf.value_range)
    del dsc
    cache_key = f"s{subdiv}_l{layers}"
    sc = None
    if not os.path.exists(locator_cache_path(cache_key, 1.0)):
        sc = synth_quantized_cached(subdiv, layers)
    loc, k_cap = build_locator_csr_from_scene(sc, cache_key=cache_key)
    del sc
    fm = None
    if fm_factor:
        fm = build_finemap_cached(loc, q.test12, k_cap, factor=fm_factor,
                                  cache_key=cache_key, dims_scale=1.0)
        np.asarray(fm.dims)
    lp, perm, inv, n_active, n_proc = _setup_frame(stats, W, H, chunk)
    perm_d = jnp.asarray(perm)
    print(f"scene q subdiv={subdiv}: n_active={n_active}, k_cap={k_cap}, "
          f"fm={'x%d' % fm_factor if fm is not None else 'none'}, "
          f"build {time.time()-t0:.1f}s", flush=True)

    aw = None
    if wood:
        accum, fb = alloc_frame(W, H)
        step = lambda s, a, f, n: render_frame_fast_q(
            q, loc, k_cap, bands, tf, lp._replace(accum_id=jnp.int32(s)),
            a, f, width=W, height=H, pixel_perm=perm_d, n_active=n_active,
            chunk=chunk, samples=n, refresh_compact=2048, finemap=fm,
            steps_per_refresh=spr)
        accum, fb = step(9000, accum, fb, 1)
        np.asarray(fb)
        accum, fb = alloc_frame(W, H)
        t0 = time.perf_counter()
        done = 0
        while done < S:
            n = min(16, S - done)
            accum, fb = step(done, accum, fb, n)
            np.asarray(fb)
            done += n
        dt_wood = time.perf_counter() - t0
        aw = np.asarray(accum)
        print(f"  woodcock {S} samples: {dt_wood:.2f}s "
              f"({W*H*S/dt_wood/1e6:.1f} Mray/s full)", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnames=("k_", "g_"))
    def _march_chunk(xs, ys, q_, loc_, bands_, tf_, fm_, p, k_, g_):
        # tables as ARGUMENTS: closure capture hoists them as lowering
        # constants (11.7 GB warning at r2b9q) — slow lowering + risk of
        # duplication
        return march_rays_q(q_, loc_, k_, bands_, tf_,
                            lp._replace(accum_id=jnp.int32(p)), xs, ys,
                            W, H, finemap=fm_, generations=g_)

    def march_chunk(xs, ys, p):
        return _march_chunk(xs, ys, q, loc, bands, tf, fm, p, k_=k_cap,
                            g_=generations)

    dt_m, am = _march_sweep(march_chunk, perm, n_proc, W, chunk,
                            f"q-s{subdiv}-g{generations}", passes)
    if aw is not None:
        cov = aw[:n_proc, 3] > 0.999
        sel = cov & (am[:n_proc, 3] > 0)
        d = np.abs(am[sel] - aw[:n_proc][sel])
        print(f"  march vs woodcock interior mean|d|: {d.mean():.4f}; "
              f"CONVERGED-IMAGE speedup: {dt_wood / max(dt_m, 1e-9):.1f}x",
              flush=True)


def stage_ic(W, H, chunk, generations, subdiv=7, layers=16):
    """Reference-format terrain scene (.ic from tools/convert_icon):
    march the quantized tier — the scene class where Woodcock stays
    ~25x slower per ray than synthetic fields (bench ic_r2b7 row)."""
    import jax
    import jax.numpy as jnp
    import functools

    import bench as _b   # repo root is on sys.path (module header)

    from icon_rt_tpu.data.icfile import read_ic
    from icon_rt_tpu.models.cells import compute_stats
    from icon_rt_tpu.models.finemap import build_finemap
    from icon_rt_tpu.models.locator import build_locator_csr, densify_csr
    from icon_rt_tpu.models.qcells import (bake_alpha_q, quantize_cells,
                                           quantize_dataset_values)
    from icon_rt_tpu.models.shells import (build_radial_bands,
                                           update_band_majorants)
    from icon_rt_tpu.models.transfunc import make_transfunc
    from icon_rt_tpu.ops.march import march_rays_q

    t0 = time.time()
    ds = read_ic(_b._ic_file_cached(subdiv, layers))
    ds_q, lo, hi = quantize_dataset_values(ds)
    stats = compute_stats(ds_q)
    mask = np.arange(ds_q.value.shape[1])[None, :] \
        < ds_q.num_layers[:, None]
    vals = ds_q.value[mask]
    vr = (float(np.percentile(vals, 2)), float(np.percentile(vals, 98)))
    tf = make_transfunc(value_range=vr)
    q = bake_alpha_q(quantize_cells(ds_q, value_range=(lo, hi)), tf)
    csr, k_cap = build_locator_csr(ds_q)
    loc = densify_csr(csr, k_cap)
    fm = build_finemap(loc, q.test12, k_cap, factor=2)
    bands = update_band_majorants(build_radial_bands(ds_q, 64),
                                  tf.values, tf.value_range)
    lp, perm, inv, n_active, n_proc = _setup_frame(stats, W, H, chunk)
    print(f"ic scene subdiv={subdiv}: {ds.num_cells} cols, k_cap={k_cap}, "
          f"build {time.time()-t0:.1f}s", flush=True)

    @functools.partial(jax.jit, static_argnames=("k_", "g_"))
    def _mc(xs, ys, q_, loc_, bands_, tf_, fm_, p, k_, g_):
        return march_rays_q(q_, loc_, k_, bands_, tf_,
                            lp._replace(accum_id=jnp.int32(p)), xs, ys,
                            W, H, finemap=fm_, generations=g_)

    def march_chunk(xs, ys, p):
        return _mc(xs, ys, q, loc, bands, tf, fm, p, k_=k_cap,
                   g_=generations)

    dt_m, am = _march_sweep(march_chunk, perm, n_proc, W, chunk,
                            f"ic-s{subdiv}-g{generations}", 1)
    print(f"  ic march converged frame: {dt_m:.2f}s "
          f"({W*H/dt_m/1e6:.2f} converged Mray/s full; the Woodcock ic "
          f"row presents ONE noisy sample every ~11 s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="a",
                    choices=["a", "b", "c", "d", "e", "bc", "cd", "abc"])
    ap.add_argument("--fm", type=int, default=2)
    ap.add_argument("--generations", type=int, default=3)
    ap.add_argument("--no-wood", action="store_true")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--passes", type=int, default=1)
    args = ap.parse_args()

    from icon_rt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    probe()
    # one process for every requested stage: a fresh client connection
    # can pay a multi-minute worker re-init in this environment (round-5
    # session log: 61 s / 347 s / 644 s first-execution walls)
    if "a" in args.stage:
        stage_f32(5, 16, args.width, args.height, args.chunk,
                  args.samples, args.passes)
    if "b" in args.stage:
        stage_f32(7, 16, args.width, args.height, args.chunk,
                  args.samples, args.passes)
    if "c" in args.stage:
        stage_q(8, 16, args.width, args.height, args.chunk,
                min(args.samples, 16), args.passes, fm_factor=args.fm,
                wood=not args.no_wood, generations=args.generations)
    if "d" in args.stage:
        # the headline scale (r2b9q).  Woodcock S=16 here is ~90 s of
        # bounded executions at the round-4 rates; march per-chunk.
        stage_q(11, 16, args.width, args.height, args.chunk,
                min(args.samples, 16), args.passes, fm_factor=args.fm,
                wood=not args.no_wood, spr=10,
                generations=args.generations)
    if "e" in args.stage:
        stage_ic(args.width, args.height, args.chunk, args.generations)


if __name__ == "__main__":
    main()
