#!/usr/bin/env python
"""Round-3 profiling harness: where does the r2b9q frame go?

VERDICT round 2 item 1: profile one r2b9q outer iteration end-to-end
before touching anything.  This script decomposes the quantized-tier
render into its three structural costs and prints one line per probe:

  * refresh   — the batched locator query + dequantizing cache fill
                (_refresh_q) with ALL lanes pending (worst case) and with
                the measured pending fraction
  * steps     — the gather-free inner phase (spr unrolled step_core)
  * outer     — one full outer iteration (cond + service + steps)
  * loop      — the full while_loop for one chunk of real rays
  * stats     — per-ray outer iterations / refresh events / steps, from an
                instrumented copy of the loop (counters only; same math)
  * gather    — raw row-gather cost at THIS scene's table sizes
                (tests the 20 ns/row rule of thumb at 8 GB tables)

Scale is selectable (--subdiv) so R2B4-vs-R2B9 cost scaling is measurable
on the same code path.  Timings materialize outputs to the host
(np.asarray) per the README gotcha: a crashed TPU worker otherwise
returns instantly.

Usage:  python scripts/prof_fastq.py --subdiv 11 [--chunk 8192] [--spr 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icon_rt_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

WIDTH, HEIGHT = 1920, 1080


def _print_hbm(tag: str):
    """Device-memory snapshot (supported backends only) — the r2b9q OOM
    hunts need the real resident number, not an accounting estimate."""
    try:
        ms = jax.local_devices()[0].memory_stats()
        print(f"# hbm[{tag}]: in_use {ms['bytes_in_use'] / 2**30:.2f} GB, "
              f"peak {ms.get('peak_bytes_in_use', 0) / 2**30:.2f} GB, "
              f"limit {ms.get('bytes_limit', 0) / 2**30:.2f} GB",
              flush=True)
    except Exception as e:
        print(f"# hbm[{tag}]: unavailable ({type(e).__name__})", flush=True)


def timeit(fn, *args, iters=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    # materialize to host: block_until_ready is silent on a wedged worker
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def timeit_inner(body, carry0, reps=64, iters=3, tables=()):
    """Time `body` REPEATED reps times INSIDE one jitted execution (a
    fori_loop threading a carry) — per-dispatch overhead through the axon
    relay measured ~3-4 ms, which swamps single-call microbenches.  Returns
    seconds per body application (fixed per-execution cost subtracted via a
    second run at reps//4; the trip count is an ARGUMENT so both runs share
    one compile — remote compiles cost minutes at R2B9 shapes).

    tables: pytree of device arrays the body reads — passed as jit
    ARGUMENTS (body receives it as its third argument).  Closing over
    them instead captures them as lowering CONSTANTS (jax warns at
    10.7 GB captured at R2B9) and poisons the compile."""
    f = jax.jit(lambda c, n, tb: jax.lax.fori_loop(
        0, n, lambda i, c: body(i, c, tb), c))

    def run(reps_):
        n = jnp.int32(reps_)
        jax.block_until_ready(f(carry0, n, tables))  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(carry0, n, tables)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    lo = max(reps // 4, 1)
    t_hi, t_lo = run(reps), run(lo)
    return (t_hi - t_lo) / (reps - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=11)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--spr", type=int, default=8)
    ap.add_argument("--probes", default="gather,refresh,steps,outer,loop,stats")
    ap.add_argument("--finemap", type=int, default=0,
                    help="fine-map factor (0 = off); adds the two-stage "
                         "primary to the loop probes and enables the "
                         "fine/hitrate probes")
    ap.add_argument("--spp", type=int, default=64,
                    help="in-lane samples for the batch probe")
    ap.add_argument("--compact", type=int, default=2048)
    ap.add_argument("--service-cap", type=int, default=-1,
                    help="flat-service capacity for the batch probes "
                         "(-1 auto = chunk/2; 0 = legacy cond ladder)")
    ap.add_argument("--loc-scale", type=float, default=None,
                    help="locator grid side scale (default 0.5 at "
                         "subdiv >= 10 else 1.0; see bigscene."
                         "build_locator_csr_from_scene)")
    ap.add_argument("--sweep", default="8:1:64,16:1:64,32:1:64,64:1:64",
                    help="spr:unroll:spp[:service_cap[:lanes]] configs for "
                         "the sweep probe (cap/lanes default to "
                         "--service-cap/--chunk)")
    args = ap.parse_args()
    L = args.chunk
    probes = args.probes.split(",")

    import os as _os

    from icon_rt_tpu.data.bigscene import (build_locator_csr_from_scene,
                                           locator_cache_path,
                                           synth_quantized_cached)
    from icon_rt_tpu.data.device_scene import synth_quantized_device
    from icon_rt_tpu.models.qcells import bake_alpha_q
    from icon_rt_tpu.models.shells import update_band_majorants
    from icon_rt_tpu.models.transfunc import make_transfunc
    from icon_rt_tpu.ops.camera import Camera
    from icon_rt_tpu.ops.fast import _init_lanes, step_core
    from icon_rt_tpu.ops.fastq import _refresh_q
    from icon_rt_tpu.ops.order import pixel_order
    from icon_rt_tpu.ops.render import make_launch_params

    # device-side synthesis (seconds of TPU compute) like bench_row_q; the
    # 10.7 GB host scene is loaded/uploaded only if the locator binning npz
    # is missing (binning needs host lat/lon)
    t0 = time.time()
    dsc = synth_quantized_device(args.subdiv, args.layers)
    tf = make_transfunc(value_range=tuple(dsc.stats.data_range))
    q = bake_alpha_q(dsc.cells, tf)
    bands = update_band_majorants(dsc.bands, tf.values, tf.value_range)
    stats = dsc.stats
    del dsc   # frees the pre-bake zeros alpha_q (1.34 GB at R2B9)
    print(f"# tables on device {time.time()-t0:.0f}s", flush=True)
    cache_key = f"s{args.subdiv}_l{args.layers}"
    loc_scale = args.loc_scale if args.loc_scale is not None else (
        0.5 if args.subdiv >= 10 else 1.0)
    sc = None
    if not _os.path.exists(locator_cache_path(cache_key, loc_scale)):
        sc = synth_quantized_cached(args.subdiv, args.layers)
        print(f"# host scene for binning {time.time()-t0:.0f}s", flush=True)
    loc, k_cap = build_locator_csr_from_scene(sc, cache_key=cache_key,
                                              dims_scale=loc_scale)
    del sc
    print(f"# locator on device {time.time()-t0:.0f}s", flush=True)
    _print_hbm("post-locator")
    num_cells = 20 * 4 ** args.subdiv
    print(f"# scene: {num_cells} cells, lm={q.lm}, k_cap={k_cap}, "
          f"bins={np.prod(np.asarray(loc.dims))} "
          f"({'x'.join(str(int(d)) for d in np.asarray(loc.dims))})",
          flush=True)

    cam = Camera()
    cam.set_aspect(WIDTH / HEIGHT)
    center = 0.5 * (stats.world_bounds_lo + stats.world_bounds_hi)
    r_out = float(stats.spherical_bounds_hi[0])
    theta = np.arctan(1.15 * np.tan(0.5 * cam.fovy))
    d = r_out / np.sin(theta)
    direction = np.array([2.2, 0.4, 0.9], np.float32)
    direction /= np.linalg.norm(direction)
    cam.set_orientation(center + direction * d, center,
                        np.array([0, 0, 1], np.float32), cam.fovy)
    unit_distance = 10.0 ** (np.floor(
        np.log10(stats.spherical_bounds_lo[0])) - 3)
    lp = make_launch_params(cam.basis(WIDTH, HEIGHT), stats.world_bounds_lo,
                            stats.world_bounds_hi,
                            unit_distance=unit_distance)
    perm, n_active = pixel_order(lp, stats.spherical_bounds_lo[0],
                                 stats.spherical_bounds_hi[0], WIDTH, HEIGHT)

    nb = bands.num_bands
    edges = bands.edges
    majors = bands.max_opacities
    lm = q.lm
    ox, oy, oz = lp.cam_org[0], lp.cam_org[1], lp.cam_org[2]
    oo = ox * ox + oy * oy + oz * oz
    org = (ox, oy, oz)
    ud = lp.unit_distance

    # lanes = a middle slice of the cost-sorted covered prefix (real rays)
    pix = jnp.asarray(perm[n_active // 4: n_active // 4 + L])
    ys, xs = jnp.divmod(pix, WIDTH)

    def init():
        return _init_lanes(lp, xs, ys, WIDTH, HEIGHT, edges, majors, oo, nb,
                           prof_w=3 * lm)

    s0, consts, wrote = init()

    if "gather" in probes:
        # raw row-gather cost at this scene's table sizes, measured
        # in-execution (per-dispatch relay overhead subtracted)
        key = jax.random.PRNGKey(0)
        idx = jax.random.randint(key, (L,), 0, q.num_cells)
        idx2 = jax.random.randint(key, (L, k_cap), 0, q.num_cells)
        n_bins = int(np.prod(np.asarray(loc.dims)))
        bid = jax.random.randint(key, (L,), 0, n_bins)

        def g_body(base, n):
            def body(i, c, tb):
                ix = (base + i * 1000003) % n
                return c + jnp.sum(tb[ix].astype(jnp.float32))
            return body

        t = timeit_inner(g_body(idx, q.num_cells), jnp.float32(0),
                         tables=q.test12)
        print(f"gather  test12 (L,12) rows:    {t/L*1e9:8.1f} ns/row",
              flush=True)
        t = timeit_inner(g_body(bid, n_bins), jnp.float32(0),
                         tables=loc.bins)
        print(f"gather  bins (L,{k_cap}) rows:      {t/L*1e9:8.1f} ns/row",
              flush=True)
        t = timeit_inner(g_body(idx2, q.num_cells), jnp.float32(0),
                         tables=q.test12)
        print(f"gather  test12 (L,{k_cap},12) rows: {t/(L*k_cap)*1e9:8.1f} "
              f"ns/row", flush=True)
        t = timeit_inner(g_body(idx, q.num_cells), jnp.float32(0),
                         tables=q.alpha_q)
        print(f"gather  alpha u8 (L,{lm}) rows:  {t/L*1e9:8.1f} ns/row",
              flush=True)

    fm = None
    if args.finemap:
        from icon_rt_tpu.data.bigscene import build_finemap_cached
        tb = time.time()
        fm = build_finemap_cached(loc, q.test12, k_cap, factor=args.finemap,
                                  cache_key=cache_key, dims_scale=loc_scale)
        jax.block_until_ready(fm.pairs)
        n_fine = int(np.asarray(fm.dims[0])) * int(np.asarray(fm.dims[1]))
        # map stats via a cheap device reduction (pairs is pack-32); a
        # (n_fine, K) reshape COPY of the 2.7 GB R2B9 map would OOM next
        # to the scene, so reduce over the packed rows directly (padding
        # rows are -1-filled and dilute the ratio by < 32/n_fine)
        from icon_rt_tpu.models.finemap import K_CAND

        @jax.jit
        def _fill(p):  # fused reduces: no (n_fine, K) copy, no f32 temp
            cols = jnp.arange(p.shape[1]) % K_CAND
            return jnp.stack([
                jnp.mean(jnp.where(cols[None, :] == k, p != 255,
                                   False).astype(jnp.float32)) * K_CAND
                for k in range(K_CAND)])

        fill = np.asarray(_fill(fm.pairs))
        print(f"# finemap x{args.finemap}: {n_fine} bins, slot fill "
              f"{' '.join(f'{f:.3f}' for f in fill)}, "
              f"built {time.time()-tb:.0f}s", flush=True)
        _print_hbm("post-finemap")

    # step length scale: vary sample t per rep so refreshes hit fresh bins
    dt_seg = float(np.asarray(bands.edges[-1] - bands.edges[0])) / 64.0

    if "refresh" in probes:
        def body(i, s, tb):
            loc_, q_ = tb
            s = s._replace(pending=jnp.ones(L, jnp.int32),
                           t=s0.t + (i % 64).astype(jnp.float32) * dt_seg)
            return _refresh_q(s, consts, loc_, q_, k_cap, org, oo)

        t = timeit_inner(body, s0, reps=64, tables=(loc, q))
        print(f"refresh all-pending:           {t*1e6:9.1f} us "
              f"({t/L*1e9:6.1f} ns/lane)", flush=True)

    if "fine" in probes and fm is not None:
        from icon_rt_tpu.ops.fastq import _locate_q_fine

        def fbody(i, s, tb):
            fm_, q_ = tb
            tt = s0.t + (i % 64).astype(jnp.float32) * dt_seg
            px = org[0] + consts.dx * tt
            py = org[1] + consts.dy * tt
            pz = org[2] + consts.dz * tt
            r = jnp.sqrt(jnp.maximum(
                oo + 2.0 * tt * consts.od + tt * tt, 1e-30))
            _, prof, _, hit = _locate_q_fine(fm_, loc, k_cap, q_, px,
                                             py, pz, r, jnp.ones(L, bool))
            return s._replace(t=s.t + jnp.sum(prof[:, 0]) * 0.0
                              + hit.astype(jnp.float32) * 0.0)

        t = timeit_inner(fbody, s0, reps=64, tables=(fm, q))
        print(f"fine primary locate (all lanes): {t*1e6:9.1f} us "
              f"({t/L*1e9:6.1f} ns/lane)", flush=True)

    if "hitrate" in probes and fm is not None:
        # primary hit rate along REAL rays: walk each lane's sample t
        # forward in band-sized hops and query the primary at each point
        from icon_rt_tpu.ops.fastq import _locate_q_fine, _locate_q

        @jax.jit
        def rates(s, fm_, q_, loc_):
            ones = jnp.ones(L, bool)
            hits_f = jnp.zeros((), jnp.float32)
            hits_c = jnp.zeros((), jnp.float32)
            n = jnp.zeros((), jnp.float32)
            ox, oy, oz = org

            def step(i, carry):
                hits_f, hits_c, n = carry
                tt = s.t + i.astype(jnp.float32) * dt_seg
                px = ox + consts.dx * tt
                py = oy + consts.dy * tt
                pz = oz + consts.dz * tt
                r = jnp.sqrt(jnp.maximum(
                    oo + 2.0 * tt * consts.od + tt * tt, 1e-30))
                *_, hf = _locate_q_fine(fm_, loc_, k_cap, q_, px, py,
                                        pz, r, ones)
                *_, hc = _locate_q(loc_, q_, k_cap, px, py, pz, r, ones)
                # count only in-volume points (full locate hits)
                hits_f = hits_f + jnp.sum((hf & hc).astype(jnp.float32))
                hits_c = hits_c + jnp.sum(hc.astype(jnp.float32))
                return hits_f, hits_c, n + L

            hits_f, hits_c, n = jax.lax.fori_loop(0, 32, step,
                                                  (hits_f, hits_c, n))
            return hits_f, hits_c, n

        hf_, hc_, n_ = rates(s0, fm, q, loc)
        print(f"hitrate: primary resolves {float(hf_)/max(float(hc_),1):.4f}"
              f" of in-volume locates (volume coverage "
              f"{float(hc_)/float(n_):.3f})", flush=True)

    if "batch" in probes:
        from icon_rt_tpu.ops.fastq import render_fast_q_batch
        from icon_rt_tpu.ops.render import alloc_frame

        S = args.spp
        a0 = jnp.zeros((L, 4), jnp.float32)
        f0 = jnp.zeros((L,), jnp.uint32)

        @jax.jit
        def bcall(q_, loc_, fm_, a, f):
            return render_fast_q_batch(
                q_, loc_, k_cap, bands, tf, lp, xs, ys, WIDTH, HEIGHT,
                a, f, S, args.spr, refresh_compact=args.compact,
                finemap=fm_, service_cap=args.service_cap)

        jax.block_until_ready(bcall(q, loc, fm, a0, f0))
        t0b = time.perf_counter()
        reps = 3
        for _ in range(reps):
            a1, f1 = bcall(q, loc, fm, a0, f0)
        np.asarray(f1)
        dt = (time.perf_counter() - t0b) / reps
        print(f"batch L={L} S={S} spr={args.spr} compact={args.compact} "
              f"fm={'x'+str(args.finemap) if fm is not None else 'off'}: "
              f"{dt*1e3:8.1f} ms/call "
              f"({L*S/dt/1e6:6.2f} Msamples/s)", flush=True)

    if "sweep" in probes:
        # knob sweep over (spr, outer_unroll, spp) on the real batched
        # call — ONE process, one scene load, one finemap build.  With the
        # fine-map primary the refresh cost collapsed (427 -> 281 ms at
        # spr=8/S=64) and the while_loop tax (~1.2 ms/iter) became a
        # first-order term; raising spr cuts iterations ~linearly
        # (iters ~= steps/spr + pend_events/2) at ~0.46 ns/lane-step of
        # extra idle-lane arithmetic.
        from icon_rt_tpu.ops.fastq import render_fast_q_batch

        for cfg in args.sweep.split(","):
            # spr:unroll:spp[:service_cap[:lanes]] — cap/lanes default to
            # the process-level args so old 3-field entries keep working
            parts = [int(x) for x in cfg.split(":")]
            spr_, unr_, S_ = parts[:3]
            cap_ = parts[3] if len(parts) > 3 else args.service_cap
            L_ = parts[4] if len(parts) > 4 else L
            pix_ = jnp.asarray(perm[n_active // 4: n_active // 4 + L_])
            ys_, xs_ = jnp.divmod(pix_, WIDTH)
            a0 = jnp.zeros((L_, 4), jnp.float32)
            f0 = jnp.zeros((L_,), jnp.uint32)

            @jax.jit
            def scall(q_, loc_, fm_, a, f, spr_=spr_, unr_=unr_, S_=S_,
                      cap_=cap_, xs_=xs_, ys_=ys_):
                return render_fast_q_batch(
                    q_, loc_, k_cap, bands, tf, lp, xs_, ys_, WIDTH, HEIGHT,
                    a, f, S_, spr_, outer_unroll=unr_,
                    refresh_compact=args.compact, finemap=fm_,
                    service_cap=cap_)

            tc0 = time.perf_counter()
            jax.block_until_ready(scall(q, loc, fm, a0, f0))
            t_compile = time.perf_counter() - tc0
            reps = 3 if S_ >= 32 else 12
            t0s = time.perf_counter()
            for _ in range(reps):
                a1, f1 = scall(q, loc, fm, a0, f0)
            np.asarray(f1)
            dt = (time.perf_counter() - t0s) / reps
            print(f"sweep spr={spr_} unroll={unr_} S={S_} L={L_} "
                  f"cap={cap_} "
                  f"fm={'x'+str(args.finemap) if fm is not None else 'off'}:"
                  f" {dt*1e3:8.1f} ms/call ({L_*S_/dt/1e6:6.2f} Msamples/s)"
                  f"  [compile+warm {t_compile:.0f}s]", flush=True)

    if "hlo" in probes:
        # dump the TPU-optimized HLO of the batched call so xprof op names
        # (%fusion.N, %copy-start.N) can be mapped to HLO offline — the
        # flat-loop xprof shows ~25% of call time in copy-start ops whose
        # (8192, 1) shapes the Python source never names
        from icon_rt_tpu.ops.fastq import render_fast_q_batch

        S = args.spp
        a0 = jnp.zeros((L, 4), jnp.float32)
        f0 = jnp.zeros((L,), jnp.uint32)

        def hcall(q_, loc_, fm_, a, f):
            return render_fast_q_batch(
                q_, loc_, k_cap, bands, tf, lp, xs, ys, WIDTH, HEIGHT,
                a, f, S, args.spr, refresh_compact=args.compact,
                finemap=fm_, service_cap=args.service_cap)

        txt = jax.jit(hcall).lower(q, loc, fm, a0, f0).compile().as_text()
        out = f"/tmp/fastq_hlo_cap{args.service_cap}.txt"
        with open(out, "w") as fh:
            fh.write(txt)
        print(f"# optimized HLO ({len(txt)} bytes) -> {out}", flush=True)

    if "xprof" in probes:
        # xplane trace of ONE real batched call -> top ops by device time
        # (the round-2 methodology that found the scalar-gather bug,
        # docs/ROUND2.md:72, pointed at the round-3 residual: ~90 ns/
        # lane-phase of the batched call is unattributed by the
        # fine/steps/gather probes)
        import glob

        from jax.profiler import ProfileData
        from icon_rt_tpu.ops.fastq import render_fast_q_batch

        S = args.spp
        a0 = jnp.zeros((L, 4), jnp.float32)
        f0 = jnp.zeros((L,), jnp.uint32)

        @jax.jit
        def xcall(q_, loc_, fm_, a, f):
            return render_fast_q_batch(
                q_, loc_, k_cap, bands, tf, lp, xs, ys, WIDTH, HEIGHT,
                a, f, S, args.spr, refresh_compact=args.compact,
                finemap=fm_, service_cap=args.service_cap)

        jax.block_until_ready(xcall(q, loc, fm, a0, f0))
        tdir = "/tmp/xprof_fastq"
        with jax.profiler.trace(tdir):
            a1, f1 = xcall(q, loc, fm, a0, f0)
            np.asarray(f1)
        paths = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
        pd = ProfileData.from_file(paths[-1])
        for plane in pd.planes:
            print(f"xprof sees plane '{plane.name}' "
                  f"({len(list(plane.lines))} lines: "
                  f"{[l.name for l in plane.lines][:6]})", flush=True)
        import re as _re
        for plane in pd.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            tot = {}
            cnt = {}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" not in line.name:
                    continue
                for ev in line.events:
                    d = ev.duration_ns
                    tot[ev.name] = tot.get(ev.name, 0) + d
                    cnt[ev.name] = cnt.get(ev.name, 0) + 1
            rows = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
            alln = sum(tot.values())
            print(f"xprof plane '{plane.name}': total {alln/1e6:.1f} ms "
                  f"on-device", flush=True)
            # by op KIND first: the round-3 copy-start discovery came from
            # this aggregation, not the top-30 list (docs/ROUND3.md)
            kinds = {}
            for name, d in tot.items():
                k = _re.match(r"%?([a-zA-Z_\-]+)", name).group(1)
                kinds.setdefault(k, [0, 0])
                kinds[k][0] += d
                kinds[k][1] += cnt[name]
            for k, (d, n) in sorted(kinds.items(),
                                    key=lambda kv: -kv[1][0])[:15]:
                print(f"  kind {d/1e6:9.2f} ms  x{n:<7d} {k}", flush=True)
            for name, d in rows:
                print(f"  {d/1e6:9.2f} ms  x{cnt[name]:<6d} {name[:90]}",
                      flush=True)

    if "bstats" in probes:
        # instrumented batched loop: how many refresh phases does a real
        # (L, S) call enter, and how many pending lanes do they serve?
        # (decides cache-slot count and primary-threshold tuning)
        from icon_rt_tpu.ops.fastq import render_fast_q_batch

        S = args.spp
        a0 = jnp.zeros((L, 4), jnp.float32)
        f0 = jnp.zeros((L,), jnp.uint32)

        @jax.jit
        def bstats(q_, loc_, fm_, a, f):
            return render_fast_q_batch(
                q_, loc_, k_cap, bands, tf, lp, xs, ys, WIDTH, HEIGHT,
                a, f, S, args.spr, refresh_compact=args.compact,
                finemap=fm_, return_stats=True,
                service_cap=args.service_cap)

        _, _, (n_it, n_refr, n_pend) = bstats(q, loc, fm, a0, f0)
        n_it, n_refr, n_pend = int(n_it), int(n_refr), int(n_pend)
        print(f"bstats L={L} S={S}: outer={n_it} refresh_phases={n_refr} "
              f"pend_total={n_pend} "
              f"(pend/phase={n_pend/max(n_refr,1):.0f}, "
              f"locates/sample={n_pend/(L*S):.3f})", flush=True)

    def inner(s):
        for _ in range(args.spr):
            s = step_core(s, consts, edges, majors, org, oo, ud, nb,
                          ml=lm, a_off=lm)
        return s

    if "steps" in probes:
        def body(i, s, tb):
            return inner(s._replace(done=jnp.zeros(L, jnp.int32),
                                    pending=jnp.zeros(L, jnp.int32)))

        t = timeit_inner(body, s0, reps=64)
        print(f"steps x{args.spr} (no refresh):      {t*1e6:9.1f} us "
              f"({t/(L*args.spr)*1e9:6.1f} ns/lane-step)", flush=True)

    if "outer" in probes:
        def body(i, s, tb):
            loc_, q_ = tb
            s = s._replace(done=jnp.zeros(L, jnp.int32),
                           pending=(jnp.arange(L) % 2).astype(jnp.int32),
                           t=s0.t + (i % 64).astype(jnp.float32) * dt_seg)
            s = jax.lax.cond(jnp.any(s.pending != 0),
                             lambda x: _refresh_q(x, consts, loc_, q_,
                                                  k_cap, org, oo),
                             lambda x: x, s)
            return inner(s)

        t = timeit_inner(body, s0, reps=64, tables=(loc, q))
        print(f"outer iteration (refresh+steps): {t*1e6:7.1f} us",
              flush=True)

    if "loop" in probes:
        def loop(s, loc_, q_):
            def cond(c):
                s, it = c
                return jnp.any(s.done == 0) & (it < 16384)

            def body(c):
                s, it = c
                s = jax.lax.cond(jnp.any(s.pending != 0),
                                 lambda x: _refresh_q(x, consts, loc_, q_,
                                                      k_cap, org, oo),
                                 lambda x: x, s)
                return inner(s), it + 1

            s, it = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
            return s.alpha, it

        t = timeit(jax.jit(loop), s0, loc, q, iters=4)
        _, it = jax.jit(loop)(s0, loc, q)
        print(f"full chunk loop (1 sample/lane):   {t*1e6:9.1f} us, "
              f"{int(it)} outer iterations "
              f"({t/max(int(it),1)*1e6:6.1f} us/iter)", flush=True)

    if "stats" in probes:
        # instrumented loop: same math, plus counters
        def loop_stats(s, loc_, q_):
            def cond(c):
                s, it, pend_ev, steps_ev, refr = c
                return jnp.any(s.done == 0) & (it < 16384)

            def body(c):
                s, it, pend_ev, steps_ev, refr = c
                any_p = jnp.any(s.pending != 0)
                refr = refr + any_p.astype(jnp.int32)
                pend_ev = pend_ev + jnp.sum(s.pending)
                s = jax.lax.cond(any_p,
                                 lambda x: _refresh_q(x, consts, loc_, q_,
                                                      k_cap, org, oo),
                                 lambda x: x, s)
                live0 = jnp.sum((s.done == 0).astype(jnp.int32))
                s = inner(s)
                steps_ev = steps_ev + live0
                return s, it + 1, pend_ev, steps_ev, refr

            z = jnp.int32(0)
            s, it, pend_ev, steps_ev, refr = jax.lax.while_loop(
                cond, body, (s, z, z, z, z))
            return it, pend_ev, steps_ev, refr

        it, pend_ev, steps_ev, refr = jax.jit(loop_stats)(s0, loc, q)
        n_live = int(jnp.sum((s0.done == 0).astype(jnp.int32)))
        print(f"stats: lanes={L} live0={n_live} outer_iters={int(it)} "
              f"refresh_iters={int(refr)} "
              f"pend_events/ray={int(pend_ev)/max(n_live,1):.2f} "
              f"live_lane_iters/ray={int(steps_ev)/max(n_live,1):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
