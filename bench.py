#!/usr/bin/env python
"""Benchmark harness: sustained ray throughput of the flagship render path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mray/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the driver's north star of 1 Gray/s per chip (= 1000 Mray/s).

Configuration: global icosahedral field at 1920x1080 on the fast TPU-native
raygen (radial-band Woodcock tracking + column-resident sampling,
ops/fast.py), progressive accumulation, reference-default unit distance
(10^(floor(log10(r))-3), ref: hostCode.cu:838-840).  Timing is validated by
materializing the framebuffer to the host after the timed loop (a crashed
TPU worker otherwise returns instantly and silently).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icon_rt_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icon_rt_tpu.data import synthetic  # noqa: E402
from icon_rt_tpu.models.cells import build_cells, compute_stats  # noqa: E402
from icon_rt_tpu.models.locator import build_locator  # noqa: E402
from icon_rt_tpu.models.shells import (build_radial_bands,  # noqa: E402
                                       update_band_majorants)
from icon_rt_tpu.models.transfunc import make_transfunc  # noqa: E402
from icon_rt_tpu.ops.camera import Camera  # noqa: E402
from icon_rt_tpu.ops.fast import pack_cells, render_frame_fast  # noqa: E402
from icon_rt_tpu.ops.order import inverse_order, pixel_order  # noqa: E402
from icon_rt_tpu.ops.render import alloc_frame, make_launch_params  # noqa: E402


def _install_watchdog():
    """The TPU worker can wedge (see README gotchas); emit a diagnostic
    JSON line instead of hanging forever if that happens mid-bench."""
    import signal

    def on_alarm(signum, frame):
        print(json.dumps({
            "metric": "Mray/s (BENCH WATCHDOG: TPU worker unresponsive; "
                      "see README 'Hardware gotchas')",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
        }), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    # generous default: a COLD compile of the fused render loop through the
    # remote-compile tunnel takes ~7-8 min; warm-cache runs finish in ~90 s
    signal.alarm(int(os.environ.get("BENCH_WATCHDOG_S", "1500")))


def main():
    _install_watchdog()
    width, height = 1920, 1080
    subdiv = int(os.environ.get("BENCH_SUBDIV", "5"))  # 20*4^5 = 20,480 cells
    num_layers = 16
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    ds = synthetic.icosphere(subdivisions=subdiv, num_layers=num_layers)
    stats = compute_stats(ds)
    cells = build_cells(ds)
    locator = build_locator(ds)
    tf = make_transfunc(value_range=tuple(stats.data_range))
    bands = update_band_majorants(build_radial_bands(ds, 64),
                                  tf.values, tf.value_range)
    packed = pack_cells(cells, tf)

    cam = Camera()
    cam.set_aspect(width / height)
    center = 0.5 * (stats.world_bounds_lo + stats.world_bounds_hi)
    r = stats.spherical_bounds_hi[0]
    cam.set_orientation(center + np.array([2.2 * r, 0.4 * r, 0.9 * r], np.float32),
                        center, np.array([0, 0, 1], np.float32), cam.fovy)
    unit_distance = 10.0 ** (np.floor(np.log10(stats.spherical_bounds_lo[0])) - 3)
    lp = make_launch_params(cam.basis(width, height), stats.world_bounds_lo,
                            stats.world_bounds_hi, unit_distance=unit_distance)

    accum, fb = alloc_frame(width, height)
    perm, n_active = pixel_order(lp, stats.spherical_bounds_lo[0],
                                 stats.spherical_bounds_hi[0], width, height)
    inv = inverse_order(perm)
    perm = jnp.asarray(perm)

    chunk = int(os.environ.get("BENCH_CHUNK", "4096"))
    spr = int(os.environ.get("BENCH_SPR", "8"))

    def step(s, accum, fb):
        return render_frame_fast(cells, packed, locator, bands,
                                 lp._replace(accum_id=jnp.int32(s)),
                                 accum, fb, width=width, height=height,
                                 pixel_perm=perm, n_active=n_active,
                                 chunk=chunk, steps_per_refresh=spr)

    accum, fb = step(0, accum, fb)
    cov = float((np.asarray(fb)[inv] != 0).mean())  # validate + sync

    t0 = time.perf_counter()
    for s in range(1, 1 + iters):
        accum, fb = step(s, accum, fb)
    cov = float((np.asarray(fb)[inv] != 0).mean())  # validate + sync
    dt = time.perf_counter() - t0

    rays = width * height * iters
    mray_s = rays / dt / 1e6
    fps = iters / dt
    print(json.dumps({
        "metric": f"Mray/s, {width}x{height} fast raygen (radial-band Woodcock"
                  f" + column cache), {ds.num_cells} cells x {num_layers}"
                  f" layers, unit_distance={unit_distance:g}, coverage="
                  f"{cov:.3f}, fps={fps:.2f}",
        "value": round(mray_s, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mray_s / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
