#!/usr/bin/env python
"""Measure: hand-issued Pallas row DMAs vs XLA's native gather.

VERDICT round 2 item 1 ("one honest Pallas experiment with batched
row-DMA refresh ... measure, don't model").  Both contenders fetch M
random packed rows (the production refresh unit — utils/layout.pack_table
rows, one aligned 128-lane burst each) from tables at the render loop's
real scales:

  * small — R2B4-class (16k packed rows, fits cache-ish)
  * giant — R2B9-class (8.4M packed rows x 128 f32 = 4.3 GB, page-miss
    bound like the real locator/cell tables)

Timing loops the op INSIDE one jitted execution (per-dispatch through the
axon relay is ~3.5-4 ms, docs/ROUND3.md) and varies the row ids per rep so
no cache level hides the traffic.  Output: ns per row fetched.

Usage: python scripts/pallas_dma_probe.py [--m 8192] [--reps 32]
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

from icon_rt_tpu.ops.dma_gather import dma_row_gather  # noqa: E402


def time_gather(fn, table, idx, n_rows, reps, iters=3):
    """Seconds per fn(table, ids) with ids varied per rep, looped inside
    one execution; the two-repcount trick subtracts fixed overhead."""

    # table/idx are jit ARGUMENTS, not closures — a closed-over device
    # array is baked into the HLO as a constant (4.3 GB at giant scale,
    # which wedges the remote compile).
    @jax.jit
    def run(tb, ix, reps_):
        def body(i, acc):
            ids = (ix + i * 12289) % n_rows   # re-randomize rows per rep
            out = fn(tb, ids)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, reps_, body, jnp.float32(0.0))

    np.asarray(run(table, idx, 2))          # compile + warm
    np.asarray(run(table, idx, reps))

    def t(reps_):
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(run(table, idx, reps_))   # materialize (wedge gotcha)
        return (time.perf_counter() - t0) / iters

    t_hi, t_lo = t(reps), t(reps // 2)
    return (t_hi - t_lo) / (reps - reps // 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--scales", default="small,giant")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode: tiny shapes, interpreted kernel")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    shapes = {"small": 16384, "giant": 8_388_608}   # packed rows x 128 f32
    if args.interpret:
        shapes = {"small": 1024, "giant": 4096}
    rng = np.random.default_rng(3)

    for scale in args.scales.split(","):
        n = shapes[scale]
        # fill via iota on device — a 4.3 GB host upload through the relay
        # would take ~20 min (docs/ROUND3.md)
        table = (jnp.arange(n, dtype=jnp.float32)[:, None]
                 * jnp.ones((1, 128), jnp.float32))
        jax.block_until_ready(table)
        idx = jnp.asarray(rng.integers(0, n, size=args.m).astype(np.int32))

        xla = time_gather(lambda tb, ids: tb[ids], table, idx, n, args.reps)
        dma = time_gather(
            lambda tb, ids: dma_row_gather(tb, ids,
                                           interpret=args.interpret),
            table, idx, n, args.reps)
        print(f"{scale:6s} n={n:>9d} m={args.m}: "
              f"xla {xla / args.m * 1e9:7.2f} ns/row   "
              f"dma {dma / args.m * 1e9:7.2f} ns/row   "
              f"(dma/xla {dma / max(xla, 1e-12):5.2f}x)", flush=True)
        del table


if __name__ == "__main__":
    main()
