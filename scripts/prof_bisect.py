#!/usr/bin/env python
"""Bisect the session-3 -> session-4 r2b9q regression (136 -> 173 ms/call).

Two code changes touched the hot gather path between the measurements:

  (a) test12 stored at TRUE logical width 12 (pack factor 10, 120-lane
      physical rows) instead of padded-16 (factor 8, 128-lane rows) —
      the R2B9 memory diet, docs/ROUND3.md session 4;
  (b) the finemap stores u8 slot indices, so every primary locate now
      gathers ONE EXTRA coarse locator row and runs a 4xK one-hot
      decode (commit f21bd6d).

This probe measures both in isolation at R2B9 shapes with
device-synthesized tables (no scene build, no host upload):

  gather16  — packed_gather from (N/8, 128) f32 (padded-16 layout)
  gather12  — packed_gather from (N/10, 120) f32 (true-12 layout)
  prim_i32  — primary candidate fetch, i32 map (one row gather)
  prim_u8   — primary candidate fetch, u8 map (row + locator row + decode)

ns/row numbers are comparable to the 9.5 ns/row giant-table floor from
docs/ROUND3.md.  Tables are built and freed sequentially so the probe
fits HBM next to nothing else.  Run: python scripts/prof_bisect.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icon_rt_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from prof_fastq import timeit_inner, _print_hbm  # noqa: E402

N_CELLS = 83_886_080          # R2B9 columns
N_BINS = 42_041_712           # full-grid locator bins (subdiv 11, scale 1)
N_FINE = N_BINS * 4           # finemap factor 2 (2x per axis)
K_CAP = 18
M = 2048                      # gathered rows per body (the compact tier)


def synth(shape, dtype):
    """Device-side constant fill — value-independent timing, no upload."""
    return jax.jit(lambda: jnp.ones(shape, dtype),
                   )().block_until_ready()


def free(*arrs):
    for a in arrs:
        a.delete()


def bench_gather(n_rows, width, label, key):
    """packed_gather of M random rows from an (n_rows, width)-logical
    f32 table, timed inside one execution."""
    from icon_rt_tpu.utils.layout import pack_factor, packed_gather

    f = pack_factor(width)
    phys = ((n_rows + f - 1) // f, f * width)
    tab = synth(phys, jnp.float32)
    _print_hbm(label)
    idx = jax.random.randint(key, (M,), 0, n_rows, jnp.int32)

    def body(i, c, tb):
        rows = packed_gather(tb, (idx + i) % n_rows, width)
        return c + jnp.sum(rows)

    t = timeit_inner(body, jnp.float32(0), reps=256, tables=tab)
    print(f"{label}: phys {phys[0]}x{phys[1]} "
          f"({phys[0]*phys[1]*4/2**30:.2f} GB), "
          f"{t / M * 1e9:.2f} ns/row", flush=True)
    free(tab)
    return t


def bench_primary(kind, key):
    """The candidate-fetch half of a primary locate (decode only — the
    4 test rows afterwards are identical between variants and measured
    by the gather probes above)."""
    from icon_rt_tpu.models.finemap import K_CAND
    from icon_rt_tpu.utils.layout import pack_factor, packed_gather

    fbid = jax.random.randint(key, (M,), 0, N_FINE, jnp.int32)
    fm_f = 128 // K_CAND
    if kind == "i32":
        pairs = synth(((N_FINE + fm_f - 1) // fm_f, 128), jnp.int32)
        _print_hbm("prim_i32")

        def body(i, c, tb):
            cand = packed_gather(tb, (fbid + i) % N_FINE, K_CAND)
            return c + jnp.sum(cand)

        t = timeit_inner(body, jnp.int32(0), reps=256, tables=pairs)
        free(pairs)
    else:
        pairs = synth(((N_FINE + fm_f - 1) // fm_f, 128), jnp.uint8)
        lf = pack_factor(K_CAP)
        bins = synth(((N_BINS + lf - 1) // lf, lf * K_CAP), jnp.int32)
        _print_hbm("prim_u8")
        # fine (row, col) -> coarse bin id, factor 2 per axis; the fine
        # grid is (2*n_lat, 2*n_lon) with n_lon = N_BINS // n_lat
        n_lat = 4436
        n_lon = N_BINS // n_lat  # 9477
        f_lon = 2 * n_lon

        def body(i, c, tb):
            pairs_, bins_ = tb
            fb = (fbid + i) % N_FINE
            slots = packed_gather(pairs_, fb, K_CAND)          # (M,4) u8
            cbid = (fb // f_lon // 2) * n_lon + (fb % f_lon) // 2
            rows = packed_gather(bins_, cbid, K_CAP)           # (M,18)
            sl = jnp.minimum(slots.astype(jnp.int32), K_CAP - 1)
            oh = sl[:, :, None] == jnp.arange(K_CAP, dtype=jnp.int32)
            cand = jnp.sum(rows[:, None, :] * oh.astype(jnp.int32),
                           axis=-1)
            cand = jnp.where(slots == jnp.uint8(255), -1, cand)
            return c + jnp.sum(cand)

        t = timeit_inner(body, jnp.int32(0), reps=256,
                         tables=(pairs, bins))
        free(pairs, bins)
    print(f"prim_{kind}: {t / M * 1e9:.2f} ns/lane", flush=True)
    return t


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    bench_gather(N_CELLS, 16, "gather16", ks[0])   # padded-16, factor 8
    bench_gather(N_CELLS, 12, "gather12", ks[1])   # true-12, factor 10
    bench_primary("i32", ks[2])
    bench_primary("u8", ks[3])


if __name__ == "__main__":
    main()
