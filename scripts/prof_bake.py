#!/usr/bin/env python
"""Profile the quantized-tier TF-edit bake at R2B9 shape (VERDICT item 4:
r2b9q tf_edit_s 3.1 s vs the <= 2 s target; the full 256-level bake is
its biggest non-frame term).

Variants timed on a synthetic (N/8, 128) u8 table at R2B9 size:

  base      — models/qcells._bake_lookup as shipped (256 compare-select
              reduce, lax.map chunks of 2^21 elements)
  chunk23/24— same arithmetic, bigger chunks (fewer sequential kernels)
  mxu       — nibble decomposition: out = onehot(hi) @ T[16,16] column-
              selected by lo; 32 VPU compares + an (M,16)@(16,16) matmul
              instead of 256 compare-selects
  i32pack   — bitcast 4 u8 lanes to one i32 lane; per level, zero-byte
              detection ((x ^ k*0x01010101) - 0x01010101) & ~x & 0x80..
              accumulates tab_k into matching bytes: 4x fewer lanes

All variants are validated elementwise against base on a small random
table before timing.  Run: python scripts/prof_bake.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icon_rt_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_PHYS = 10_485_760           # R2B9 value_q physical rows (84M / 8)
W = 128


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def bake_base(v, t, chunk_elems=1 << 21):
    n, w = v.shape
    rows = max(1, min(n, chunk_elems // w))
    pad = (-n) % rows
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, w), v.dtype)])
    lev = jnp.arange(256, dtype=jnp.int32)
    ti = t.astype(jnp.int32)

    def chunk(c):
        m = c.astype(jnp.int32)[..., None] == lev
        return jnp.sum(jnp.where(m, ti, 0), axis=-1).astype(jnp.uint8)

    out = jax.lax.map(chunk, v.reshape(-1, rows, w))
    return out.reshape(-1, w)[:n]


def bake_mxu(v, t, chunk_elems=1 << 22):
    n, w = v.shape
    rows = max(1, min(n, chunk_elems // w))
    pad = (-n) % rows
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, w), v.dtype)])
    T = t.astype(jnp.float32).reshape(16, 16)
    l16 = jnp.arange(16, dtype=jnp.int32)

    def chunk(c):
        ci = c.astype(jnp.int32)
        hi = ci >> 4
        lo = ci & 15
        oh_hi = (hi[..., None] == l16).astype(jnp.float32)   # (r, w, 16)
        rowsT = jax.lax.dot_general(
            oh_hi.reshape(-1, 16), T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(ci.shape + (16,))
        oh_lo = lo[..., None] == l16
        out = jnp.sum(jnp.where(oh_lo, rowsT, 0.0), axis=-1)
        return out.astype(jnp.uint8)

    out = jax.lax.map(chunk, v.reshape(-1, rows, w))
    return out.reshape(-1, w)[:n]


def bake_i32(v, t, chunk_elems=1 << 22):
    n, w = v.shape
    assert w % 4 == 0
    rows = max(1, min(n, chunk_elems // w))
    pad = (-n) % rows
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, w), v.dtype)])
    ti = t.astype(jnp.uint32)
    ones = jnp.uint32(0x01010101)
    high = jnp.uint32(0x80808080)
    low7 = jnp.uint32(0x7F7F7F7F)

    def chunk(c):
        x = jax.lax.bitcast_convert_type(
            c.reshape(c.shape[0], -1, 4), jnp.uint32)        # (r, w/4)
        acc = jnp.zeros_like(x)
        for k in range(256):
            y = x ^ (jnp.uint32(k) * ones)
            # exact zero-byte detect (no cross-byte carries): 0x80 at match
            zb = ~(((y & low7) + low7) | y) & high
            mask = (zb >> 7) * jnp.uint32(255)               # 0xff at match
            acc = acc | (mask & (ti[k] * ones))
        return jax.lax.bitcast_convert_type(
            acc, jnp.uint8).reshape(c.shape)

    out = jax.lax.map(chunk, v.reshape(-1, rows, w))
    return out.reshape(-1, w)[:n]


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(7)
    tab = jax.random.randint(key, (256,), 0, 256, jnp.int32) \
        .astype(jnp.uint8)

    # correctness at small shape
    vs = jax.random.randint(jax.random.PRNGKey(1), (1024, W), 0, 256,
                            jnp.int32).astype(jnp.uint8)
    ref = np.asarray(bake_base(vs, tab))
    for name, fn in (("mxu", bake_mxu), ("i32pack", bake_i32)):
        got = np.asarray(fn(vs, tab))
        assert (got == ref).all(), f"{name} mismatch"
    print("# variants validated", flush=True)

    v = jax.jit(lambda: jnp.ones((N_PHYS, W), jnp.uint8))().block_until_ready()
    gb = N_PHYS * W / 2**30
    fns = {
        "base_2^21": jax.jit(lambda v, t: bake_base(v, t, 1 << 21)),
        "base_2^23": jax.jit(lambda v, t: bake_base(v, t, 1 << 23)),
        "mxu_2^22": jax.jit(lambda v, t: bake_mxu(v, t, 1 << 22)),
        "mxu_2^24": jax.jit(lambda v, t: bake_mxu(v, t, 1 << 24)),
        "i32_2^22": jax.jit(lambda v, t: bake_i32(v, t, 1 << 22)),
        "i32_2^24": jax.jit(lambda v, t: bake_i32(v, t, 1 << 24)),
    }
    for name, fn in fns.items():
        try:
            dt = timeit(fn, v, tab)
            print(f"{name}: {dt*1e3:.1f} ms ({gb/dt:.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
