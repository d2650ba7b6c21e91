"""Device layouts for large gather tables.

A row-major (N, 16) table tiles to (8, 128) lanes on TPU — 8x HBM
padding (u8 tiles are (32, 128): a u8[84M, 16] pads 1.25 GB -> 10 GB,
which OOMed the R2B9 bench).

Two remedies exist in this file; measurements at R2B9 (docs/ROUND3.md)
decide which to use where:

  * pack_table / packed_gather — reshape (N, W) row-major to
    (N/f, f*W) with f*W = 128 lanes: the SAME bytes, zero padding, and a
    row gather is one aligned 128-wide burst (~3-5 ns/row) followed by an
    arithmetic subrow select.  USE THIS for every table the render loop
    gathers from.
  * put_table — commit the minor-dim-major ("transposed") layout.
    Unpadded too, and fine for tables that are only read elementwise, but
    a row gather against it lowers to a strided per-element walk:
    ~27 ns/row measured inside the R2B9 render loop (the round-2
    "just as fast" measurement was amortized by a hidden per-call
    relayout and is wrong for in-loop gathers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def table_format(device=None):
    """Format committing a 2-D array with major_to_minor=(1, 0)."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    device = device if device is not None else jax.devices()[0]
    return Format(Layout(major_to_minor=(1, 0)),
                  SingleDeviceSharding(device))


def put_table(x) -> jax.Array:
    """device_put a 2-D gather table unpadded (transposed layout).

    Falls back to a plain put where the backend rejects explicit layouts
    (CPU meshes in tests)."""
    x = jnp.asarray(x)
    if x.ndim != 2:
        return jax.device_put(x)
    try:
        return jax.device_put(x, table_format())
    except Exception:
        return jax.device_put(x)


def pack_factor(w: int) -> int:
    """Rows of logical width w packed per 128-lane physical row."""
    return max(1, 128 // w)


def pack_table(x: np.ndarray, pad_value=0) -> np.ndarray:
    """(N, W) row-major -> (ceil(N/f), f*W), f = pack_factor(W): the same
    bytes reshaped so the minor dim fills the TPU's 128-lane tile.  Stores
    the table unpadded with a PLAIN layout — row gathers stay on the fast
    burst path (see module docstring).  N pads up to a multiple of f with
    pad_value rows (use -1 for candidate-id tables whose -1 means empty)."""
    n, w = x.shape
    f = pack_factor(w)
    if f == 1:
        return np.ascontiguousarray(x)
    pad = (-n) % f
    if pad:
        x = np.concatenate(
            [x, np.full((pad, w), pad_value, x.dtype)], axis=0)
    return np.ascontiguousarray(x).reshape(-1, f * w)


def packed_gather(table, idx, w: int):
    """rows[idx] (logical width w) from a pack_table'd device array: one
    aligned 128-wide row gather + an arithmetic subrow select.  idx may
    have any shape; returns idx.shape + (w,)."""
    f = table.shape[-1] // w
    if f == 1:
        return table[idx]
    rows = table[idx // f]                       # idx.shape + (f*w,)
    sub = idx % f
    r = rows.reshape(rows.shape[:-1] + (f, w))
    oh = (sub[..., None] == jnp.arange(f, dtype=sub.dtype))
    if jnp.issubdtype(r.dtype, jnp.floating):
        return jnp.sum(r * oh[..., None].astype(r.dtype), axis=-2)
    out = jnp.sum(r.astype(jnp.int32) * oh[..., None].astype(jnp.int32),
                  axis=-2)
    return out if table.dtype == jnp.int32 else out.astype(table.dtype)


def unpack_table(x, w: int, n: int | None = None) -> np.ndarray:
    """Host-side inverse of pack_table: (N/f, f*w) -> (N, w) (the same
    bytes), trimmed to n logical rows when given."""
    x = np.asarray(x)
    out = x.reshape(-1, w)
    return out[:n] if n is not None else out
