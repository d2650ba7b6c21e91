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


def aligned_width(w: int) -> int:
    """Smallest divisor of 128 >= w (for w <= 128): the slot width a
    logical-w row occupies inside an aligned 128-lane physical row.

    Measured on the v5e (scripts/prof_bisect.py): rows packed at their
    TRUE width when it does not divide 128 gather ~60% slower (w=12,
    f=10 -> 120-lane rows: 10.5 vs 6.5 ns/row at R2B9 table sizes) — the
    subrow one-hot extract runs at a 12-minor shape that wastes VPU
    width.  Padding each row slot to the next divisor of 128 keeps the
    extract at a proven-fast shape for ~11% HBM at w=12."""
    if w >= 128:
        return w
    a = 1
    while a < w:
        a *= 2
    return a


def pack_factor(w: int, align: bool = True) -> int:
    """Rows of logical width w packed per 128-lane physical row."""
    return max(1, 128 // (aligned_width(w) if align else w))


def pack_table(x: np.ndarray, pad_value=0, align: bool = True) -> np.ndarray:
    """(N, W) row-major -> (ceil(N/f), f*W'), W' = aligned_width(W),
    f = 128 // W': the same bytes reshaped (plus W'-W pad lanes per row
    when W does not divide 128) so the minor dim fills the TPU's 128-lane
    tile AND each row slot sits at an aligned offset.  Stores the table
    unpadded with a PLAIN layout — row gathers stay on the fast burst
    path (see module docstring).  N pads up to a multiple of f with
    pad_value rows (use -1 for candidate-id tables whose -1 means empty).

    align=False packs at the true width (f*W minor, e.g. the locator's
    (B, 18) i32 -> 126 lanes) — for tables where the aligned slot would
    cost real HBM (18 -> 32 is +78%) and the gather is off the hottest
    path."""
    n, w = x.shape
    wa = aligned_width(w) if align else w
    f = max(1, 128 // wa)
    if f == 1 and wa == w:
        return np.ascontiguousarray(x)
    pad = (-n) % f
    if pad:
        x = np.concatenate(
            [x, np.full((pad, w), pad_value, x.dtype)], axis=0)
    if wa != w:
        x = np.concatenate(
            [x, np.full((x.shape[0], wa - w), pad_value, x.dtype)], axis=1)
    return np.ascontiguousarray(x).reshape(-1, f * wa)


def slot_width(minor: int, w: int) -> tuple[int, int]:
    """(f, slot_w) of a packed table from its physical minor dim and the
    logical row width: legacy true-width tables (minor % w == 0, e.g.
    npz-cached locator bins at 126 = 7*18) and aligned tables (slot padded
    to aligned_width(w)) are both recognized, so cached artifacts packed
    under either scheme stay readable."""
    if minor % w == 0:
        return minor // w, w
    wa = aligned_width(w)
    if minor % wa == 0:
        return minor // wa, wa
    raise ValueError(f"minor dim {minor} fits no packing of width {w}")


def packed_gather(table, idx, w: int):
    """rows[idx] (logical width w) from a pack_table'd device array: one
    aligned 128-wide row gather + an arithmetic subrow select.  idx may
    have any shape; returns idx.shape + (w,)."""
    f, wa = slot_width(table.shape[-1], w)
    if f == 1 and wa == w:
        return table[idx]
    rows = table[idx // f]                       # idx.shape + (f*wa,)
    sub = idx % f
    r = rows.reshape(rows.shape[:-1] + (f, wa))
    oh = (sub[..., None] == jnp.arange(f, dtype=sub.dtype))
    if jnp.issubdtype(r.dtype, jnp.floating):
        out = jnp.sum(r * oh[..., None].astype(r.dtype), axis=-2)
    else:
        out = jnp.sum(r.astype(jnp.int32) * oh[..., None].astype(jnp.int32),
                      axis=-2)
        out = out if table.dtype == jnp.int32 else out.astype(table.dtype)
    return out if wa == w else out[..., :w]


def unpack_table(x, w: int, n: int | None = None) -> np.ndarray:
    """Host-side inverse of pack_table: (N/f, f*w') -> (N, w) (the same
    bytes minus slot padding), trimmed to n logical rows when given."""
    x = np.asarray(x)
    f, wa = slot_width(x.shape[-1], w)
    out = x.reshape(-1, wa)[:, :w]
    return out[:n] if n is not None else out
