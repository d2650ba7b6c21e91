"""Device layouts for large gather tables.

A row-major (N, 16) table tiles to (8, 128) lanes on TPU — 8x HBM
padding (u8 tiles are (32, 128): a u8[84M, 16] pads 1.25 GB -> 10 GB,
which OOMed the R2B9 bench).  Committing the array with a
minor-dim-major ("transposed") layout stores it unpadded, jit honors the
committed layout at entry, and row gathers measure just as fast
(0.4-0.7 ns/row either way; docs/ROUND2.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


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
