"""Pallas batched row-DMA gather — the VERDICT round-2 experiment.

Round 2 dismissed an in-kernel DMA refresh on a cost model of per-lane
SCALAR DMAs (docs/ROUND2.md).  VERDICT round 2 item 1 demands the honest
version be MEASURED, not modeled: batched ROW DMAs against the packed
(N/f, 128-lane) gather tables (utils/layout.pack_table) — each logical
row fetch is one aligned 512 B burst, exactly the unit the production
XLA gather path (`packed_gather`) reads.

This kernel is the measurement instrument: gather M packed rows by index
with a ring of `N_INFLIGHT` outstanding HBM->VMEM DMAs.  It answers one
question — can hand-issued row DMAs beat XLA's native gather at the
render loop's table shapes?  `scripts/pallas_dma_probe.py` runs the
comparison; per CLAUDE.md's evidence rule the result decides whether a
DMA-refresh path gets built or this stays a documented dead end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dma_row_gather"]

#: outstanding DMAs; enough to hide HBM latency (~100s of ns) behind the
#: scalar core's issue loop
N_INFLIGHT = 16


def _kernel(ids_ref, table_ref, out_ref, sems):
    m = out_ref.shape[0]

    def _dma(i, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(ids_ref[i], 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems.at[slot])

    for s in range(min(N_INFLIGHT, m)):      # static prologue
        _dma(s, s).start()

    def body(i, _):
        slot = jax.lax.rem(i, N_INFLIGHT)
        _dma(i, slot).wait()
        nxt = i + N_INFLIGHT

        @pl.when(nxt < m)
        def _():
            _dma(nxt, slot).start()

        return 0

    jax.lax.fori_loop(0, m, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dma_row_gather(table, idx, interpret: bool = False):
    """table[idx] for a 2-D packed table via a pipeline of row DMAs.

    `table` stays in HBM (`pl.ANY`); `idx` (M,) i32 is scalar-prefetched
    to SMEM so row addresses are known before the body runs; the output
    block lives in VMEM and each row is DMA'd straight into it.  Returns
    (M, table.shape[-1]) — the PACKED row; callers subrow-select like
    `packed_gather` does."""
    m = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_INFLIGHT,))],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, table.shape[-1]), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, table)
