"""Multi-timestep animation: a time series of scalar fields on a shared
ICON grid.

The reference renders a single static field; time-animated sequences are a
target of the TPU rebuild (BASELINE config 4: R2B9/R2B10 multi-timestep at
4K, framebuffer tile-sharded).  Design: geometry (corners, heights, planes,
locator, bands) is loaded once; each timestep only swaps the per-layer
value array, so advancing time re-bakes the packed profile rows on device
(a jitted elementwise pass) without recompiling or rebuilding any
acceleration structure.  Host->device upload of the next timestep's values
overlaps rendering via dispatch asynchrony.
"""
from __future__ import annotations

from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .icfile import ICDataset, read_ic


class Animation:
    """values[t] on a fixed grid; construct from datasets or .ic paths."""

    def __init__(self, datasets: Sequence[ICDataset]):
        if not datasets:
            raise ValueError("empty animation")
        base = datasets[0]
        for d in datasets[1:]:
            if d.num_cells != base.num_cells \
                    or not np.array_equal(d.lat, base.lat) \
                    or not np.array_equal(d.height, base.height):
                raise ValueError("animation timesteps must share the grid")
        self.geometry = base
        self.values = np.stack([d.value for d in datasets])  # (T, N, 32)

    @classmethod
    def from_files(cls, paths: Sequence[str]) -> "Animation":
        return cls([read_ic(p) for p in paths])

    @property
    def num_timesteps(self) -> int:
        return self.values.shape[0]

    def dataset_at(self, t: int) -> ICDataset:
        g = self.geometry
        return ICDataset(g.lat, g.lon, g.num_layers, g.height, self.values[t])


def animate_fast(anim: Animation, cells, locator, bands, tf, lp_for_frame,
                 width: int, height: int, samples_per_frame: int = 4
                 ) -> Iterator[np.ndarray]:
    """Render the time series on the fast path; yields one packed (H*W,)
    uint32 framebuffer per timestep.

    cells/locator/bands are built from anim.geometry; tf is the device
    transfer function; lp_for_frame(t, s) returns LaunchParams for
    timestep t, sample s (the camera may move per timestep).
    """
    from ..ops.fast import PackedCells, pack_test_rows, pack_profile_rows, \
        render_frame_fast
    from ..ops.render import alloc_frame

    test_rows = pack_test_rows(cells)
    next_vals = jnp.asarray(anim.values[0])
    for t in range(anim.num_timesteps):
        cells_t = cells._replace(value=next_vals)
        prof_t, rgb_t = pack_profile_rows(cells_t, tf)
        packed = PackedCells(test=test_rows, prof=prof_t, rgb=rgb_t)
        if t + 1 < anim.num_timesteps:
            # start the next upload while this timestep renders
            next_vals = jnp.asarray(anim.values[t + 1])
        accum, fb = alloc_frame(width, height)
        for s in range(samples_per_frame):
            accum, fb = render_frame_fast(cells_t, packed, locator, bands,
                                          lp_for_frame(t, s), accum, fb,
                                          width=width, height=height)
        yield np.asarray(fb)
