"""dma_row_gather (interpret mode) matches a plain row gather."""
import jax.numpy as jnp
import numpy as np

from icon_rt_tpu.ops.dma_gather import dma_row_gather


def test_dma_row_gather_matches_indexing():
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 4096, size=512).astype(np.int32))
    got = np.asarray(dma_row_gather(table, idx, interpret=True))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_dma_row_gather_small_m():
    # fewer rows than the in-flight ring
    table = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.asarray([5, 0, 63], dtype=jnp.int32)
    got = np.asarray(dma_row_gather(table, idx, interpret=True))
    want = np.asarray(table)[[5, 0, 63]]
    np.testing.assert_array_equal(got, want)
