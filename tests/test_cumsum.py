"""ops/cumsum.py: exact MXU cumsum vs jnp.cumsum oracle.

The binner's per-Gaussian slot offsets (reference analogue:
cub::DeviceScan::InclusiveSum, rasterizer_impl.cu:278) must be bit-exact —
any off-by-one corrupts every tile segment start.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.ops.cumsum import cumsum_i32


@pytest.mark.parametrize("n", [1, 7, 128, 4096, 4097, 100_000, 1_000_003])
def test_cumsum_exact(n):
    rng = np.random.default_rng(n)
    # counts like the binner's: mostly tiny, occasional whole-screen splats
    x = rng.integers(0, 8, n).astype(np.int32)
    x[rng.integers(0, n, max(n // 100, 1))] = 560
    ref = np.cumsum(x, dtype=np.int64)
    assert ref[-1] < 2**24  # the regime the kernel asserts
    out = np.asarray(cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(out, ref.astype(np.int32))
