"""Streaming segmented-sum kernel vs numpy bincount (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.ops import segsum

segsum.set_interpret(True)


@pytest.fixture(autouse=True)
def _interpret_mode():
    prev = segsum._INTERPRET[0]
    segsum.set_interpret(True)
    yield
    segsum.set_interpret(prev)


def _make(n, m, rng, all_present=True, pad_tail=0):
    """Sorted ids where every gaussian appears >= 1 time (the tiling
    invariant), plus optional id-n padding tail."""
    extra = rng.integers(0, n, m - n - pad_tail)
    ids = np.sort(np.concatenate([np.arange(n), extra]))
    ids = np.concatenate([ids, np.full(pad_tail, n)]).astype(np.int32)
    grads = [rng.normal(size=m).astype(np.float32) for _ in range(10)]
    for g in grads:
        g[ids == n] = 0.0  # padding slots carry zero grads by construction
    return ids, grads


@pytest.mark.parametrize("pad_tail", [0, 2000])
def test_matches_bincount(pad_tail):
    rng = np.random.default_rng(0)
    n, m = 1500, 8 * segsum.BBLK
    ids, grads = _make(n, m, rng, pad_tail=pad_tail)
    out = np.asarray(
        segsum.segment_sum_sorted(
            jnp.asarray(ids), tuple(jnp.asarray(g) for g in grads), n
        )
    )
    for i, g in enumerate(grads):
        ref = np.bincount(ids, weights=g, minlength=n + 1)[:n]
        np.testing.assert_allclose(out[i], ref, rtol=1e-5, atol=1e-5)


def test_single_giant_segment():
    """One gaussian owning almost every slot exercises the carry chain."""
    rng = np.random.default_rng(1)
    n, m = 3, 4 * segsum.BBLK
    ids = np.sort(
        np.concatenate([[0], np.full(m - 2, 1), [2]])
    ).astype(np.int32)
    grads = tuple(rng.normal(size=m).astype(np.float32) for _ in range(10))
    out = np.asarray(
        segsum.segment_sum_sorted(jnp.asarray(ids), tuple(map(jnp.asarray, grads)), n)
    )
    for i, g in enumerate(grads):
        ref = np.bincount(ids, weights=g, minlength=n)[:n]
        np.testing.assert_allclose(out[i], ref, rtol=2e-5, atol=2e-4)


def test_overflow_tail_gaussians_zero():
    """Under capacity overflow tail gaussians own no slot; their sums must
    read zero (pre-zeroed output), not uninitialized memory."""
    rng = np.random.default_rng(2)
    n, m = 5000, max(8 * segsum.BBLK, 4096)  # m must cover ids 0..1999
    ids = np.sort(rng.integers(0, 2000, m)).astype(np.int32)
    ids[: 2000] = np.arange(2000)  # ids 0..1999 present, 2000.. absent
    ids = np.sort(ids)
    grads = tuple(rng.normal(size=m).astype(np.float32) for _ in range(10))
    out = np.asarray(
        segsum.segment_sum_sorted(jnp.asarray(ids), tuple(map(jnp.asarray, grads)), n)
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 2100:], 0.0)