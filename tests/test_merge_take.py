"""merge_take_rows: MXU one-hot slab gather for two-run-monotone indices.

Oracle: plain ``table[idx] (+ table[idx2] where dup)``. The kernel path is
exercised in Pallas interpret mode (CPU); the two-run index streams are
built exactly the way the production callers build them — a stable
key-sort over the concatenation of two key-sorted halves
(make_sparse_tensor unions) and the ``order[hp]`` / ``order[hp+1]``
subsequences (sparse_add).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from msmdfusion_tpu.ops.sparse.merge_take import (INT_MAX, _merge_take_fwd,
                                                  merge_take_rows)


def _two_run_order(rng, n_a, n_b, n_valid_a=None, n_valid_b=None):
    """Stable-sort order over concat of two key-sorted halves."""
    n_valid_a = n_a if n_valid_a is None else n_valid_a
    n_valid_b = n_b if n_valid_b is None else n_valid_b
    ka = np.sort(rng.choice(10 ** 6, n_valid_a, replace=False))
    kb = np.sort(rng.choice(10 ** 6, n_valid_b, replace=False))
    keys = np.concatenate([ka, np.full(n_a - n_valid_a, INT_MAX),
                           kb, np.full(n_b - n_valid_b, INT_MAX)])
    order = np.argsort(keys, kind='stable').astype(np.int32)
    return keys, order


@pytest.mark.parametrize('n_a,n_b,c', [(700, 500, 40), (1300, 900, 160)])
def test_single_stream_matches_gather(n_a, n_b, c):
    rng = np.random.RandomState(0)
    keys, order = _two_run_order(rng, n_a, n_b, n_a - 60, n_b - 45)
    table = rng.randn(n_a + n_b, c).astype(np.float32)
    out = _merge_take_fwd(jnp.asarray(table), jnp.asarray(order), n_a,
                          None, None, 'test', True)
    ref = table[order]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=3e-5)


def test_dup_stream_matches_sparse_add_pattern():
    rng = np.random.RandomState(1)
    n_a, n_b, c = 900, 800, 96
    # overlapping sorted key halves (the sparse_add situation)
    common = np.sort(rng.choice(10 ** 5, 300, replace=False))
    ka = np.union1d(common, rng.choice(10 ** 5, 700, replace=False))[:n_a]
    kb = np.union1d(common, rng.choice(10 ** 5, 650, replace=False))[:n_b]
    keys = np.concatenate([ka, kb])
    order = np.argsort(keys, kind='stable').astype(np.int32)
    skey = keys[order]
    head = np.concatenate([[True], skey[1:] != skey[:-1]])
    hp = np.where(head)[0]
    m = hp.shape[0]
    nxt = np.minimum(hp + 1, len(keys) - 1)
    dup = (nxt > hp) & (skey[nxt] == skey[hp])
    idx = order[hp].astype(np.int32)
    idx2 = order[nxt].astype(np.int32)
    table = rng.randn(n_a + n_b, c).astype(np.float32)
    out = _merge_take_fwd(jnp.asarray(table), jnp.asarray(idx), n_a,
                          jnp.asarray(idx2), jnp.asarray(dup), 'test',
                          True)
    ref = table[idx] + np.where(dup[:, None], table[idx2], 0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=3e-5)
    assert m >= 1000  # dedup actually happened and the size is non-trivial


def test_fallback_path_is_exact():
    rng = np.random.RandomState(2)
    table = rng.randn(300, 24).astype(np.float32)
    idx = rng.permutation(300)[:200].astype(np.int32)
    out = merge_take_rows(jnp.asarray(table), jnp.asarray(idx), 150)
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_grad_matches_gather_formulation():
    rng = np.random.RandomState(3)
    n_a, n_b, c = 600, 520, 32
    keys, order = _two_run_order(rng, n_a, n_b)
    table = jnp.asarray(rng.randn(n_a + n_b, c).astype(np.float32))
    idx = jnp.asarray(order)
    cot = jnp.asarray(rng.randn(order.shape[0], c).astype(np.float32))

    def f_kernel(t):
        return jnp.vdot(merge_take_rows(t, idx, n_a, interpret=True), cot)

    def f_ref(t):
        return jnp.vdot(t[idx], cot)

    g_k = jax.grad(f_kernel)(table)
    g_r = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-6, atol=1e-6)


def test_window_violation_counted_not_silent(monkeypatch):
    """Non-two-run indices: rows outside the window zero + count."""
    from msmdfusion_tpu.utils import overflow
    rng = np.random.RandomState(4)
    n = 4096
    table = rng.randn(n, 16).astype(np.float32)
    idx = rng.permutation(n).astype(np.int32)    # arbitrary permutation
    with overflow.capture() as cap:
        out = _merge_take_fwd(jnp.asarray(table), jnp.asarray(idx), n // 2,
                              None, None, 'viol', True)
        counts = cap.counters()
    dropped = int(np.asarray(counts['merge_take.win[viol]']))
    ref = table[idx]
    ok = np.isclose(np.asarray(out), ref, rtol=2e-5, atol=3e-5).all(axis=1)
    # every mismatching row must be accounted for by the counter (it is
    # zeroed, not garbage) and the counter must match the mismatch count
    bad = ~ok
    assert dropped >= bad.sum()
    assert np.abs(np.asarray(out)[bad]).max(initial=0.0) == 0.0
