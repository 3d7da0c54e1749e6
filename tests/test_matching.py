"""Auction LAP vs scipy optimal assignment."""
import numpy as np
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from msmdfusion_tpu.ops.matching import assign_proposals, auction_assign


def total_cost(cost, row_for_col, valid):
    return sum(cost[r, c] for c, r in enumerate(row_for_col)
               if valid[c] and r >= 0)


def test_auction_matches_scipy_optimal(rng):
    for trial in range(5):
        r, c = 40, 12
        cost = rng.randn(r, c).astype(np.float32) * 3
        valid = np.ones(c, bool)
        got = np.asarray(auction_assign(jnp.asarray(cost),
                                        jnp.asarray(valid)))
        # all valid cols assigned, rows distinct
        assert np.all(got >= 0)
        assert len(set(got.tolist())) == c
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        mine = total_cost(cost, got, valid)
        assert mine <= opt + 1e-2 * max(1.0, abs(opt)), (trial, mine, opt)


def test_auction_partial_valid(rng):
    r, c = 16, 8
    cost = rng.randn(r, c).astype(np.float32)
    valid = np.zeros(c, bool)
    valid[:3] = True
    got = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    assert np.all(got[3:] == -1)
    assert np.all(got[:3] >= 0)
    assert len(set(got[:3].tolist())) == 3


def test_auction_no_valid(rng):
    cost = rng.randn(8, 4).astype(np.float32)
    got = np.asarray(auction_assign(jnp.asarray(cost),
                                    jnp.zeros(4, dtype=bool)))
    assert np.all(got == -1)


def test_assign_proposals_inverse_view(rng):
    r, c = 10, 4
    cost = rng.randn(r, c).astype(np.float32)
    valid = np.ones(c, bool)
    assigned = np.asarray(assign_proposals(jnp.asarray(cost),
                                           jnp.asarray(valid)))
    # exactly c proposals hold a gt, each gt appears once
    held = assigned[assigned >= 0]
    assert len(held) == c
    assert set(held.tolist()) == set(range(c))
