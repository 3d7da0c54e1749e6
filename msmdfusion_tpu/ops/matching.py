"""Device-native linear assignment via the auction algorithm.

TPU-native replacement for the reference's per-sample CPU
``scipy.optimize.linear_sum_assignment`` sync inside HungarianAssigner3D
(mmdet3d/core/bbox/assigners/hungarian_assigner.py:133-140). Host callbacks
are unavailable on the TPU runtime, and a per-step device->host->device
round trip would stall the pipeline anyway, so matching runs on-device:
Bertsekas' auction algorithm with epsilon scaling inside ``lax.while_loop``.
With the default schedule the assignment is optimal to within
``n * eps_final`` of the true optimum — far below the cost noise that
matters for detection target assignment — and typically exactly optimal.

Convention matches scipy on a [num_rows, num_cols] cost with
num_valid_cols <= num_rows: every valid column gets a distinct row.

Note on epsilon scaling: this is an *asymmetric* problem (rows > cols).
The classical eps-scaling trick (carry prices across stages, restart the
assignment) is only valid when unowned rows keep price zero; with carried
prices the suboptimality bound breaks (verified empirically: staged runs
landed ~10% off optimal). A single stage from zero prices keeps every
unowned row at price 0, so the n*eps bound holds — we therefore run one
stage with a small epsilon.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

NEG = -1e18


def auction_assign(cost, col_valid, eps_rel: float = 0.002,
                   max_iters: int = 2000):
    """Assign each valid column a distinct row minimizing total cost.

    Args:
        cost: [R, C] cost matrix (rows >= valid cols).
        col_valid: [C] bool.
        eps_rel: bid increment relative to cost scale; total suboptimality
            is bounded by ``eps_rel * scale``.
        max_iters: iteration cap (pathological ties may leave columns
            unassigned at the cap; callers treat -1 as background).
    Returns:
        row_for_col: [C] int32 row index per column (-1 for invalid cols).
    """
    r, c = cost.shape
    benefit = -cost.T                                  # [C, R] maximize
    benefit = jnp.where(col_valid[:, None], benefit, NEG)
    scale = jnp.maximum(
        jnp.max(jnp.where(col_valid[:, None], jnp.abs(benefit), 0)), 1.0)

    prices = jnp.zeros((r,), cost.dtype)
    row_for_col = jnp.full((c,), -1, jnp.int32)

    def run_stage(carry, eps):
        prices, row_for_col = carry

        def cond(state):
            i, prices, row_for_col = state
            unassigned = (row_for_col < 0) & col_valid
            return (i < max_iters) & jnp.any(unassigned)

        def body(state):
            i, prices, row_for_col = state
            unassigned = (row_for_col < 0) & col_valid
            values = benefit - prices[None, :]          # [C, R]
            best = jnp.argmax(values, axis=1)           # [C]
            w1 = jnp.max(values, axis=1)
            masked = values.at[jnp.arange(c), best].set(NEG)
            w2 = jnp.max(masked, axis=1)
            bid = prices[best] + (w1 - w2) + eps        # [C]
            bid = jnp.where(unassigned, bid, NEG)

            # highest bid per row wins (Jacobi parallel bidding)
            tgt = jnp.where(unassigned, best, r)        # park assigned
            row_best_bid = jax.ops.segment_max(
                bid, tgt, num_segments=r + 1)[:r]       # [R]
            won = unassigned & (bid >= row_best_bid[best]) & (bid > NEG)
            # tie-break: lowest col index wins
            winner = jax.ops.segment_min(
                jnp.where(won, jnp.arange(c, dtype=jnp.int32), c), tgt,
                num_segments=r + 1)[:r]
            won = won & (winner[best] == jnp.arange(c))

            new_prices = jnp.where(
                (winner < c) & (row_best_bid > NEG),
                jnp.maximum(prices, row_best_bid), prices)
            # rows taken over: previous owner becomes unassigned
            taken = jnp.zeros((r,), bool).at[jnp.where(won, best, r)].set(
                True, mode='drop')
            owns_taken = (row_for_col >= 0) & taken[jnp.maximum(
                row_for_col, 0)]
            row_for_col = jnp.where(owns_taken, -1, row_for_col)
            row_for_col = jnp.where(won, best, row_for_col)
            return i + 1, new_prices, row_for_col

        _, prices, row_for_col = jax.lax.while_loop(
            cond, body, (jnp.int32(0), prices, row_for_col))
        return (prices, row_for_col), None

    (prices, row_for_col), _ = run_stage(
        (prices, row_for_col), eps_rel * scale / c)
    return jnp.where(col_valid, row_for_col, -1)


@partial(jax.jit, static_argnames=())
def assign_proposals(cost, col_valid):
    """Returns (assigned_col per row [R] int32 or -1).

    Inverse view of auction_assign for detector heads: rows are proposals,
    columns are GTs; each valid GT claims one proposal.
    """
    r, c = cost.shape
    row_for_col = auction_assign(cost, col_valid)
    assigned = jnp.full((r,), -1, jnp.int32)
    ok = row_for_col >= 0
    assigned = assigned.at[jnp.where(ok, row_for_col, r)].set(
        jnp.where(ok, jnp.arange(c, dtype=jnp.int32), -1), mode='drop')
    return assigned
