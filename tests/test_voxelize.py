"""Voxelization golden tests vs a numpy first-come oracle.

Mirrors the oracle-cross-check style of the reference
tests/test_models/test_voxel_encoder/test_voxelize.py:15-70.
"""
import numpy as np
import jax
import jax.numpy as jnp

from msmdfusion_tpu.ops.voxelize import (dynamic_scatter, dynamic_voxelize,
                                         hard_voxelize, voxelize_batch)

VOXEL_SIZE = (0.5, 0.5, 0.5)
PC_RANGE = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)


def numpy_hard_voxelize(points, voxel_size, pc_range, max_points, max_voxels):
    """First-come-first-serve oracle (reference voxelization_cuda.cu:106-150)."""
    vs = np.asarray(voxel_size)
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    grid = np.round((hi - lo) / vs).astype(int)
    voxel_map = {}
    voxels = np.zeros((max_voxels, max_points, points.shape[1]), np.float32)
    coors = -np.ones((max_voxels, 3), np.int32)
    num_points = np.zeros((max_voxels,), np.int32)
    for p in points:
        c = np.floor((p[:3] - lo) / vs).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = tuple(c[::-1])  # (z, y, x)
        if key not in voxel_map:
            if len(voxel_map) >= max_voxels:
                continue
            voxel_map[key] = len(voxel_map)
            coors[voxel_map[key]] = key
        vid = voxel_map[key]
        if num_points[vid] < max_points:
            voxels[vid, num_points[vid]] = p
            num_points[vid] += 1
    return voxels, num_points, coors, len(voxel_map)


def test_hard_voxelize_matches_oracle(rng):
    points = rng.uniform(-0.5, 4.5, size=(200, 5)).astype(np.float32)
    mask = np.ones(200, bool)
    max_points, max_voxels = 4, 64
    res = jax.jit(
        lambda p, m: hard_voxelize(p, m, VOXEL_SIZE, PC_RANGE, max_points,
                                   max_voxels))(points, mask)
    ref_voxels, ref_num, ref_coors, n_vox = numpy_hard_voxelize(
        points, VOXEL_SIZE, PC_RANGE, max_points, max_voxels)
    np.testing.assert_array_equal(np.asarray(res.num_points), ref_num)
    np.testing.assert_array_equal(np.asarray(res.coors), ref_coors)
    np.testing.assert_allclose(np.asarray(res.voxels), ref_voxels, rtol=1e-6)
    assert int(res.valid.sum()) == n_vox


def test_hard_voxelize_respects_point_mask(rng):
    points = rng.uniform(0, 4, size=(100, 4)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:10] = True
    res = hard_voxelize(points, mask, VOXEL_SIZE, PC_RANGE, 8, 32)
    in_range = int((points[:10, 2] < 2.0).sum())  # z-range caps at 2.0
    assert int(res.num_points.sum()) == in_range


def test_voxel_truncation(rng):
    # all points into one voxel -> capped at max_points
    points = np.tile(np.array([[0.1, 0.1, 0.1, 1.0]], np.float32), (50, 1))
    res = hard_voxelize(points, np.ones(50, bool), VOXEL_SIZE, PC_RANGE, 5, 8)
    assert int(res.num_points[0]) == 5
    assert int(res.valid.sum()) == 1


def test_dynamic_voxelize(rng):
    points = rng.uniform(-1, 5, size=(100, 4)).astype(np.float32)
    coords, valid = dynamic_voxelize(points, np.ones(100, bool), VOXEL_SIZE,
                                     PC_RANGE)
    inside = np.all((points[:, :3] >= 0) & (points[:, :3] < [4, 4, 2]), axis=1)
    np.testing.assert_array_equal(np.asarray(valid), inside)
    assert np.all(np.asarray(coords)[~inside] == -1)


def test_dynamic_scatter_mean(rng):
    points = rng.uniform(0, 4, size=(64, 4)).astype(np.float32)
    coords, valid = dynamic_voxelize(points, np.ones(64, bool), VOXEL_SIZE,
                                     PC_RANGE)
    grid = (4, 8, 8)
    feats, vcoors, vvalid, p2v = dynamic_scatter(points, coords, valid, grid,
                                                 max_voxels=64, mode='mean')
    # oracle
    agg = {}
    for p, c, v in zip(points, np.asarray(coords), np.asarray(valid)):
        if not v:
            continue
        agg.setdefault(tuple(c), []).append(p)
    feats = np.asarray(feats)
    vcoors = np.asarray(vcoors)
    for i in range(int(np.asarray(vvalid).sum())):
        key = tuple(vcoors[i])
        expected = np.mean(agg[key], axis=0)
        np.testing.assert_allclose(feats[i], expected, rtol=1e-5)
    assert len(agg) == int(np.asarray(vvalid).sum())


def test_voxelize_batch_shapes(rng):
    pts = rng.uniform(0, 4, size=(2, 128, 5)).astype(np.float32)
    mask = np.ones((2, 128), bool)
    voxels, num_points, coors, valid = voxelize_batch(
        pts, mask, VOXEL_SIZE, PC_RANGE, max_points=4, max_voxels=32)
    assert voxels.shape == (64, 4, 5)
    assert coors.shape == (64, 4)
    coors = np.asarray(coors)
    valid = np.asarray(valid)
    assert set(np.unique(coors[valid][:, 0])) <= {0, 1}


def test_cpu_voxel_generator_matches_oracle(rng):
    """core.voxel_generator.VoxelGenerator == the per-point FCFS oracle
    (reference voxel_generator.py:85-279)."""
    from msmdfusion_tpu.core.voxel_generator import VoxelGenerator
    pts = rng.uniform(0, 4, (500, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 2, 500)
    gen = VoxelGenerator(VOXEL_SIZE, PC_RANGE, max_num_points=5,
                         max_voxels=64)
    voxels, coords, nump = gen.generate(pts)
    ov, on, oc, n = numpy_hard_voxelize(pts, VOXEL_SIZE, PC_RANGE, 5, 64)
    assert voxels.shape[0] == min(n, 64)
    np.testing.assert_array_equal(coords, oc[:voxels.shape[0]])
    np.testing.assert_array_equal(nump, on[:voxels.shape[0]])
    np.testing.assert_allclose(voxels, ov[:voxels.shape[0]], atol=1e-6)
