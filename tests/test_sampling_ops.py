"""FPS / kNN / ball query / interpolation ops vs numpy oracles."""
import numpy as np
import jax.numpy as jnp

from msmdfusion_tpu.ops.sampling import (ball_query, furthest_point_sample,
                                         gather_points, group_points, knn,
                                         points_in_boxes_batch,
                                         roiaware_pool3d, three_interpolate,
                                         three_nn)


def test_fps_spreads_points(rng):
    # two clusters far apart: FPS must pick from both
    a = rng.randn(20, 3) * 0.1
    b = rng.randn(20, 3) * 0.1 + 100.0
    xyz = np.concatenate([a, b]).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 4))
    assert len(set(idx.tolist())) == 4
    picked = xyz[idx]
    assert (picked[:, 0] > 50).any() and (picked[:, 0] < 50).any()


def test_fps_respects_valid(rng):
    xyz = rng.randn(16, 3).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:5] = True
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 5,
                                           jnp.asarray(valid)))
    assert set(idx.tolist()) <= set(range(5))


def test_knn_matches_numpy(rng):
    q = rng.randn(10, 3).astype(np.float32)
    k = rng.randn(30, 3).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(k), 3)
    ref = np.argsort(((q[:, None] - k[None]) ** 2).sum(-1), axis=1)[:, :3]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), 1),
                                  np.sort(ref, 1))


def test_ball_query(rng):
    centers = np.zeros((1, 3), np.float32)
    xyz = np.array([[0.1, 0, 0], [0.2, 0, 0], [5, 0, 0], [0, 0.3, 0]],
                   np.float32)
    idx = np.asarray(ball_query(1.0, 3, jnp.asarray(xyz),
                                jnp.asarray(centers)))
    assert idx.shape == (1, 3)
    assert 2 not in idx[0]          # the far point excluded
    assert (idx[0] >= 0).all()


def test_ball_query_empty(rng):
    centers = np.zeros((1, 3), np.float32)
    xyz = np.full((4, 3), 100.0, np.float32)
    idx = np.asarray(ball_query(1.0, 2, jnp.asarray(xyz),
                                jnp.asarray(centers)))
    assert (idx == -1).all()


def test_three_interpolate(rng):
    key = rng.randn(20, 3).astype(np.float32)
    feats = rng.randn(20, 4).astype(np.float32)
    # query exactly at key positions -> interpolation returns that feature
    d2, idx = three_nn(jnp.asarray(key[:5]), jnp.asarray(key))
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, d2))
    np.testing.assert_allclose(out, feats[:5], rtol=1e-3, atol=1e-4)


def test_points_in_boxes_batch(rng):
    boxes = np.array([[[0, 0, 0, 2, 2, 2, 0]]], np.float32)
    pts = np.array([[[0, 0, 1], [0, 0, 3], [0.9, 0.9, 0.1],
                     [1.1, 0, 1]]], np.float32)
    m = np.asarray(points_in_boxes_batch(jnp.asarray(pts),
                                         jnp.asarray(boxes)))
    np.testing.assert_array_equal(m[0, :, 0], [True, False, True, False])


def test_roiaware_pool3d(rng):
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 2, 100)
    feats = rng.randn(100, 8).astype(np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    out = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                     jnp.asarray(boxes), (4, 4, 4)))
    assert out.shape == (1, 4, 4, 4, 8)
    assert np.isfinite(out).all()
