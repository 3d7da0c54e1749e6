"""Fusion layer tests: aug replay, 2D transforms, bilinear sampling,
PointFusion, VoteFusion. Reference: mmdet3d/models/fusion_layers/."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmdfusion_tpu.models import fusion_layers as fl


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_apply_3d_transformation_flow_order_and_inverse(rng):
    pts = jnp.asarray(rng.randn(40, 3).astype(np.float32))
    aug = dict(angle=0.4, scale=1.2, trans=(0.5, -0.3, 0.1),
               flip_horizontal=True,
               transformation_3d_flow=['HF', 'R', 'S', 'T'])
    fwd = fl.apply_3d_transformation(pts, aug)
    back = fl.apply_3d_transformation(fwd, aug, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
    # flow order matters: T-before-R differs from R-before-T
    aug2 = dict(aug, transformation_3d_flow=['T', 'R', 'S', 'HF'])
    fwd2 = fl.apply_3d_transformation(pts, aug2)
    assert np.abs(np.asarray(fwd) - np.asarray(fwd2)).max() > 1e-3


def test_coord_and_bbox_2d_transform_round_trip(rng):
    meta = dict(img_shape=(448, 800), scale_factor=(0.5, 0.48),
                flip=True, img_crop_offset=(4.0, 6.0))
    uv = jnp.asarray(rng.uniform(0, 400, (30, 2)).astype(np.float32))
    new = fl.coord_2d_transform(meta, uv, True)
    back = fl.coord_2d_transform(meta, new, False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-4)
    boxes = np.zeros((10, 6), np.float32)
    boxes[:, :2] = rng.uniform(0, 300, (10, 2))
    boxes[:, 2:4] = boxes[:, :2] + rng.uniform(10, 50, (10, 2))
    boxes[:, 4] = rng.uniform(0, 1, 10)
    new_b = fl.bbox_2d_transform(meta, jnp.asarray(boxes), True)
    back_b = fl.bbox_2d_transform(meta, new_b, False)
    np.testing.assert_allclose(np.asarray(back_b), boxes, atol=1e-4)
    # flipped boxes stay well-formed (x1 < x2)
    nb = np.asarray(new_b)
    assert (nb[:, 0] <= nb[:, 2]).all()


def test_bilinear_sample_exact_on_linear_field(rng):
    """Bilinear interpolation reproduces a linear function exactly."""
    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = jnp.asarray(np.stack([2 * xx + 1, -3 * yy + 5], -1))
    # sample at full resolution: feature pixel centers map to image coords
    uv = jnp.asarray(np.stack([rng.uniform(2, 20, 50),
                               rng.uniform(2, 14, 50)],
                              1).astype(np.float32))
    out = np.asarray(fl.bilinear_sample(feat, uv, (h, w)))
    # img == feat resolution: x_img - 0.5 = continuous feat coord
    np.testing.assert_allclose(out[:, 0], 2 * (np.asarray(uv)[:, 0] - 0.5)
                               + 1, atol=1e-3)
    np.testing.assert_allclose(out[:, 1], -3 * (np.asarray(uv)[:, 1] - 0.5)
                               + 5, atol=1e-3)


@pytest.mark.slow
def test_vote_fusion_shapes_and_semantics(rng):
    vf = fl.VoteFusion(num_classes=4, max_imvote_per_pixel=3)
    s, b = 32, 5
    img = jnp.asarray(rng.randint(0, 255, (64, 96, 3)).astype(np.float32))
    seeds = jnp.asarray(np.stack([
        rng.uniform(-2, 2, s), rng.uniform(2, 6, s), rng.uniform(-1, 1, s)],
        1).astype(np.float32))
    k_mat = jnp.asarray(np.array(
        [[60.0, 0, 48, 0], [0, 60, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32))
    boxes = np.zeros((b, 6), np.float32)
    boxes[:, :2] = rng.uniform(0, 60, (b, 2))
    boxes[:, 2:4] = boxes[:, :2] + rng.uniform(10, 30, (b, 2))
    boxes[:, 4] = rng.uniform(0.3, 0.9, b)
    boxes[:, 5] = rng.randint(0, 4, b)
    valid = np.ones(b, bool)
    cues, mask = vf.apply({}, img, jnp.asarray(boxes), jnp.asarray(valid),
                          seeds, k_mat, (64, 96))
    assert cues.shape == (5 + 4 + 3, 3 * s)   # geo 5 + sem 4 + txt 3
    assert mask.shape == (3 * s,)
    # zero valid boxes -> all-zero geo/sem cues, mask still shaped
    cues0, mask0 = vf.apply({}, img, jnp.asarray(boxes),
                            jnp.zeros(b, bool), seeds, k_mat, (64, 96))
    assert np.abs(np.asarray(cues0[:9])).max() < 1e-5
    assert not np.asarray(mask0).any()


def test_point_fusion_runs_and_masks_offscreen(rng):
    pf = fl.PointFusion(img_channels=8, pts_channels=8, mid_channels=8,
                        out_channels=8, img_levels=(0,))
    feats = [jnp.asarray(rng.randn(2, 16, 24, 8).astype(np.float32))]
    pts = jnp.asarray(np.concatenate([
        rng.uniform(2, 10, (20, 1)),       # in front
        rng.uniform(-2, 2, (20, 2))], 1).astype(np.float32))
    pts_feats = jnp.asarray(rng.randn(20, 8).astype(np.float32))
    l2i = jnp.asarray(np.tile(np.array(
        [[60.0, 0, 48, 0], [0, 60, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32)[None], (2, 1, 1)))
    vars_ = pf.init(jax.random.PRNGKey(0), feats, pts, pts_feats, l2i,
                    (64, 96))
    out = pf.apply(vars_, feats, pts, pts_feats, l2i, (64, 96))
    assert out.shape == (20, 8)
    assert np.isfinite(np.asarray(out)).all()
