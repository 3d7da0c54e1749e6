"""Fused voxelize_mean_batch vs the hard-voxelize + mean-VFE reference path."""
import numpy as np
import jax.numpy as jnp

from msmdfusion_tpu.ops.voxelize import voxelize_batch, voxelize_mean_batch
from msmdfusion_tpu.models.voxel_encoders import hard_simple_vfe

VS = (0.5, 0.5, 0.5)
PCR = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)


def test_fused_matches_two_step(rng):
    pts = rng.uniform(0, 4, size=(2, 200, 5)).astype(np.float32)
    pts[..., 2] *= 0.5
    mask = np.ones((2, 200), bool)
    # two-step path (max_points high enough to avoid truncation)
    voxels, num_points, coors, valid = voxelize_batch(
        pts, mask, VS, PCR, max_points=64, max_voxels=256)
    feats_ref = np.asarray(hard_simple_vfe(voxels, num_points))
    coors_ref = np.asarray(coors)
    valid_ref = np.asarray(valid)
    ref = {tuple(c): f for c, f, v in zip(coors_ref, feats_ref, valid_ref)
           if v}

    feats, coors2, valid2 = voxelize_mean_batch(pts, mask, VS, PCR, 512)
    feats, coors2, valid2 = map(np.asarray, (feats, coors2, valid2))
    got = {tuple(c): f for c, f, v in zip(coors2, feats, valid2) if v}
    assert set(got) == set(ref)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-5, atol=1e-6)
    # fused output must be ascending in (b, z, y, x) pack order
    packed = [(c[0], c[1], c[2], c[3]) for c in coors2[valid2]]
    assert packed == sorted(packed)


def test_fused_empty_input(rng):
    pts = np.full((1, 50, 5), 100.0, np.float32)  # all out of range
    feats, coors, valid = voxelize_mean_batch(
        pts, np.ones((1, 50), bool), VS, PCR, 64)
    assert not np.asarray(valid).any()
    assert np.asarray(feats).sum() == 0
