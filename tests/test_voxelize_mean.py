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


def test_hard_vfe_feature_augmentation(rng):
    """HardVFE: augmented channels + maxpool concat layers
    (reference voxel_encoder.py:289-491)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.voxel_encoders.voxel_encoder import HardVFE
    vfe = HardVFE(in_channels=4, feat_channels=(8, 8),
                  voxel_size=(0.4, 0.4, 8), point_cloud_range=(0, -4, -4, 8, 4, 4))
    v, p = 16, 10
    voxels = rng.randn(v, p, 4).astype(np.float32)
    nump = rng.randint(1, p + 1, v)
    coors = np.zeros((v, 4), np.int32)
    coors[:, 3] = rng.randint(0, 20, v)   # x idx
    coors[:, 2] = rng.randint(0, 20, v)   # y idx
    variables = vfe.init(jax.random.PRNGKey(0), jnp.asarray(voxels),
                         jnp.asarray(nump), jnp.asarray(coors))
    out = vfe.apply(variables, jnp.asarray(voxels), jnp.asarray(nump),
                    jnp.asarray(coors))
    assert out.shape == (v, 8)
    assert np.isfinite(np.asarray(out)).all()
    # padding invariance: junk in masked slots must not change the output
    voxels2 = voxels.copy()
    for i in range(v):
        voxels2[i, nump[i]:] = 999.0
    out2 = vfe.apply(variables, jnp.asarray(voxels2), jnp.asarray(nump),
                     jnp.asarray(coors))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_dynamic_vfe_scatter_gather(rng):
    """DynamicVFE: voxel pooling + gather-back concat between layers
    (reference voxel_encoder.py:89-288)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.voxel_encoders.voxel_encoder import DynamicVFE
    vfe = DynamicVFE(in_channels=4, feat_channels=(8, 8),
                     voxel_size=(0.4, 0.4, 8),
                     point_cloud_range=(0, -4, -4, 8, 4, 4))
    n = 100
    pts = np.concatenate([
        rng.uniform(0, 8, (n, 1)), rng.uniform(-4, 4, (n, 2)),
        rng.rand(n, 1)], 1).astype(np.float32)
    from msmdfusion_tpu.ops.voxelize import compute_voxel_coords
    coords, inb, _ = compute_voxel_coords(
        jnp.asarray(pts), (0.4, 0.4, 8), (0, -4, -4, 8, 4, 4))
    valid = jnp.asarray(inb)
    variables = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts), coords,
                         valid, 64)
    vf, vc, vv = vfe.apply(variables, jnp.asarray(pts), coords, valid, 64)
    assert vf.shape == (64, 8) and vc.shape == (64, 3)
    assert np.asarray(vv).sum() > 0
    assert np.isfinite(np.asarray(vf)).all()
    # invalid slots are zeroed
    inv = ~np.asarray(vv)
    if inv.any():
        assert np.abs(np.asarray(vf)[inv]).max() == 0
