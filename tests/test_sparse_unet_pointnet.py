"""SparseUNet (inverse conv decoder) + PointNet++ backbone smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.backbones import PointNet2SASSG
from msmdfusion_tpu.models.middle_encoders import SparseUNet
from msmdfusion_tpu.ops.sparse.conv import (downsample_out_coords,
                                            inverse_conv, sparse_conv)
from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor


def make_voxels(rng, n_valid=64, cap=128, grid=(21, 16, 16), batch=2, cin=4):
    coords = np.stack([
        rng.randint(0, batch, n_valid),
        rng.randint(0, grid[0], n_valid),
        rng.randint(0, grid[1], n_valid),
        rng.randint(0, grid[2], n_valid)], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = coords.shape[0]
    feats = rng.randn(n, cin).astype(np.float32)
    coords = np.concatenate([coords, -np.ones((cap - n, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((cap - n, cin), np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(cap - n, bool)])
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def test_inverse_conv_restores_coords(rng):
    feats, coords, valid = make_voxels(rng, grid=(8, 8, 8))
    st = make_sparse_tensor(feats, coords, valid, (8, 8, 8), 2)
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, 3, 2, 1, capacity=128)
    w_down = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.1)
    down = sparse_conv(st, w_down, out_keys, out_coords, out_valid,
                       out_shape, 3, 2, 1)
    w_up = jnp.asarray(rng.randn(27, 8, 4).astype(np.float32) * 0.1)
    up = inverse_conv(down, w_up, st.keys, st.coords, st.valid,
                      st.spatial_shape, 3, 2, 1)
    # output coord set == original input coord set
    np.testing.assert_array_equal(np.asarray(up.coords),
                                  np.asarray(st.coords))
    assert up.num_channels == 4
    got = np.asarray(up.features)[np.asarray(up.valid)]
    assert np.abs(got).sum() > 0
    assert np.isfinite(got).all()


def test_sparse_unet_forward(rng):
    feats, coords, valid = make_voxels(rng, grid=(21, 16, 16), cin=4)
    unet = SparseUNet(
        in_channels=4, sparse_shape=(21, 16, 16), base_channels=4,
        output_channels=8,
        encoder_channels=((4,), (8, 8, 8), (8, 8, 8)),
        encoder_paddings=((1,), (1, 1, 1), (1, 1, 1)),
        decoder_channels=((8, 8, 8), (8, 8, 4), (4, 4, 4)))
    variables = unet.init(jax.random.PRNGKey(0), feats, coords, valid, 2)
    bev, seg = unet.apply(variables, feats, coords, valid, 2)
    # z: 21 -> 11 -> 6 -> conv_out (2,1,1) -> 2; xy: 16 -> 4
    assert bev.shape[0] == 2
    assert seg.capacity == feats.shape[0]
    assert seg.spatial_shape == (21, 16, 16)
    assert np.isfinite(np.asarray(bev)).all()


def test_pointnet2_backbone(rng):
    pts = jnp.asarray(rng.randn(2, 128, 4).astype(np.float32))
    mask = jnp.ones((2, 128), bool)
    net = PointNet2SASSG(
        in_channels=4, num_points=(32, 16), radius=(0.8, 1.2),
        num_samples=(8, 8), sa_channels=((8, 8), (8, 16)),
        fp_channels=((16, 8),))
    variables = net.init(jax.random.PRNGKey(0), pts, mask)
    out = net.apply(variables, pts, mask)
    assert out['fp_xyz'].shape == (2, 32, 3)
    assert out['fp_features'].shape == (2, 32, 8)
