"""SparseEncoder / backbone / neck forward-shape tests.

Mirrors the reference block tests
(tests/test_models/test_common_modules/test_middle_encoders.py:7-27) but
runs on CPU via the XLA path (no GPU gating needed).
"""
import numpy as np
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.backbones import SECOND
from msmdfusion_tpu.models.middle_encoders import (PointPillarsScatter,
                                                   SparseEncoder)
from msmdfusion_tpu.models.necks import SECONDFPN
from msmdfusion_tpu.models.voxel_encoders import PillarFeatureNet, hard_simple_vfe


def make_voxels(rng, n_valid=64, cap=128, grid=(41, 32, 32), batch=2, cin=5):
    coords = np.stack([
        rng.randint(0, batch, n_valid),
        rng.randint(0, grid[0] - 1, n_valid),
        rng.randint(0, grid[1], n_valid),
        rng.randint(0, grid[2], n_valid)], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = coords.shape[0]
    feats = rng.randn(n, cin).astype(np.float32)
    pad = cap - n
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def test_sparse_encoder_forward(rng):
    feats, coords, valid = make_voxels(rng)
    enc = SparseEncoder(
        in_channels=5, sparse_shape=(41, 32, 32), base_channels=4,
        output_channels=16,
        encoder_channels=((4, 4, 8), (8, 8, 16), (16, 16, 16), (16, 16)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        block_type='basicblock')
    variables = enc.init(jax.random.PRNGKey(0), feats, coords, valid, 2)
    bev, stages = enc.apply(variables, feats, coords, valid, 2)
    # z: 41 -> 21 -> 11 -> 5 -> conv_out (3,1,1)/(2,1,1) -> 2 ; xy: 32 -> 4
    assert bev.shape == (2, 4, 4, 32)
    assert len(stages) == 5
    assert stages[0].spatial_shape == (41, 32, 32)
    assert stages[1].spatial_shape == (21, 16, 16)
    assert stages[2].spatial_shape == (11, 8, 8)
    assert stages[3].spatial_shape == (5, 4, 4)
    assert stages[0].num_channels == 4
    assert stages[1].num_channels == 8
    assert stages[2].num_channels == 16
    assert stages[3].num_channels == 16
    assert not np.any(np.isnan(np.asarray(bev)))


def test_second_and_fpn(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    backbone = SECOND(in_channels=8, out_channels=(16, 32), layer_nums=(2, 2),
                      layer_strides=(1, 2))
    variables = backbone.init(jax.random.PRNGKey(0), x)
    outs = backbone.apply(variables, x)
    assert outs[0].shape == (2, 16, 16, 16)
    assert outs[1].shape == (2, 8, 8, 32)

    neck = SECONDFPN(in_channels=(16, 32), out_channels=(16, 16),
                     upsample_strides=(1, 2), use_conv_for_no_stride=True)
    nvars = neck.init(jax.random.PRNGKey(0), outs)
    fused = neck.apply(nvars, outs)
    assert fused[0].shape == (2, 16, 16, 32)


def test_pillar_encoder_and_scatter(rng):
    cap, p = 64, 8
    voxels = jnp.asarray(rng.randn(cap, p, 4).astype(np.float32))
    num_points = jnp.asarray(rng.randint(1, p, cap).astype(np.int32))
    coors = jnp.stack([
        jnp.asarray(rng.randint(0, 2, cap)), jnp.zeros(cap, jnp.int32),
        jnp.asarray(rng.randint(0, 8, cap)),
        jnp.asarray(rng.randint(0, 8, cap))], axis=1).astype(jnp.int32)
    pfn = PillarFeatureNet(in_channels=4, feat_channels=(16,),
                           voxel_size=(0.5, 0.5, 2.0),
                           point_cloud_range=(0, 0, 0, 4, 4, 2))
    variables = pfn.init(jax.random.PRNGKey(0), voxels, num_points, coors)
    feats = pfn.apply(variables, voxels, num_points, coors)
    assert feats.shape == (cap, 16)

    scatter = PointPillarsScatter(in_channels=16, output_shape=(8, 8))
    svars = scatter.init(jax.random.PRNGKey(0), feats, coors,
                         jnp.ones(cap, bool), 2)
    canvas = scatter.apply(svars, feats, coors, jnp.ones(cap, bool), 2)
    assert canvas.shape == (2, 8, 8, 16)


def test_hard_simple_vfe(rng):
    voxels = jnp.asarray(rng.randn(8, 4, 5).astype(np.float32))
    num_points = jnp.asarray([1, 2, 3, 4, 4, 2, 1, 0], dtype=jnp.int32)
    # zero out padded slots like the real voxelizer does
    mask = np.arange(4)[None, :] < np.asarray(num_points)[:, None]
    voxels = voxels * mask[..., None]
    out = hard_simple_vfe(voxels, num_points)
    expected = np.asarray(voxels).sum(1) / np.maximum(
        np.asarray(num_points), 1)[:, None]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def _gma_inputs(rng, k3=96, k2=64, cap3=128, cap2=96, grid=(9, 16, 16)):
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor
    f3, c3, v3 = make_voxels(rng, n_valid=k3, cap=cap3, grid=grid, batch=1,
                             cin=8)
    st3 = make_sparse_tensor(f3, c3, v3, grid, 1)
    # 2D voxels: half share coordinates with 3D voxels (mixed), half fresh
    c3v = np.asarray(st3.coords)[np.asarray(st3.valid)]
    mixed = c3v[rng.choice(len(c3v), min(len(c3v) // 2, k2 // 2),
                           replace=False)]
    fresh = np.stack([
        np.zeros(k2 - len(mixed), np.int64),
        rng.randint(0, grid[0], k2 - len(mixed)),
        rng.randint(0, grid[1], k2 - len(mixed)),
        rng.randint(0, grid[2], k2 - len(mixed))], 1)
    co = np.unique(np.concatenate([mixed, fresh]), axis=0)
    n = len(co)
    co = np.concatenate([co, -np.ones((cap2 - n, 4), np.int64)])
    va = np.arange(cap2) < n
    f2 = rng.randn(cap2, 8).astype(np.float32) * va[:, None]
    st2 = make_sparse_tensor(jnp.asarray(f2), jnp.asarray(co),
                             jnp.asarray(va), grid, 1)
    return st3, st2


def test_gma_union_capacity_equivalence(rng):
    """A union cap >= the union occupancy must not change the GMA output;
    a cap below it must fire the sparse.make.capacity[gma_union_*] counter
    (the self-evidence the bench relies on for capacity sizing)."""
    from msmdfusion_tpu.models.middle_encoders.gma_encoder import (
        SparseMultiModalEncoderPaint, modality_split)
    from msmdfusion_tpu.utils import overflow

    st3, st2 = _gma_inputs(rng)
    split = modality_split(st3, st2)
    occ = int(np.asarray(st3.valid).sum()
              + np.asarray(split['only_2d']).sum())

    def run(union_caps):
        enc = SparseMultiModalEncoderPaint(
            in_channels_3D=(8,), in_channels_2D=(8,), out_channels=(8,),
            padding=(1,), down_kernel_size=(3,), down_stride=(2,),
            stage_capacities=(64,), union_capacities=union_caps)
        args = ([st3], [st2], [16], [6.0], [32], [13.3])
        variables = enc.init(jax.random.PRNGKey(0), *args)
        return enc.apply(variables, *args)

    base = run(None)[0]
    with overflow.capture() as cap:
        tight = run((occ,))[0]
    counts = {k: int(v) for k, v in cap.counters().items()}
    assert counts.get('sparse.make.capacity[gma_union_0]', 0) == 0
    np.testing.assert_allclose(np.asarray(tight.features),
                               np.asarray(base.features)[:occ],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tight.keys),
                                  np.asarray(base.keys)[:occ])

    with overflow.capture() as cap:
        run((occ - 8,))
    counts = {k: int(v) for k, v in cap.counters().items()}
    # init + apply each execute the union build once -> 8 drops twice
    assert counts.get('sparse.make.capacity[gma_union_0]', 0) == 16
