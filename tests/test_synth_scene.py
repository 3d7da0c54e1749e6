"""Realistic synthetic scene generator (utils/synth_scene.py).

VERDICT r3 weak-4/item-3: the bench and GMA tests must run on scenes
where foreground virtual points actually coincide with occupied lidar
voxels at real-data rates (reference detectors/MSMDFusion.py:251-325
splits voxels into 3D-only / 2D-only / mixed; on real nuScenes the
mixed fraction of 2D voxels is large because virtual points sit on the
same surfaces the lidar hits). These tests gate that property.
"""
import numpy as np
import pytest

from msmdfusion_tpu.utils.synth_scene import (camera_rig, lidar_scene,
                                              realistic_batch)

PCR = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
SHAPE = dict(n=60000, v=6, m=6000, mr=5000, img_hw=(224, 416), pcr=PCR)


def _unique_voxels(p, res_xyz, grid_zyx, pcr):
    res = np.asarray(res_xyz)
    c = np.floor((p - np.asarray(pcr[:3])) / res).astype(np.int64)
    zs, ys, xs = grid_zyx
    ok = np.all(c >= 0, axis=1) & (c[:, 0] < xs) & (c[:, 1] < ys) \
        & (c[:, 2] < zs)
    c = c[ok]
    return np.unique((c[:, 2] * ys + c[:, 1]) * xs + c[:, 0])


def test_lidar_scene_structure(rng):
    pts, objects = lidar_scene(rng, 60000, PCR)
    assert pts.shape == (60000, 5)
    assert np.isfinite(pts).all()
    # radial density: many more points within 20m than beyond 40m
    r = np.linalg.norm(pts[:, :2], axis=1)
    assert (r < 20).sum() > 3 * (r > 40).sum()
    # ground plane: a large fraction of points near z = -1.8
    assert (np.abs(pts[:, 2] + 1.8) < 0.3).mean() > 0.3
    assert len(objects) >= 16


def test_camera_rig_projects_forward():
    l2i = camera_rig((224, 416), num_cams=6)
    assert l2i.shape == (6, 4, 4)
    # a point 10m in front of camera 0 (lidar +x) lands mid-image
    p = np.array([10.0, 0.0, -0.3, 1.0])
    proj = l2i[0].astype(np.float64) @ p
    u, v = proj[0] / proj[2], proj[1] / proj[2]
    assert proj[2] > 5.0
    assert 100 < u < 316 and 40 < v < 184
    # the same point is behind the BACK camera (index 3)
    assert (l2i[3].astype(np.float64) @ p)[2] < 0


def test_realistic_batch_mixed_fraction(rng):
    """The headline property: 2D voxels overlap 3D voxels > 30%."""
    batch = realistic_batch(SHAPE, b=1, seed=3)
    pts = batch['points'][0]
    fg = batch['fg']
    assert fg['fg_mask'][0].sum() > 3000, 'foreground unrealistically empty'
    fgp = fg['fg_points'][0][..., :3][fg['fg_mask'][0]]
    # stage-1 resolution of the full-scale flagship (0.075m grid here
    # scaled to the test pcr): use 0.15m voxels, the stage-2 cell size
    res = (0.15, 0.15, 0.4)
    grid = (21, 720, 720)
    v3 = _unique_voxels(pts[:, :3], res, grid, PCR)
    v2 = _unique_voxels(fgp, res, grid, PCR)
    mixed = np.intersect1d(v3, v2, assume_unique=True)
    frac = len(mixed) / max(len(v2), 1)
    assert frac > 0.3, f'mixed fraction {frac:.2f} (need > 0.3)'
    # and foreground must not be a trivial subset either: some 2D-only
    # voxels exist (virtual pixels interpolate/extrapolate surfaces)
    assert len(v2) > len(mixed)


def test_realistic_batch_shapes_and_projection(rng):
    batch, arts = realistic_batch(SHAPE, b=1, seed=1, return_artifacts=True)
    assert batch['points'].shape == (1, 60000, 5)
    assert batch['img'].shape == (1, 6, 224, 416, 3)
    fg = batch['fg']
    assert fg['fg_points'].shape == (1, 6, 6000, 15)
    assert fg['fg_pixels'].shape == (1, 6, 6000, 3)
    assert fg['fg_real_pixels'].shape == (1, 6, 5000, 3)
    assert fg['lidar2img'].shape == (1, 6, 4, 4)
    # valid virtual points re-project onto their recorded pixels
    info = arts[0]
    l2i = fg['lidar2img'][0]
    checked = 0
    for cam in range(6):
        vpt = info['virtual_points'][cam]
        vpx = info['virtual_pixel_indices'][cam]
        if not len(vpt):
            continue
        hom = np.concatenate([vpt, np.ones((len(vpt), 1))], 1)
        proj = hom @ l2i[cam].astype(np.float64).T
        uv = proj[:, :2] / proj[:, 2:3]
        err = np.abs(uv - vpx[:, :2]).max()
        assert proj[:, 2].min() > 0, 'virtual point behind its camera'
        assert err < 1e-2, f'cam {cam} reprojection err {err}'
        checked += len(vpt)
    assert checked > 500


def test_realistic_batch_feeds_voxelizer(rng):
    """End-to-end smoke: the batch flows through voxelize_mean_batch."""
    import jax
    from msmdfusion_tpu.ops.voxelize import voxelize_mean_batch
    batch = realistic_batch(SHAPE, b=1, seed=2)
    feats, coors, valid = jax.jit(
        lambda p, pm: voxelize_mean_batch(p, pm, [0.3, 0.3, 0.8], PCR,
                                          20000))(
        batch['points'], batch['points_mask'])
    assert bool(valid.any())
    assert np.isfinite(np.asarray(feats)).all()
