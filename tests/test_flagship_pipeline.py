"""Flagship multimodal (LC) pipeline end-to-end: synthetic nuScenes-style
artifacts on disk -> full image + foreground pipeline -> 2 train steps via
tools/train.py.

Covers the gap the reference exercises through
configs/MSMDFusion_nusc_voxel_LC.py:27-101 (LoadMultiViewImageFromFiles,
MyResize/MyNormalize/MyPad, LoadForeground2D(+MultiSweeps), aug replay,
PadForeground2D) — previously the flagship config inherited a LiDAR-only
pipeline and would KeyError on batch['img'].
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG_TEMPLATE = '''
point_cloud_range = [-4.8, -4.8, -4.0, 4.8, 4.8, 4.0]
voxel_size = [0.3, 0.3, 0.2]
img_scale = (64, 32)
class_names = ['car', 'truck', 'construction_vehicle', 'bus', 'trailer',
               'barrier', 'motorcycle', 'bicycle', 'pedestrian',
               'traffic_cone']
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=2,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadAnnotations3D'),
    dict(type='LoadMultiViewImageFromFiles'),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.785, 0.785],
         scale_ratio_range=[0.9, 1.1], translation_std=[0.1, 0.1, 0.1]),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='LoadForeground2D', dataset='NuScenesDataset'),
    dict(type='LoadForeground2DFromMultiSweeps', dataset='NuScenesDataset',
         sweeps_num=2),
    dict(type='GlobalRotTransFilterForeground2D',
         point_cloud_range=point_cloud_range),
    dict(type='MyResize', img_scale=img_scale, keep_ratio=True),
    dict(type='MyNormalize', **img_norm_cfg),
    dict(type='MyPad', size_divisor=32),
    dict(type='ImgScaleCropFlipForeground2D'),
    dict(type='ShuffleForeground2D'),
    dict(type='PadPoints', max_points=512),
    dict(type='PadGroundTruth', max_gt=8),
    dict(type='PadForeground2D', max_points=64, max_real_points=32),
    dict(type='FormatBundle3D', class_names=class_names),
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=1,
    train=dict(type='NuScenesDataset', data_root='{root}',
               ann_file='{root}/infos.pkl', pipeline=train_pipeline,
               classes=class_names,
               modality=dict(use_lidar=True, use_camera=True),
               test_mode=False, box_type_3d='LiDAR'))
model = dict(
    type='MSMDFusionDetector',
    freeze_img=True,
    spatial_shapes=[[41, 16, 16], [21, 8, 8], [11, 4, 4], [5, 2, 2]],
    downscale_factors=[1, 2, 4, 8],
    fps_num_list=[16, 16, 16, 16],
    radius_list=[6, 3, 2, 1],
    max_cluster_samples_list=[8, 8, 8, 8],
    dist_thresh_list=[13.3, 6.6, 3.3, 1.6],
    fg_max_voxels=[64, 64, 64, 64],
    img_backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
    img_neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=256, num_outs=5),
    pts_voxel_layer=dict(max_num_points=4, voxel_size=voxel_size,
                         max_voxels=(256, 256),
                         point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=5, sparse_shape=[41, 16, 16],
        base_channels=16, output_channels=32,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 64), (64, 64)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        block_type='basicblock'),
    multimodal_middle_encoder=dict(
        type='SparseMultiModalEncoderPaint',
        in_channels_3D=(16, 32, 64, 64), in_channels_2D=(64, 64, 64, 64),
        out_channels=(32, 64, 64, 64), padding=(1, 1, (0, 1, 1), 0)),
    pts_backbone=dict(type='SECOND', in_channels=192, out_channels=[32, 64],
                      layer_nums=[1, 1], layer_strides=[1, 2]),
    pts_neck=dict(type='SECONDFPN', in_channels=[32, 64],
                  out_channels=[32, 32], upsample_strides=[1, 2],
                  use_conv_for_no_stride=True),
    pts_bbox_head=dict(
        type='TransFusionHead', num_proposals=4, auxiliary=True,
        in_channels=64, hidden_channel=32, num_classes=10,
        num_decoder_layers=1, num_heads=4, nms_kernel_size=3,
        ffn_channel=64, dropout=0.0,
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(type='TransFusionBBoxCoder',
                        pc_range=point_cloud_range[:2],
                        voxel_size=voxel_size[:2], out_size_factor=8,
                        post_center_range=[-10, -10, -10, 10, 10, 10],
                        score_threshold=0.0, code_size=10)),
    train_cfg=dict(pts=dict(
        dataset='nuScenes',
        assigner=dict(type='HungarianAssigner3D',
                      cls_cost=dict(gamma=2, alpha=0.25, weight=0.15),
                      reg_cost=dict(weight=0.25),
                      iou_cost=dict(weight=0.25)),
        pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
        grid_size=[16, 16, 40], voxel_size=voxel_size, out_size_factor=8,
        code_weights=[1.0] * 8 + [0.2, 0.2],
        point_cloud_range=point_cloud_range)),
    test_cfg=dict(pts=dict(dataset='nuScenes', grid_size=[16, 16, 40],
                           out_size_factor=8,
                           pc_range=point_cloud_range[:2],
                           voxel_size=voxel_size[:2], nms_type=None)))
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10))
lr_config = dict(policy='step', warmup='linear', warmup_iters=5,
                 warmup_ratio=0.1, step=[1])
total_epochs = 1
log_config = dict(interval=1)
freeze_lidar_components = False
'''

from msmdfusion_tpu.datasets.nuscenes import CAM_ORDER


def _write_fg_artifact(path, rng, n_virtual=20, n_real=10):
    """FOREGROUND_MIXED_6NN_WITH_DEPTH layout: per-camera lists of
    [N, 3+11] pixel index blocks (x, y, depth, one-hot label) and [N, 3]
    point sets (reference my_loading_multi_proj.py:50-120)."""
    info = dict(virtual_pixel_indices=[], real_pixel_indices=[],
                virtual_points=[], real_points=[])
    for _ in range(6):
        vp = np.concatenate([
            rng.uniform(0, 60, (n_virtual, 2)),
            rng.uniform(1, 40, (n_virtual, 1)),
            np.eye(11)[rng.randint(0, 11, n_virtual)]], 1).astype(np.float32)
        rp = np.concatenate([
            rng.uniform(0, 60, (n_real, 2)),
            rng.uniform(1, 40, (n_real, 1)),
            np.eye(11)[rng.randint(0, 11, n_real)]], 1).astype(np.float32)
        info['virtual_pixel_indices'].append(vp)
        info['real_pixel_indices'].append(rp)
        info['virtual_points'].append(
            rng.uniform(-4, 4, (n_virtual, 3)).astype(np.float32))
        info['real_points'].append(
            rng.uniform(-4, 4, (n_real, 3)).astype(np.float32))
    np.save(path, np.asarray(info, dtype=object))


@pytest.fixture
def multimodal_dataset(tmp_path, rng):
    from PIL import Image
    lidar_dir = tmp_path / 'samples' / 'LIDAR_TOP'
    fg_dir = tmp_path / 'samples' / 'FOREGROUND_MIXED_6NN_WITH_DEPTH'
    img_dir = tmp_path / 'samples' / 'CAM'
    for d in (lidar_dir, fg_dir, img_dir):
        d.mkdir(parents=True)
    infos = []
    for i in range(4):
        pts = np.concatenate([
            rng.uniform(-4.5, 4.5, (300, 2)),
            rng.uniform(-3.5, 3.5, (300, 1)),
            rng.uniform(0, 1, (300, 2))], axis=1).astype(np.float32)
        pts_path = lidar_dir / f's{i}.bin'
        pts.tofile(str(pts_path))
        _write_fg_artifact(str(fg_dir / f's{i}.bin.pkl.npy')[:-4], rng)
        cams = {}
        for cam in CAM_ORDER:
            img_path = img_dir / f's{i}_{cam}.png'
            Image.fromarray(
                rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            ).save(str(img_path))
            cams[cam] = dict(
                data_path=str(img_path),
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.zeros(3),
                cam_intrinsic=np.diag([60.0, 60.0, 1.0]))
        n_gt = int(rng.randint(1, 4))
        boxes = np.zeros((n_gt, 7), np.float32)
        boxes[:, :2] = rng.uniform(-4, 4, (n_gt, 2))
        boxes[:, 2] = -1
        boxes[:, 3:6] = rng.uniform(0.5, 2.0, (n_gt, 3))
        infos.append(dict(
            token=f't{i}', lidar_path=str(pts_path), timestamp=i * 1e6,
            sweeps=[dict(data_path=str(lidar_dir / f's{max(i - 1, 0)}.bin'),
                         sensor2lidar_rotation=np.eye(3),
                         sensor2lidar_translation=np.zeros(3),
                         timestamp=(i - 1) * 1e6)],
            cams=cams, gt_boxes=boxes,
            gt_names=rng.choice(['car', 'pedestrian'], n_gt),
            gt_velocity=np.zeros((n_gt, 2), np.float32)))
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(infos=infos, metadata={}), f)
    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(CONFIG_TEMPLATE.format(root=str(tmp_path)))
    return tmp_path, str(cfg_path)


def test_multimodal_pipeline_sample(multimodal_dataset):
    """The pipeline alone produces the full device batch dict."""
    tmp_path, cfg_path = multimodal_dataset
    from msmdfusion_tpu.config import load_config
    from msmdfusion_tpu.registry import DATASETS
    import msmdfusion_tpu.datasets  # noqa: F401
    cfg = load_config(cfg_path)
    ds = DATASETS.build(dict(cfg.data['train']))
    sample = ds[0]
    assert sample['img'].shape == (6, 32, 32, 3)
    assert sample['img'].dtype == np.float32
    fg = sample['foreground']
    assert fg['fg_points'].shape == (6, 64, 15)
    assert fg['fg_pixels'].shape == (6, 64, 3)
    assert fg['fg_real_pixels'].shape == (6, 32, 3)
    assert fg['fg_mask'].any(), 'no foreground points survived the pipeline'
    assert fg['lidar2img'].shape == (6, 4, 4)
    assert sample['points'].shape == (512, 5)
    # pixel replay applied the resize scale_factor (64 -> 32 => 0.5)
    m = sample['metas']
    assert np.allclose(m['scale_factor'][:2], 0.5)


@pytest.mark.slow
def test_flagship_train_cli_two_steps(multimodal_dataset):
    tmp_path, cfg_path = multimodal_dataset
    work_dir = tmp_path / 'work'
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'train.py'), cfg_path,
         '--work-dir', str(work_dir), '--max-steps', '2'],
        capture_output=True, text=True, env=env, timeout=3000)
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = (work_dir / 'train.log').read_text()
    assert 'total_loss' in log


def test_validate_foreground_artifacts(tmp_path, rng):
    """create_data --validate-foreground checks the MDU artifact layout
    (reference README.md:44 downloadable FOREGROUND_MIXED_6NN_WITH_DEPTH)."""
    import sys
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    import importlib
    create_data = importlib.import_module('create_data')
    d = tmp_path / 'samples' / 'LIDAR_TOP'
    fg_dir = tmp_path / 'samples' / 'FOREGROUND_MIXED_6NN_WITH_DEPTH'
    fg_dir.mkdir(parents=True)
    info = dict(
        virtual_pixel_indices=[rng.rand(10, 14).astype(np.float32)
                               for _ in range(6)],
        real_pixel_indices=[rng.rand(7, 14).astype(np.float32)
                            for _ in range(6)],
        virtual_points=[rng.rand(10, 3).astype(np.float32)
                        for _ in range(6)],
        real_points=[rng.rand(7, 3).astype(np.float32) for _ in range(6)])
    np.save(str(fg_dir / 'sample0.bin.pkl.npy'),
            np.asarray(info, dtype=object), allow_pickle=True)
    n = create_data.validate_foreground_artifacts(str(tmp_path))
    assert n == 1
    # corrupt artifact: missing key must raise
    del info['real_points']
    np.save(str(fg_dir / 'sample1.bin.pkl.npy'),
            np.asarray(info, dtype=object), allow_pickle=True)
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        create_data.validate_foreground_artifacts(str(tmp_path))


def test_generate_virtual_points_tool(tmp_path, rng):
    """MVP-style artifact generator: 6NN depth lifting + unprojection
    roundtrip, output layout consumable by LoadForeground2D."""
    import sys
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    import importlib
    gvp = importlib.import_module('generate_virtual_points')

    # camera: simple pinhole looking down +z of its own frame; lidar2img
    # maps lidar (x fwd, y left, z up) -> image plane
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    intr = np.array([[fx, 0, cx, 0], [0, fy, cy, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    # lidar x (forward) becomes camera z (depth)
    ext = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                    [1, 0, 0, 0], [0, 0, 0, 1]], np.float64)
    lidar2img = intr @ ext

    # a wall of lidar points at x = 10 m, spanning the image center
    yy, zz = np.meshgrid(np.linspace(-2, 2, 30), np.linspace(-1.5, 1.5, 30))
    pts = np.stack([np.full(yy.size, 10.0), yy.ravel(), zz.ravel()], 1)
    pts = np.concatenate([pts, rng.rand(pts.shape[0], 2)], 1).astype(
        np.float32)

    cam = dict(lidar2img=lidar2img, img_hw=(480, 640),
               instances=[dict(bbox=[200, 140, 440, 340], label=3)])
    info = gvp.generate_sample_artifact(pts, [cam] * 6, num_virtual=40)

    vpx = info['virtual_pixel_indices'][0]
    rpx = info['real_pixel_indices'][0]
    vpt = info['virtual_points'][0]
    assert rpx.shape[0] > 50 and vpx.shape[0] == 40
    assert vpx.shape[1] == 14 and rpx.shape[1] == 14
    # one-hot label block set
    assert (vpx[:, 3 + 3] == 1).all() and vpx[:, 3:].sum(1).max() == 1
    # all real depths are ~10 m (the wall), so 6NN-lifted virtual points
    # must land on the wall: x ~= 10 in lidar frame
    np.testing.assert_allclose(vpt[:, 0], 10.0, atol=0.05)
    # unprojection roundtrip: re-projecting virtual points hits the pixel
    proj = gvp.project_points(vpt, lidar2img, (480, 640))
    np.testing.assert_allclose(proj['uvd'][:, :2], vpx[:, :2], atol=1e-3)

    # artifact roundtrips through the validator + the loader
    fg_dir = tmp_path / 'samples' / 'FOREGROUND_MIXED_6NN_WITH_DEPTH'
    fg_dir.mkdir(parents=True)
    np.save(str(fg_dir / 'w.bin.pkl.npy'),
            np.asarray(info, dtype=object), allow_pickle=True)
    create_data = importlib.import_module('create_data')
    assert create_data.validate_foreground_artifacts(str(tmp_path)) == 1
    from msmdfusion_tpu.datasets.pipelines.foreground import LoadForeground2D
    loader = LoadForeground2D()
    results = dict(pts_filename=str(tmp_path / 'samples' / 'LIDAR_TOP'
                                    / 'w.bin'))
    out = loader(results)['foreground2D_info']
    assert len(out['fg_pixels']) == 6
    assert out['fg_points'][0].shape[1] == 15   # xyz + 11 labels + ts
