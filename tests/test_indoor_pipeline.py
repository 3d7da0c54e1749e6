"""Indoor data pipeline: transforms, readers, configs, real-scan e2e.

Covers the reference indoor pipeline surface
(mmdet3d/datasets/pipelines/__init__.py:11-14: IndoorPointSample,
PointSegClassMapping, NormalizePointsColor, BackgroundPointsFilter,
VoxelBasedPointSampler) and the ScanNet/SUNRGBD readers, including the
real SUNRGBD scan shipped with the reference demo."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUNRGBD_BIN = '/root/reference/demo/sunrgbd_000017.bin'


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_indoor_point_sample_downsamples_and_aligns_masks(rng):
    from msmdfusion_tpu.datasets.pipelines.indoor import IndoorPointSample
    pts = rng.randn(100, 4).astype(np.float32)
    res = dict(points=pts, pts_semantic_mask=np.arange(100),
               pts_instance_mask=np.arange(100) * 2)
    out = IndoorPointSample(num_points=40)(res)
    assert out['points'].shape == (40, 4)
    assert out['points_mask'].shape == (40,) and out['points_mask'].all()
    # masks follow the same choice indices
    rows = out['pts_semantic_mask']
    assert np.array_equal(out['pts_instance_mask'], rows * 2)
    # upsample path (replace=True)
    out2 = IndoorPointSample(num_points=150)(dict(points=pts[:10]))
    assert out2['points'].shape == (150, 4)


def test_point_seg_class_mapping_matches_reference_semantics():
    from msmdfusion_tpu.datasets.pipelines.indoor import PointSegClassMapping
    valid = (3, 5, 9)
    m = PointSegClassMapping(valid_cat_ids=valid)
    raw = np.array([3, 4, 5, 9, 0, 40, 9])
    out = m(dict(pts_semantic_mask=raw.copy()))['pts_semantic_mask']
    # valid ids -> their index; everything else -> len(valid)
    assert out.tolist() == [0, 3, 1, 2, 3, 3, 2]


def test_normalize_points_color():
    from msmdfusion_tpu.datasets.pipelines.indoor import NormalizePointsColor
    pts = np.ones((4, 6), np.float32)
    out = NormalizePointsColor([128.0, 64.0, 256.0])(
        dict(points=pts.copy()))['points']
    np.testing.assert_allclose(out[:, 3], 1 - 0.5)
    np.testing.assert_allclose(out[:, 4], 1 - 0.25)
    np.testing.assert_allclose(out[:, 5], 0.0)
    np.testing.assert_allclose(out[:, :3], 1.0)


def test_background_points_filter():
    from msmdfusion_tpu.datasets.pipelines.indoor import \
        BackgroundPointsFilter
    # box at origin 2x2x2 (bottom z=-1); enlarge by 2m each side
    boxes = np.array([[0, 0, -1, 2, 2, 2, 0]], np.float32)
    pts = np.array([
        [0, 0, 0],      # inside the box -> kept (foreground)
        [1.5, 0, 0],    # in enlarged only -> dropped
        [5, 5, 0],      # far outside -> kept
    ], np.float32)
    res = dict(points=pts, gt_bboxes_3d=boxes,
               pts_semantic_mask=np.array([1, 2, 3]))
    out = BackgroundPointsFilter(bbox_enlarge_range=2.0)(res)
    assert out['points'].shape[0] == 2
    assert out['pts_semantic_mask'].tolist() == [1, 3]
    np.testing.assert_allclose(out['points'],
                               np.array([[0, 0, 0], [5, 5, 0]]))


def test_voxel_based_point_sampler(rng):
    from msmdfusion_tpu.datasets.pipelines.indoor import \
        VoxelBasedPointSampler
    pts = np.concatenate([
        rng.uniform(0, 4, (200, 3)),
        np.repeat([[0.0], [1.0]], 100, axis=0)], axis=1).astype(np.float32)
    sem = np.arange(200).astype(np.float32)
    sampler = VoxelBasedPointSampler(
        cur_sweep_cfg=dict(voxel_size=[0.5, 0.5, 0.5],
                           point_cloud_range=[0, 0, 0, 4, 4, 4],
                           max_num_points=1, max_voxels=64),
        prev_sweep_cfg=dict(voxel_size=[0.5, 0.5, 0.5],
                            point_cloud_range=[0, 0, 0, 4, 4, 4],
                            max_num_points=1, max_voxels=32),
        time_dim=3)
    out = sampler(dict(points=pts.copy(), pts_semantic_mask=sem.copy()))
    assert out['points'].shape == (96, 4)
    assert out['pts_semantic_mask'].shape == (96,)


def test_shift_height_loading(tmp_path):
    from msmdfusion_tpu.datasets.pipelines.loading import LoadPointsFromFile
    pts = np.zeros((100, 6), np.float32)
    pts[:, 2] = np.linspace(0, 2, 100)
    path = tmp_path / 'scan.bin'
    pts.tofile(str(path))
    out = LoadPointsFromFile(coord_type='DEPTH', shift_height=True,
                             load_dim=6, use_dim=[0, 1, 2])(
        dict(pts_filename=str(path)))
    assert out['points'].shape == (100, 4)
    floor = np.percentile(pts[:, 2], 0.99)
    np.testing.assert_allclose(out['points'][:, 3], pts[:, 2] - floor,
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def _write_scannet_infos(tmp_path, rng, n_samples=3):
    infos = []
    for i in range(n_samples):
        pts = np.concatenate([
            rng.uniform(-3, 3, (500, 3)),
            rng.uniform(0, 1, (500, 3))], axis=1).astype(np.float32)
        pts_path = f'points/scene{i}.bin'
        os.makedirs(tmp_path / 'points', exist_ok=True)
        pts.tofile(str(tmp_path / pts_path))
        ins_path = f'instance_mask/scene{i}.bin'
        sem_path = f'semantic_mask/scene{i}.bin'
        os.makedirs(tmp_path / 'instance_mask', exist_ok=True)
        os.makedirs(tmp_path / 'semantic_mask', exist_ok=True)
        rng.randint(0, 5, 500).astype(np.int64).tofile(
            str(tmp_path / ins_path))
        rng.choice([3, 4, 5, 0, 39], 500).astype(np.int64).tofile(
            str(tmp_path / sem_path))
        n_gt = int(rng.randint(1, 4))
        boxes = np.zeros((n_gt, 6), np.float32)
        boxes[:, :3] = rng.uniform(-2, 2, (n_gt, 3))
        boxes[:, 3:6] = rng.uniform(0.5, 1.5, (n_gt, 3))
        infos.append(dict(
            point_cloud=dict(lidar_idx=i), pts_path=pts_path,
            pts_instance_mask_path=ins_path,
            pts_semantic_mask_path=sem_path,
            annos=dict(gt_num=n_gt, gt_boxes_upright_depth=boxes,
                       **{'class': rng.randint(0, 18, n_gt)})))
    with open(tmp_path / 'scannet_infos.pkl', 'wb') as f:
        pickle.dump(dict(infos=infos, metadata={}), f)
    return str(tmp_path / 'scannet_infos.pkl')


def test_scannet_reader_and_pipeline(tmp_path, rng):
    from msmdfusion_tpu.datasets.other_datasets import ScanNetDataset
    ann = _write_scannet_infos(tmp_path, rng)
    pipeline = [
        dict(type='LoadPointsFromFile', coord_type='DEPTH',
             shift_height=True, load_dim=6, use_dim=[0, 1, 2]),
        dict(type='LoadAnnotations3D', with_bbox_3d=True,
             with_label_3d=True, with_mask_3d=True, with_seg_3d=True),
        dict(type='PointSegClassMapping',
             valid_cat_ids=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24,
                            28, 33, 34, 36, 39)),
        dict(type='IndoorPointSample', num_points=256),
        dict(type='PadGroundTruth', max_gt=8),
        dict(type='FormatBundle3D'),
    ]
    ds = ScanNetDataset(data_root=str(tmp_path), ann_file=ann,
                        pipeline=pipeline, filter_empty_gt=False)
    sample = ds[0]
    assert sample['points'].shape == (256, 4)
    assert sample['points_mask'].all()
    assert sample['gt_bboxes_3d'].shape[-1] >= 7
    # gravity -> bottom-center conversion happened
    info = ds.data_infos[0]
    gz = info['annos']['gt_boxes_upright_depth'][0, 2]
    h = info['annos']['gt_boxes_upright_depth'][0, 5]
    ann0 = ds.get_ann_info(0)
    np.testing.assert_allclose(ann0['gt_bboxes_3d'][0, 2], gz - h / 2,
                               rtol=1e-5)
    # indoor eval protocol runs on its own predictions
    results = [dict(bboxes=ds.get_ann_info(i)['gt_bboxes_3d'],
                    labels=ds.get_ann_info(i)['gt_labels_3d'],
                    scores=np.ones(len(ds.get_ann_info(i)['gt_labels_3d'])))
               for i in range(len(ds))]
    metrics = ds.evaluate(results)
    assert isinstance(metrics, dict) and metrics


def test_sunrgbd_reader(tmp_path, rng):
    from msmdfusion_tpu.datasets.other_datasets import SUNRGBDDataset
    pts = np.concatenate([
        rng.uniform(-3, 3, (400, 3)),
        rng.uniform(0, 1, (400, 3))], axis=1).astype(np.float32)
    os.makedirs(tmp_path / 'points', exist_ok=True)
    pts.tofile(str(tmp_path / 'points' / '000001.bin'))
    boxes = np.zeros((2, 7), np.float32)
    boxes[:, 3:6] = 1.0
    boxes[:, 6] = 0.3
    infos = [dict(point_cloud=dict(lidar_idx=1),
                  pts_path='points/000001.bin',
                  image=dict(image_idx=1, image_path='image/000001.jpg'),
                  calib=dict(K=np.eye(3), Rt=np.eye(3)),
                  annos=dict(gt_num=2, gt_boxes_upright_depth=boxes,
                             **{'class': np.array([0, 3])}))]
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(infos=infos, metadata={}), f)
    ds = SUNRGBDDataset(data_root=str(tmp_path),
                        ann_file=str(tmp_path / 'infos.pkl'),
                        pipeline=None, test_mode=True)
    info = ds.get_data_info(0)
    assert info['pts_filename'].endswith('points/000001.bin')
    ann = ds.get_ann_info(0)
    assert ann['gt_bboxes_3d'].shape == (2, 7)
    assert ann['gt_labels_3d'].tolist() == [0, 3]


# ---------------------------------------------------------------------------
# configs build + real-scan e2e
# ---------------------------------------------------------------------------

def test_indoor_configs_build():
    from msmdfusion_tpu.config import load_config
    from msmdfusion_tpu.models.builder import build_detector
    import msmdfusion_tpu.models  # noqa: F401
    for name in ('votenet_scannet.py', 'votenet_sunrgbd.py'):
        cfg = load_config(os.path.join(REPO, 'configs', name))
        model = build_detector(cfg.model)
        assert model is not None


@pytest.mark.slow
def test_votenet_on_real_sunrgbd_scan():
    """Feed the reference demo's real SUNRGBD scan through the full
    votenet_sunrgbd config (VERDICT r2 item 1): pipeline + model + decode,
    asserting finite outputs and zero overflow."""
    import jax
    from msmdfusion_tpu.config import load_config
    from msmdfusion_tpu.datasets.pipelines.loading import Compose
    from msmdfusion_tpu.models.builder import build_detector
    from msmdfusion_tpu.utils import overflow
    import msmdfusion_tpu.models  # noqa: F401

    os.environ['MSMD_OVERFLOW_CHECK'] = '1'
    overflow.reset()
    try:
        cfg = load_config(os.path.join(REPO, 'configs',
                                       'votenet_sunrgbd.py'))
        pipeline = Compose(cfg.data.test.pipeline)
        res = pipeline(dict(pts_filename=SUNRGBD_BIN, sweeps=[],
                            timestamp=0))
        assert res['points'].shape == (20000, 4)
        assert np.isfinite(res['points']).all()

        model = build_detector(cfg.model)
        import jax.numpy as jnp
        pts = jnp.asarray(res['points'])[None]
        mask = jnp.asarray(res['points_mask'])[None]
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, mask)
        preds = model.apply(variables, pts, mask, train=False)
        dets = model.apply(variables, preds, method=type(model).get_bboxes)
        boxes = np.asarray(dets['bboxes'])
        assert np.isfinite(boxes).all()
        assert boxes.shape[1] > 0
        jax.block_until_ready(dets)
        assert overflow.total() == 0, overflow.counters()
    finally:
        os.environ.pop('MSMD_OVERFLOW_CHECK', None)
        overflow.reset()


TINY_SCANNET_CFG = '''
class_names = ('cabinet', 'bed', 'chair', 'sofa')
dataset_type = 'ScanNetDataset'
data_root = '{root}/'
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True,
         with_mask_3d=True, with_seg_3d=True),
    dict(type='PointSegClassMapping', valid_cat_ids=(3, 4, 5, 39)),
    dict(type='IndoorPointSample', num_points=256),
    dict(type='RandomFlip3D', sync_2d=False,
         flip_ratio_bev_horizontal=0.5, flip_ratio_bev_vertical=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.087266, 0.087266],
         scale_ratio_range=[1.0, 1.0], shift_height=True),
    dict(type='PadGroundTruth', max_gt=8),
    dict(type='FormatBundle3D', class_names=class_names),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='IndoorPointSample', num_points=256),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=0,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file='{root}/scannet_infos.pkl',
               pipeline=train_pipeline, classes=class_names,
               filter_empty_gt=False, box_type_3d='Depth'),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file='{root}/scannet_infos.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=True,
             box_type_3d='Depth'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file='{root}/scannet_infos.pkl',
              pipeline=test_pipeline, classes=class_names, test_mode=True,
              box_type_3d='Depth'))
model = dict(
    type='VoteNet',
    backbone=dict(type='PointNet2SASSG', in_channels=4,
                  num_points=(64, 32), radius=(0.4, 0.8),
                  num_samples=(8, 8), sa_channels=((16, 16), (16, 32)),
                  fp_channels=((32, 16),)),
    bbox_head=dict(type='VoteHead', num_classes=4, in_channels=16,
                   num_proposals=16, num_dir_bins=1,
                   mean_sizes=[[0.5, 0.5, 0.5]] * 4,
                   aggregation_radius=0.5, aggregation_samples=8),
    train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6),
    test_cfg=dict(score_thr=0.05))
optimizer = dict(type='AdamW', lr=0.008, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10))
lr_config = dict(policy='step', warmup=None, step=[24, 32])
total_epochs = 1
log_config = dict(interval=1)
'''


@pytest.mark.slow
def test_indoor_train_cli_two_steps(tmp_path, rng):
    """The indoor zoo is trainable from a config through tools/train.py
    (VERDICT r2 item 6 'done' criterion)."""
    _write_scannet_infos(tmp_path, rng)
    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(TINY_SCANNET_CFG.format(root=str(tmp_path)))
    work_dir = tmp_path / 'work'
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'train.py'),
         str(cfg_path), '--work-dir', str(work_dir), '--max-steps', '2'],
        capture_output=True, text=True, env=env, timeout=3000)
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = (work_dir / 'train.log').read_text()
    assert 'total_loss' in log
