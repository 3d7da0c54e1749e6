"""End-to-end training CLI smoke: synthetic dataset -> 3 optimizer steps.

Exercises the full stack the reference drives through tools/train.py:
info-pkl dataset, pipeline, prefetch loader, detector build, LR schedule +
grad clip + freezing, jitted DP train step, orbax checkpointing.
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
class_names = ['car', 'truck', 'construction_vehicle', 'bus', 'trailer',
               'barrier', 'motorcycle', 'bicycle', 'pedestrian',
               'traffic_cone']
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadAnnotations3D'),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PadPoints', max_points=512),
    dict(type='PadGroundTruth', max_gt=8),
    dict(type='FormatBundle3D', class_names=class_names),
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=1,
    train=dict(type='NuScenesDataset', data_root='{root}',
               ann_file='{root}/infos.pkl', pipeline=train_pipeline,
               classes=class_names, modality=dict(use_lidar=True),
               test_mode=False, box_type_3d='LiDAR'),
    val=dict(type='NuScenesDataset', data_root='{root}',
             ann_file='{root}/infos.pkl', pipeline=[
                 dict(type='LoadPointsFromFile', coord_type='LIDAR',
                      load_dim=5, use_dim=[0, 1, 2, 3, 4]),
                 dict(type='PointsRangeFilter',
                      point_cloud_range=point_cloud_range),
                 dict(type='PadPoints', max_points=512),
                 dict(type='FormatBundle3D', class_names=class_names),
             ], classes=class_names, modality=dict(use_lidar=True),
             test_mode=True, box_type_3d='LiDAR'))
model = dict(
    type='TransFusionDetector',
    pts_voxel_layer=dict(max_num_points=4, voxel_size=voxel_size,
                         max_voxels=(128, 128),
                         point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=5, sparse_shape=[41, 32, 32],
        base_channels=4, output_channels=8,
        encoder_channels=((4, 4, 8), (8, 8, 8), (8, 8, 8), (8, 8)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        block_type='basicblock'),
    pts_backbone=dict(type='SECOND', in_channels=16, out_channels=[8, 16],
                      layer_nums=[1, 1], layer_strides=[1, 2]),
    pts_neck=dict(type='SECONDFPN', in_channels=[8, 16],
                  out_channels=[8, 8], upsample_strides=[1, 2],
                  use_conv_for_no_stride=True),
    pts_bbox_head=dict(
        type='TransFusionHead', num_proposals=4, auxiliary=True,
        in_channels=16, hidden_channel=16, num_classes=10,
        num_decoder_layers=1, num_heads=4, nms_kernel_size=3,
        ffn_channel=32, dropout=0.0,
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(type='TransFusionBBoxCoder',
                        pc_range=point_cloud_range[:2],
                        voxel_size=voxel_size[:2], out_size_factor=8,
                        post_center_range=[-10, -10, -10, 10, 10, 10],
                        score_threshold=0.0, code_size=10),
        loss_cls=dict(gamma=2, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(loss_weight=0.25),
        loss_heatmap=dict(loss_weight=1.0)),
    train_cfg=dict(pts=dict(
        dataset='nuScenes',
        assigner=dict(type='HungarianAssigner3D',
                      cls_cost=dict(gamma=2, alpha=0.25, weight=0.15),
                      reg_cost=dict(weight=0.25),
                      iou_cost=dict(weight=0.25)),
        pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
        grid_size=[32, 32, 40], voxel_size=voxel_size, out_size_factor=8,
        code_weights=[1.0] * 8 + [0.2, 0.2],
        point_cloud_range=point_cloud_range)),
    test_cfg=dict(pts=dict(dataset='nuScenes', grid_size=[32, 32, 40],
                           out_size_factor=8,
                           pc_range=point_cloud_range[:2],
                           voxel_size=voxel_size[:2], nms_type=None)))
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10))
lr_config = dict(policy='step', warmup='linear', warmup_iters=5,
                 warmup_ratio=0.1, step=[1])
total_epochs = 1
log_config = dict(interval=1)
evaluation = dict(interval=1, max_samples=2)
'''


@pytest.fixture
def synthetic_dataset(tmp_path, rng):
    infos = []
    for i in range(6):
        pts = np.concatenate([
            rng.uniform(-4.5, 4.5, (300, 2)),
            rng.uniform(-3.5, 3.5, (300, 1)),
            rng.uniform(0, 1, (300, 2))], axis=1).astype(np.float32)
        path = tmp_path / f'sample_{i}.bin'
        pts.tofile(str(path))
        n_gt = rng.randint(1, 5)
        boxes = np.zeros((n_gt, 7), np.float32)
        boxes[:, :2] = rng.uniform(-4, 4, (n_gt, 2))
        boxes[:, 2] = -1
        boxes[:, 3:6] = rng.uniform(0.5, 2.0, (n_gt, 3))
        names = rng.choice(['car', 'pedestrian', 'truck'], n_gt)
        infos.append(dict(token=f't{i}', lidar_path=str(path),
                          timestamp=i, sweeps=[], gt_boxes=boxes,
                          gt_names=names,
                          gt_velocity=np.zeros((n_gt, 2), np.float32)))
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump(dict(infos=infos, metadata={}), f)
    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(CONFIG_TEMPLATE.format(root=str(tmp_path)))
    return tmp_path, str(cfg_path)


@pytest.mark.slow
def test_train_cli_runs_steps(synthetic_dataset):
    tmp_path, cfg_path = synthetic_dataset
    work_dir = tmp_path / 'work'
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'train.py'), cfg_path,
         '--work-dir', str(work_dir), '--max-steps', '3'],
        capture_output=True, text=True, env=env, timeout=3000)
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = (work_dir / 'train.log').read_text()
    assert 'total_loss' in log
    ckpts = [d for d in os.listdir(work_dir) if d.startswith('ckpt_')]
    assert ckpts, f'no checkpoint written; dir: {os.listdir(work_dir)}'
    # observability: line-JSON scalar log with train AND val records
    # (EvalHook ran the native nuScenes metrics on 2 val samples)
    import json
    json_logs = [f for f in os.listdir(work_dir) if f.endswith('.log.json')]
    assert json_logs, f'no log.json; dir: {os.listdir(work_dir)}'
    records = [json.loads(line) for line in
               (work_dir / json_logs[0]).read_text().splitlines()]
    modes = {r['mode'] for r in records}
    assert 'train' in modes and 'val' in modes, modes
    train_recs = [r for r in records if r['mode'] == 'train']
    assert 'total_loss' in train_recs[0] and 'lr' in train_recs[0]
    assert 'val: ' in log


@pytest.mark.slow
def test_dist_train_launcher_script(synthetic_dataset):
    """tools/dist_train.sh (reference tools/dist_train.sh:1-9): the wrapper
    must resolve paths, pass --launcher through, and degrade gracefully to
    single-process when no pod runtime exists (init_dist soft-fails)."""
    tmp_path, cfg_path = synthetic_dataset
    work_dir = tmp_path / 'work_dist'
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2')
    proc = subprocess.run(
        ['bash', os.path.join(REPO, 'tools', 'dist_train.sh'), cfg_path,
         '0', '--work-dir', str(work_dir), '--max-steps', '2',
         '--no-validate'],
        capture_output=True, text=True, env=env, timeout=3000)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert 'total_loss' in (work_dir / 'train.log').read_text()


def test_frozen_bn_stats_bit_identical():
    """With frozen_predicates, BN running stats of frozen subtrees must not
    drift across a train step (reference tools/train.py:185-219 puts frozen
    lidar modules in eval mode during stage-2 fine-tuning)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn
    from msmdfusion_tpu.apis.train import make_train_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(8, name='pts_dense')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, name='pts_bn')(x)
            x = nn.Dense(8, name='img_dense')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, name='img_bn')(x)
            return x

        def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
            return {'loss': jnp.mean(preds ** 2)}

    model = Tiny()
    x = jnp.asarray(np.random.RandomState(0).randn(16, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params, bs = variables['params'], variables['batch_stats']
    step = make_train_step(model, optax.sgd(1e-2),
                           frozen_predicates=('pts_',))
    batch = dict(inputs=(x,), gt_bboxes=None, gt_labels=None, gt_valid=None)
    new_params, new_bs, _, _ = step(params, bs, optax.sgd(1e-2).init(params),
                                    batch, 0)
    # frozen subtree: stats bit-identical
    np.testing.assert_array_equal(np.asarray(new_bs['pts_bn']['mean']),
                                  np.asarray(bs['pts_bn']['mean']))
    np.testing.assert_array_equal(np.asarray(new_bs['pts_bn']['var']),
                                  np.asarray(bs['pts_bn']['var']))
    # unfrozen subtree: stats moved (mean of a BN'd input stays ~0, so
    # check the variance which clearly re-estimates)
    assert not np.allclose(np.asarray(new_bs['img_bn']['var']),
                           np.asarray(bs['img_bn']['var']))
