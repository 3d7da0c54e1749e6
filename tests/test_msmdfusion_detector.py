"""Full MSMDFusion detector integration test on tiny shapes (CPU).

The reference has NO tests for the MSMD path (SURVEY.md §4); this closes
that gap: full multimodal forward (image branch -> MDU decoration ->
multi-scale 2D voxels -> GMA -> SPP fusion -> TransFusion head) + loss +
decode on synthetic data.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.detectors import MSMDFusionDetector
from msmdfusion_tpu.models.heads.transfusion_head import TransFusionHead

PCR = [-2.4, -2.4, -4.0, 2.4, 2.4, 4.0]
VOX = [0.3, 0.3, 0.2]


def tiny_config():
    return dict(
        spatial_shapes=[[41, 16, 16], [21, 8, 8], [11, 4, 4], [5, 2, 2]],
        downscale_factors=[1, 2, 4, 8],
        fps_num_list=[16] * 4,
        radius_list=[6, 3, 2, 1],
        max_cluster_samples_list=[8, 8, 8, 8],
        dist_thresh_list=[13.3, 6.6, 3.3, 1.6],
        fg_max_voxels=[64, 64, 64, 64],
        img_backbone=dict(type='ResNet', depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=1,
                          norm_eval=True),
        img_neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                      out_channels=49 * 0 + 256, num_outs=5),
        pts_voxel_layer=dict(max_num_points=4, voxel_size=VOX,
                             max_voxels=(256, 256), point_cloud_range=PCR),
        pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
        pts_middle_encoder=dict(
            type='SparseEncoder', in_channels=5, sparse_shape=[41, 16, 16],
            base_channels=16, output_channels=32,
            encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 64),
                              (64, 64)),
            encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                              (0, 0)),
            block_type='basicblock'),
        multimodal_middle_encoder=dict(
            type='SparseMultiModalEncoderPaint',
            in_channels_3D=(16, 32, 64, 64),
            in_channels_2D=(64, 64, 64, 64),
            out_channels=(32, 64, 64, 64),
            padding=(1, 1, (0, 1, 1), 0)),
        pts_backbone=dict(type='SECOND', in_channels=192,
                          out_channels=[32, 64], layer_nums=[2, 2],
                          layer_strides=[1, 2]),
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
            bbox_coder=dict(
                type='TransFusionBBoxCoder', pc_range=PCR[:2],
                voxel_size=VOX[:2], out_size_factor=8,
                post_center_range=[-10, -10, -10, 10, 10, 10],
                score_threshold=0.0, code_size=10)),
        train_cfg=dict(pts=dict(
            dataset='nuScenes',
            assigner=dict(
                type='HungarianAssigner3D',
                cls_cost=dict(gamma=2, alpha=0.25, weight=0.15),
                reg_cost=dict(weight=0.25), iou_cost=dict(weight=0.25)),
            pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
            grid_size=[16, 16, 40], voxel_size=VOX, out_size_factor=8,
            code_weights=[1.0] * 8 + [0.2, 0.2], point_cloud_range=PCR)),
        test_cfg=dict(pts=dict(
            dataset='nuScenes', grid_size=[16, 16, 40], out_size_factor=8,
            pc_range=PCR[:2], voxel_size=VOX[:2], nms_type=None)),
    )


def make_batch(rng, b=1, v=2, n=256, m=32, mr=32, img_hw=(64, 64)):
    pts = np.concatenate([
        rng.uniform(-2.4, 2.4, (b, n, 2)), rng.uniform(-4, 4, (b, n, 1)),
        rng.uniform(0, 1, (b, n, 2))], axis=-1).astype(np.float32)
    fg_points = np.concatenate([
        rng.uniform(-2.4, 2.4, (b, v, m, 2)),
        rng.uniform(-4, 4, (b, v, m, 1)),
        rng.uniform(0, 1, (b, v, m, 12))], axis=-1).astype(np.float32)
    h, w = img_hw
    fg_pixels = np.stack([
        rng.uniform(0, w - 1, (b, v, m)), rng.uniform(0, h - 1, (b, v, m)),
        rng.uniform(1, 50, (b, v, m))], axis=-1).astype(np.float32)
    fg_real = np.stack([
        rng.uniform(0, w - 1, (b, v, mr)), rng.uniform(0, h - 1, (b, v, mr)),
        rng.uniform(1, 50, (b, v, mr))], axis=-1).astype(np.float32)
    return dict(
        points=jnp.asarray(pts),
        points_mask=jnp.ones((b, n), bool),
        img=jnp.asarray(rng.randn(b, v, h, w, 3).astype(np.float32)),
        fg=dict(
            fg_pixels=jnp.asarray(fg_pixels),
            fg_points=jnp.asarray(fg_points),
            fg_mask=jnp.ones((b, v, m), bool),
            fg_real_pixels=jnp.asarray(fg_real),
            fg_real_mask=jnp.ones((b, v, mr), bool),
            lidar2img=jnp.asarray(
                rng.randn(b, v, 4, 4).astype(np.float32))))


@pytest.mark.slow
def test_msmdfusion_forward_loss_decode(rng):
    model = MSMDFusionDetector(**tiny_config())
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch['points'],
                           batch['points_mask'], batch['img'], batch['fg'])
    preds = model.apply(variables, batch['points'], batch['points_mask'],
                        batch['img'], batch['fg'])
    assert preds['center'].shape == (1, 2, 4)
    assert preds['heatmap'].shape == (1, 10, 4)
    assert not np.any(np.isnan(np.asarray(preds['center'])))

    res = model.apply(variables, preds, method=MSMDFusionDetector.get_bboxes)
    assert res['bboxes'].shape == (1, 4, 9)

    g = 3
    gt_bboxes = np.zeros((1, g, 9), np.float32)
    gt_bboxes[..., :2] = rng.uniform(-2, 2, (1, g, 2))
    gt_bboxes[..., 2] = -1.0
    gt_bboxes[..., 3:6] = rng.uniform(0.5, 1.5, (1, g, 3))
    gt_labels = rng.randint(0, 10, (1, g)).astype(np.int32)
    gt_valid = np.array([[True, True, False]])
    losses = model.apply(variables, preds, jnp.asarray(gt_bboxes),
                         jnp.asarray(gt_labels), jnp.asarray(gt_valid),
                         method=MSMDFusionDetector.loss)
    assert np.isfinite(float(losses['loss_heatmap']))
    assert np.isfinite(float(losses['layer_-1_loss_bbox']))
