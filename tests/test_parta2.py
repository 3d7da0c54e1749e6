"""Part-A2 two-stage detector smoke test (tiny shapes)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.detectors import PartA2

PCR = [0, -3.2, -3.0, 6.4, 3.2, 1.0]
VOX = [0.2, 0.2, 0.2]


@pytest.mark.slow
def test_parta2_forward_loss_decode(rng):
    model = PartA2(
        pts_voxel_layer=dict(max_num_points=4, voxel_size=VOX,
                             max_voxels=(256, 256),
                             point_cloud_range=PCR),
        pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=4),
        pts_middle_encoder=dict(
            type='SparseUNet', in_channels=4, sparse_shape=(21, 32, 32),
            base_channels=4, output_channels=8,
            encoder_channels=((4,), (8, 8, 8), (8, 8, 8)),
            encoder_paddings=((1,), (1, 1, 1), (1, 1, 1)),
            decoder_channels=((8, 8, 8), (8, 8, 4), (4, 4, 4))),
        pts_backbone=dict(type='SECOND', in_channels=16,
                          out_channels=[16, 32], layer_nums=[2, 2],
                          layer_strides=[1, 2]),
        pts_neck=dict(type='SECONDFPN', in_channels=[16, 32],
                      out_channels=[16, 16], upsample_strides=[1, 2],
                      use_conv_for_no_stride=True),
        rpn_head=dict(
            type='Anchor3DHead', num_classes=3, in_channels=32,
            feat_channels=32,
            anchor_generator=dict(
                type='Anchor3DRangeGenerator',
                ranges=[[0, -3.2, -0.6, 6.4, 3.2, -0.6]] * 3,
                sizes=[[0.6, 0.8, 1.7], [0.6, 1.76, 1.73],
                       [1.6, 3.9, 1.56]],
                rotations=[0, 1.57]),
            bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=7),
            loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(beta=0.111, loss_weight=2.0),
            loss_dir=dict(loss_weight=0.2)),
        roi_head=dict(
            type='PartAggregationROIHead', num_classes=3,
            roi_grid=(4, 4, 4), in_channels=4,
            seg_conv_channels=(8,), part_conv_channels=(8,),
            merge_conv_channels=(8,), down_conv_channels=(8,),
            shared_fc_channels=(16,), cls_channels=(16,),
            reg_channels=(16,)),
        num_proposals=8,
        train_cfg=dict(rpn=dict(pos_iou_thr=0.5, neg_iou_thr=0.35,
                                min_pos_iou=0.3), rcnn=dict()),
        test_cfg=dict(rpn=dict(nms_pre=64, nms_thr=0.7, score_thr=0.0,
                               max_num=32), rcnn=dict()))
    pts = np.concatenate([
        rng.uniform(0, 6.4, (1, 256, 1)), rng.uniform(-3.2, 3.2, (1, 256, 1)),
        rng.uniform(-3, 1, (1, 256, 1)), rng.uniform(0, 1, (1, 256, 1))],
        axis=-1).astype(np.float32)
    mask = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(mask))
    preds = model.apply(variables, jnp.asarray(pts), jnp.asarray(mask))
    assert preds['roi']['rois'].shape == (1, 8, 7)
    assert preds['roi']['cls_score'].shape == (1, 8, 1)

    res = model.apply(variables, preds, method=PartA2.get_bboxes)
    assert res['bboxes'].shape == (1, 8, 7)

    gt = np.zeros((1, 2, 9), np.float32)
    gt[..., 0] = [[2.0, 4.0]]
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    losses = model.apply(
        variables, preds, jnp.asarray(gt),
        jnp.asarray(np.array([[2, 2]], np.int32)), jnp.ones((1, 2), bool),
        method=PartA2.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
