"""TransFusionHead forward / loss / decode smoke tests (small shapes)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.heads.transfusion_head import TransFusionHead

TRAIN_CFG = dict(
    dataset='nuScenes',
    assigner=dict(
        type='HungarianAssigner3D',
        cls_cost=dict(type='FocalLossCost', gamma=2, alpha=0.25, weight=0.15),
        reg_cost=dict(type='BBoxBEVL1Cost', weight=0.25),
        iou_cost=dict(type='IoU3DCost', weight=0.25)),
    pos_weight=-1,
    gaussian_overlap=0.1,
    min_radius=2,
    grid_size=[128, 128, 40],
    voxel_size=[0.075, 0.075, 0.2],
    out_size_factor=8,
    code_weights=[1.0] * 8 + [0.2, 0.2],
    point_cloud_range=[-4.8, -4.8, -5.0, 4.8, 4.8, 3.0])
TEST_CFG = dict(dataset='nuScenes', grid_size=[128, 128, 40],
                out_size_factor=8, pc_range=[-4.8, -4.8],
                voxel_size=[0.075, 0.075], nms_type=None)


def make_head():
    return TransFusionHead(
        num_proposals=8, auxiliary=True, in_channels=32, hidden_channel=32,
        num_classes=10, num_decoder_layers=1, num_heads=4,
        nms_kernel_size=3, ffn_channel=64, dropout=0.0,
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(
            type='TransFusionBBoxCoder', pc_range=[-4.8, -4.8],
            voxel_size=[0.075, 0.075], out_size_factor=8,
            post_center_range=[-10, -10, -10, 10, 10, 10],
            score_threshold=0.0, code_size=10),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', loss_weight=0.25),
        loss_heatmap=dict(type='GaussianFocalLoss', loss_weight=1.0),
        train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)


def test_forward_and_decode(rng):
    head = make_head()
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    assert preds['center'].shape == (2, 2, 8)
    assert preds['heatmap'].shape == (2, 10, 8)
    assert preds['dense_heatmap'].shape == (2, 10, 16, 16)
    assert preds['query_heatmap_score'].shape == (2, 10, 8)

    res = head.apply(variables, preds, method=TransFusionHead.get_bboxes)
    assert res['bboxes'].shape == (2, 8, 9)
    assert res['scores'].shape == (2, 8)
    assert res['valid'].dtype == bool


@pytest.mark.slow
def test_loss(rng):
    head = make_head()
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)

    g = 4
    gt_bboxes = np.zeros((2, g, 9), np.float32)
    gt_bboxes[..., :2] = rng.uniform(-4, 4, (2, g, 2))
    gt_bboxes[..., 2] = -1.0
    gt_bboxes[..., 3:6] = rng.uniform(0.5, 2.0, (2, g, 3))
    gt_bboxes[..., 6] = rng.uniform(-np.pi, np.pi, (2, g))
    gt_labels = rng.randint(0, 10, (2, g)).astype(np.int32)
    gt_valid = np.array([[True, True, True, False],
                         [True, False, False, False]])

    losses = head.apply(variables, preds, jnp.asarray(gt_bboxes),
                        jnp.asarray(gt_labels), jnp.asarray(gt_valid),
                        method=TransFusionHead.loss)
    for k in ('loss_heatmap', 'layer_-1_loss_cls', 'layer_-1_loss_bbox'):
        v = float(losses[k])
        assert np.isfinite(v), (k, v)
        assert v >= 0
    assert float(losses['matched_ious']) >= 0
