"""TransFusion image-fusion (fuse_img) head path on tiny shapes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.heads.transfusion_head import TransFusionHead

PCR = [-4.8, -4.8, -5.0, 4.8, 4.8, 3.0]


def make_head():
    return TransFusionHead(
        num_proposals=4, auxiliary=True, in_channels=32, hidden_channel=32,
        num_classes=10, num_decoder_layers=1, num_heads=4,
        nms_kernel_size=3, ffn_channel=64, dropout=0.0,
        fuse_img=True, num_views=2, in_channels_img=32,
        out_size_factor_img=4,
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(
            type='TransFusionBBoxCoder', pc_range=PCR[:2],
            voxel_size=[0.075, 0.075], out_size_factor=8,
            post_center_range=[-10, -10, -10, 10, 10, 10],
            score_threshold=0.0, code_size=10),
        loss_cls=dict(gamma=2, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(loss_weight=0.25),
        loss_heatmap=dict(loss_weight=1.0),
        train_cfg=dict(
            dataset='nuScenes',
            assigner=dict(cls_cost=dict(gamma=2, alpha=0.25, weight=0.15),
                          reg_cost=dict(weight=0.25),
                          iou_cost=dict(weight=0.25)),
            gaussian_overlap=0.1, min_radius=2, grid_size=[128, 128, 40],
            voxel_size=[0.075, 0.075, 0.2], out_size_factor=8,
            code_weights=[1.0] * 8 + [0.2, 0.2], point_cloud_range=PCR),
        test_cfg=dict(dataset='nuScenes', grid_size=[128, 128, 40],
                      out_size_factor=8, pc_range=PCR[:2],
                      voxel_size=[0.075, 0.075], nms_type=None))


@pytest.mark.slow
def test_fuse_img_forward_loss(rng):
    head = make_head()
    bev = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    img = jnp.asarray(rng.randn(1, 2, 8, 8, 32).astype(np.float32))
    metas = dict(lidar2img=jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))))
    variables = head.init(jax.random.PRNGKey(0), bev, img, metas)
    preds = head.apply(variables, bev, img, metas)
    assert preds['center'].shape == (1, 2, 4)
    assert 'on_the_image' in preds
    assert preds['dense_heatmap'].shape == (1, 10, 16, 16)

    res = head.apply(variables, preds, method=TransFusionHead.get_bboxes)
    assert res['bboxes'].shape == (1, 4, 9)
    assert np.isfinite(np.asarray(res['bboxes'])).all()

    gt = np.zeros((1, 2, 9), np.float32)
    gt[..., :2] = rng.uniform(-3, 3, (1, 2, 2))
    gt[..., 2] = -1
    gt[..., 3:6] = 1.0
    losses = head.apply(
        variables, preds, jnp.asarray(gt),
        jnp.asarray(rng.randint(0, 10, (1, 2)).astype(np.int32)),
        jnp.ones((1, 2), bool), method=TransFusionHead.loss)
    assert np.isfinite(float(losses['loss_heatmap']))
    assert np.isfinite(float(losses['layer_-1_loss_bbox']))
