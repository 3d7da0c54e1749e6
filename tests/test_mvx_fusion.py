"""MVXFasterRCNN PointFusion decoration with batch > 1.

Round-1 weak spot: the b>1 fusion path was a half-debugged special case.
This checks the batched formulation: each voxel row receives the fusion
computed with ITS OWN sample's projection/image (reference runs PointFusion
per sample, fusion_layers/point_fusion.py:306).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.builder import build_detector
import msmdfusion_tpu.models  # noqa: F401

PCR = [-4.8, -4.8, -4.0, 4.8, 4.8, 4.0]
VOX = [0.6, 0.6, 0.5]


def _cfg():
    return dict(
        type='MVXFasterRCNN',
        pts_voxel_layer=dict(max_num_points=4, voxel_size=VOX,
                             max_voxels=(128, 128), point_cloud_range=PCR),
        pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=4),
        pts_middle_encoder=dict(type='PointPillarsScatter', in_channels=4,
                                output_shape=[16, 16]),
        pts_backbone=dict(type='SECOND', in_channels=4, out_channels=[8, 16],
                          layer_nums=[1, 1], layer_strides=[1, 2]),
        pts_neck=dict(type='SECONDFPN', in_channels=[8, 16],
                      out_channels=[8, 8], upsample_strides=[1, 2],
                      use_conv_for_no_stride=True),
        img_backbone=dict(type='ResNet', depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=1,
                          norm_eval=True),
        img_neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                      out_channels=32, num_outs=5),
        fusion_layer=dict(type='PointFusion', img_channels=32,
                          pts_channels=4, mid_channels=8, out_channels=4,
                          img_levels=(0, 1)),
        pts_bbox_head=dict(
            type='Anchor3DHead', num_classes=1, in_channels=16,
            feat_channels=16,
            anchor_generator=dict(
                type='Anchor3DRangeGenerator',
                ranges=[[-4.8, -4.8, -1.0, 4.8, 4.8, -1.0]],
                sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.57]),
            bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder'),
            ),
        train_cfg=dict(pts=dict(code_weight=[1.0] * 7)),
        test_cfg=dict(pts=dict(nms_thr=0.5, score_thr=0.1, max_num=16)))


@pytest.mark.slow
def test_mvx_fusion_batch2(rng):
    model = build_detector(_cfg())
    b, v, n = 2, 2, 200
    pts = np.concatenate([
        rng.uniform(-4.5, 4.5, (b, n, 2)),
        rng.uniform(-3.5, 3.5, (b, n, 1)),
        rng.uniform(0, 1, (b, n, 1))], axis=-1).astype(np.float32)
    img = rng.randn(b, v, 32, 32, 3).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
    l2i[:, :, 0, 0] = 8.0
    l2i[:, :, 1, 1] = 8.0
    metas = dict(lidar2img=jnp.asarray(l2i))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.ones((b, n), bool), jnp.asarray(img), metas)
    preds = model.apply(variables, jnp.asarray(pts), jnp.ones((b, n), bool),
                        jnp.asarray(img), metas)
    cls = preds['cls_score'] if isinstance(preds, dict) else preds[0]
    assert np.all(np.isfinite(np.asarray(jax.tree_util.tree_leaves(preds)[0])))

    # sample-correspondence: zeroing sample 1's image must not change
    # sample 0's predictions
    img2 = img.copy()
    img2[1] = 0
    preds2 = model.apply(variables, jnp.asarray(pts),
                         jnp.ones((b, n), bool), jnp.asarray(img2), metas)
    l0, l0b = jax.tree_util.tree_leaves(preds), jax.tree_util.tree_leaves(
        preds2)
    for a, c in zip(l0, l0b):
        if a.ndim >= 1 and a.shape[0] == b:
            assert np.allclose(np.asarray(a)[0], np.asarray(c)[0],
                               atol=1e-5)
