"""CenterPoint + anchor-head detector forward/loss/decode smoke tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.detectors import CenterPoint, VoxelNet

PCR = [0, -3.2, -3.0, 6.4, 3.2, 1.0]
VOX = [0.2, 0.2, 0.2]


def make_points(rng, b=1, n=256):
    return np.concatenate([
        rng.uniform(0, 6.4, (b, n, 1)), rng.uniform(-3.2, 3.2, (b, n, 1)),
        rng.uniform(-3, 1, (b, n, 1)), rng.uniform(0, 1, (b, n, 2))],
        axis=-1).astype(np.float32)


@pytest.mark.slow
def test_centerpoint_forward_loss_decode(rng):
    model = CenterPoint(
        pts_voxel_layer=dict(max_num_points=4, voxel_size=VOX,
                             max_voxels=(256, 256),
                             point_cloud_range=PCR),
        pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
        pts_middle_encoder=dict(
            type='SparseEncoder', in_channels=5, sparse_shape=(21, 32, 32),
            base_channels=4, output_channels=8,
            encoder_channels=((4, 4, 8), (8, 8, 8), (8, 8)),
            encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0)),
            block_type='basicblock'),
        pts_backbone=dict(type='SECOND', in_channels=24,
                          out_channels=[16, 32], layer_nums=[1, 1],
                          layer_strides=[1, 2]),
        pts_neck=dict(type='SECONDFPN', in_channels=[16, 32],
                      out_channels=[16, 16], upsample_strides=[1, 2],
                      use_conv_for_no_stride=True),
        pts_bbox_head=dict(
            type='CenterHead', in_channels=32, share_conv_channel=16,
            tasks=[dict(num_class=1, class_names=['car']),
                   dict(num_class=2, class_names=['pedestrian',
                                                  'traffic_cone'])],
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2), vel=(2, 2)),
            bbox_coder=dict(
                type='CenterPointBBoxCoder', pc_range=PCR[:2],
                voxel_size=VOX[:2], out_size_factor=4,
                post_center_range=[-10, -10, -10, 10, 10, 10],
                max_num=16, score_threshold=0.0, code_size=9)),
        train_cfg=dict(pts=dict(
            grid_size=[32, 32, 20], voxel_size=VOX, out_size_factor=4,
            gaussian_overlap=0.1, min_radius=2, point_cloud_range=PCR,
            code_weights=[1.0] * 8 + [0.2, 0.2])),
        test_cfg=dict(pts=dict(
            post_center_limit_range=[-10, -10, -10, 10, 10, 10],
            min_radius=[4, 0.5], score_threshold=0.0, out_size_factor=4,
            voxel_size=VOX[:2], pc_range=PCR[:2], nms_type='circle',
            post_max_size=8)))
    pts = make_points(rng)
    mask = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(mask))
    preds = model.apply(variables, jnp.asarray(pts), jnp.asarray(mask))
    assert isinstance(preds, list) and len(preds) == 2
    assert preds[0]['heatmap'].shape[-1] == 1
    assert preds[1]['heatmap'].shape[-1] == 2

    res = model.apply(variables, preds, method=CenterPoint.get_bboxes)
    assert res['bboxes'].shape[1] == 32  # 16 per task
    assert np.isfinite(np.asarray(res['bboxes'])).all()

    gt = np.zeros((1, 3, 9), np.float32)
    gt[..., 0] = [[1.0, 3.0, 5.0]]
    gt[..., 2] = -1.0
    gt[..., 3:6] = 1.0
    labels = np.array([[0, 1, 2]], np.int32)
    losses = model.apply(variables, preds, jnp.asarray(gt),
                         jnp.asarray(labels), jnp.ones((1, 3), bool),
                         method=CenterPoint.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert 'task0.loss_heatmap' in losses
    assert 'task1.loss_bbox' in losses


@pytest.mark.slow
def test_anchor_voxelnet_forward_loss_decode(rng):
    model = VoxelNet(
        pts_voxel_layer=dict(max_num_points=4, voxel_size=VOX,
                             max_voxels=(256, 256),
                             point_cloud_range=PCR),
        pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
        pts_middle_encoder=dict(
            type='SparseEncoder', in_channels=5, sparse_shape=(21, 32, 32),
            base_channels=4, output_channels=8,
            encoder_channels=((4,), (8, 8, 8), (8, 8, 8)),
            encoder_paddings=((1,), (1, 1, 1), (1, 1, 1)),
            block_type='conv_module'),
        pts_backbone=dict(type='SECOND', in_channels=24,
                          out_channels=[16, 32], layer_nums=[1, 1],
                          layer_strides=[1, 2]),
        pts_neck=dict(type='SECONDFPN', in_channels=[16, 32],
                      out_channels=[16, 16], upsample_strides=[1, 2],
                      use_conv_for_no_stride=True),
        pts_bbox_head=dict(
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
        train_cfg=dict(pts=dict(pos_iou_thr=0.5, neg_iou_thr=0.35,
                                min_pos_iou=0.3)),
        test_cfg=dict(pts=dict(nms_pre=64, nms_thr=0.5, score_thr=0.05,
                               max_num=16)))
    pts = make_points(rng)
    mask = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(mask))
    preds = model.apply(variables, jnp.asarray(pts), jnp.asarray(mask))
    assert preds['cls_score'].shape[-1] == 6 * 3   # anchors * classes
    res = model.apply(variables, preds, method=VoxelNet.get_bboxes)
    assert res['boxes'].shape[1] == 16
    gt = np.zeros((1, 2, 7), np.float32)
    gt[..., 0] = [[2.0, 4.0]]
    gt[..., 2] = -1.5
    gt[..., 3:6] = [1.6, 3.9, 1.56]
    losses = model.apply(variables, preds, jnp.asarray(gt),
                         jnp.asarray(np.array([[2, 2]], np.int32)),
                         jnp.ones((1, 2), bool), method=VoxelNet.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_free_anchor_head_loss_and_decode(rng):
    """FreeAnchor bag losses: finite, positive, and sensitive to gt fit
    (reference free_anchor3d_head.py:43-245)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.heads.free_anchor3d_head import \
        FreeAnchor3DHead

    pcr = [-4.8, -4.8, -4.0, 4.8, 4.8, 4.0]
    head = FreeAnchor3DHead(
        num_classes=3, in_channels=16, feat_channels=16,
        pre_anchor_topk=8, bbox_thr=0.3,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[-4.8, -4.8, -1.0, 4.8, 4.8, -1.0]],
            sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.57]),
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder'),
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(beta=0.111, loss_weight=1.0),
        loss_dir=dict(loss_weight=0.2),
        train_cfg=dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.3,
                       code_weight=[1.0] * 7),
        test_cfg=dict(score_thr=0.05, nms_thr=0.2, nms_pre=100, max_num=20))
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    g = 4
    gt = np.zeros((2, g, 7), np.float32)
    gt[..., :2] = rng.uniform(-4, 4, (2, g, 2))
    gt[..., 2] = -1.0
    gt[..., 3:6] = rng.uniform(1.0, 2.5, (2, g, 3))
    losses = head.apply(variables, preds, jnp.asarray(gt),
                        jnp.asarray(rng.randint(0, 3, (2, g))),
                        jnp.ones((2, g), bool), method=FreeAnchor3DHead.loss)
    assert set(losses) == {'positive_bag_loss', 'negative_bag_loss'}
    for v in losses.values():
        assert np.isfinite(float(v)) and float(v) >= 0
    # masking: all-invalid gts -> zero positive loss
    losses0 = head.apply(variables, preds, jnp.asarray(gt),
                         jnp.asarray(rng.randint(0, 3, (2, g))),
                         jnp.zeros((2, g), bool),
                         method=FreeAnchor3DHead.loss)
    assert float(losses0['positive_bag_loss']) == 0.0
    # decode path inherited from Anchor3DHead still works
    dets = head.apply(variables, preds, method=FreeAnchor3DHead.get_bboxes)
    assert dets['boxes'].shape[0] == 2


@pytest.mark.slow
def test_shape_aware_head_forward_loss_decode(rng):
    """Per-group sub-heads with different strides, concatenated anchors
    (reference shape_aware_head.py:139-482)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.heads.shape_aware_head import ShapeAwareHead

    head = ShapeAwareHead(
        tasks=(dict(num_class=1, shared_conv_channels=(16, 16),
                    shared_conv_strides=(1, 1)),
               dict(num_class=2, shared_conv_channels=(16, 16),
                    shared_conv_strides=(2, 1))),
        num_classes=3, in_channels=16,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-4.8, -4.8, -1.0, 4.8, 4.8, -1.0]] * 3,
            sizes=[[1.6, 3.9, 1.56], [0.6, 0.8, 1.7], [0.6, 1.8, 1.6]],
            rotations=[0, 1.57]),
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder'),
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(beta=0.111, loss_weight=2.0),
        loss_dir=dict(loss_weight=0.2),
        train_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.2),
        test_cfg=dict(score_thr=0.05, nms_thr=0.2, nms_pre=100, max_num=20))
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    # group 1: 8x8 grid x 2 rots x 1 size; group 2: 4x4 grid x 2 x 2
    assert preds['cls_score'].shape == (2, 8 * 8 * 2 + 4 * 4 * 4, 3)
    assert preds['featmap_sizes'] == ((8, 8), (4, 4))
    g = 4
    gt = np.zeros((2, g, 7), np.float32)
    gt[..., :2] = rng.uniform(-4, 4, (2, g, 2))
    gt[..., 2] = -1.0
    gt[..., 3:6] = rng.uniform(0.8, 2.5, (2, g, 3))
    losses = head.apply(variables, preds, jnp.asarray(gt),
                        jnp.asarray(rng.randint(0, 3, (2, g))),
                        jnp.ones((2, g), bool), method=ShapeAwareHead.loss)
    for k in ('loss_cls', 'loss_bbox', 'loss_dir'):
        assert np.isfinite(float(losses[k])), k
    dets = head.apply(variables, preds, method=ShapeAwareHead.get_bboxes)
    assert dets['boxes'].shape[0] == 2


@pytest.mark.slow
def test_parta2_rpn_head_proposals(rng):
    """Class-agnostic proposal NMS keeps the top scored boxes
    (reference parta2_rpn_head.py:126-311)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.heads.parta2_rpn_head import PartA2RPNHead

    head = PartA2RPNHead(
        num_classes=3, in_channels=16, feat_channels=16,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[-4.8, -4.8, -1.0, 4.8, 4.8, -1.0]],
            sizes=[[1.6, 3.9, 1.56]], rotations=[0, 1.57]),
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder'),
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(beta=0.111, loss_weight=2.0),
        loss_dir=dict(loss_weight=0.2),
        train_cfg=dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.2),
        test_cfg=dict(score_thr=0.0, nms_thr=0.8, nms_pre=64, nms_post=16))
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    g = 3
    gt = np.zeros((2, g, 7), np.float32)
    gt[..., :2] = rng.uniform(-4, 4, (2, g, 2))
    gt[..., 2] = -1.0
    gt[..., 3:6] = rng.uniform(1.0, 2.5, (2, g, 3))
    losses = head.apply(variables, preds, jnp.asarray(gt),
                        jnp.asarray(rng.randint(0, 3, (2, g))),
                        jnp.ones((2, g), bool), method=PartA2RPNHead.loss)
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_rpn_dir'} == set(losses)
    props = head.apply(variables, preds, method=PartA2RPNHead.get_proposals)
    assert props['boxes'].shape == (2, 16, 7)
    assert props['scores'].shape == (2, 16)
    # proposals are score-sorted
    sc = np.asarray(props['scores'])
    assert (np.diff(sc, axis=1) <= 1e-6).all()
