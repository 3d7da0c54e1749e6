"""PointPillars nuScenes (dense pillar path — validates the no-spconv stack).

Mirrors the reference configs/_base_/models/hv_pointpillars_fpn_nus.py
family hyperparameters.
"""
_base_ = '_base_/nuscenes_data.py'

point_cloud_range = [-50.0, -50.0, -5.0, 50.0, 50.0, 3.0]
voxel_size = [0.25, 0.25, 8.0]

model = dict(
    type='VoxelNet',
    pts_voxel_layer=dict(
        max_num_points=64, voxel_size=voxel_size, max_voxels=(30000, 40000),
        point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(
        type='PillarFeatureNet', in_channels=5, feat_channels=[64],
        with_distance=False, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    pts_middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64, output_shape=[400, 400]),
    pts_backbone=dict(
        type='SECOND', in_channels=64, out_channels=[64, 128, 256],
        layer_nums=[3, 5, 5], layer_strides=[2, 2, 2]),
    pts_neck=dict(
        type='SECONDFPN', in_channels=[64, 128, 256],
        out_channels=[128, 128, 128], upsample_strides=[1, 2, 4]),
    pts_bbox_head=dict(
        type='Anchor3DHead', num_classes=10, in_channels=384,
        feat_channels=384, use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[[-49.6, -49.6, -1.80032795, 49.6, 49.6, -1.80032795],
                    [-49.6, -49.6, -1.74440365, 49.6, 49.6, -1.74440365],
                    [-49.6, -49.6, -1.68526504, 49.6, 49.6, -1.68526504],
                    [-49.6, -49.6, -1.67339111, 49.6, 49.6, -1.67339111],
                    [-49.6, -49.6, -1.61785072, 49.6, 49.6, -1.61785072],
                    [-49.6, -49.6, -1.80984986, 49.6, 49.6, -1.80984986],
                    [-49.6, -49.6, -1.76396500, 49.6, 49.6, -1.76396500]],
            sizes=[[1.95017717, 4.60718145, 1.72270761],
                   [2.45609390, 6.73778078, 2.73004906],
                   [2.87427237, 10.5885369, 3.19125896],
                   [0.60058911, 1.68452161, 1.27192197],
                   [0.66344886, 0.72564370, 1.75748069],
                   [0.39694519, 0.40359262, 1.06232151],
                   [2.49008838, 0.48578221, 0.98297065]],
            custom_values=[0, 0], rotations=[0, 1.57], reshape_out=True),
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=9),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.1111111, loss_weight=1.0),
        loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=0.2)),
    train_cfg=dict(pts=dict(
        pos_iou_thr=0.6, neg_iou_thr=0.3, min_pos_iou=0.3,
        point_cloud_range=point_cloud_range)),
    test_cfg=dict(pts=dict(
        use_rotate_nms=True, nms_across_levels=False, nms_pre=1000,
        nms_thr=0.2, score_thr=0.05, min_bbox_size=0, max_num=500)))

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=1.0 / 1000, step=[20, 23])
total_epochs = 24
