"""TransFusion-L (LiDAR-only, voxel) — stage-1 model of the MSMD pipeline.

Mirrors the reference configs/transfusion_nusc_voxel_L.py hyperparameters on
the TPU-native stack.
"""
_base_ = '_base_/nuscenes_data.py'

point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
voxel_size = [0.075, 0.075, 0.2]
out_size_factor = 8

class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]
data_root = 'data/nuscenes/'
total_epochs = 20
max_points_per_sample = 300000

# stage-1 GT-paste recipe (reference transfusion_nusc_voxel_L.py:31-45);
# stop_epoch implements the "fade" — the final 5 epochs train without
# copy-paste (reference configs/nuscenes.md:7)
db_sampler = dict(
    data_root=data_root,
    info_path=data_root + 'nuscenes_dbinfos_train.pkl',
    rate=1.0,
    prepare=dict(
        filter_by_difficulty=[-1],
        filter_by_min_points=dict(
            car=5, truck=5, bus=5, trailer=5, construction_vehicle=5,
            traffic_cone=5, barrier=5, motorcycle=5, bicycle=5,
            pedestrian=5)),
    classes=class_names,
    sample_groups=dict(
        car=2, truck=3, construction_vehicle=7, bus=4, trailer=6, barrier=2,
        motorcycle=6, bicycle=6, pedestrian=2, traffic_cone=2))

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='ObjectSample', db_sampler=db_sampler,
         stop_epoch=total_epochs - 5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.785, 0.785],
         scale_ratio_range=[0.9, 1.1], translation_std=[0.5, 0.5, 0.5]),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectNameFilter', classes=class_names),
    dict(type='PointShuffle'),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='PadGroundTruth', max_gt=500),
    dict(type='FormatBundle3D', class_names=class_names),
]
data = dict(
    train=dict(dataset=dict(pipeline=train_pipeline)))

model = dict(
    type='TransFusionDetector',
    pts_voxel_layer=dict(
        max_num_points=10, voxel_size=voxel_size,
        max_voxels=(120000, 160000), point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=5, sparse_shape=[41, 1440, 1440],
        output_channels=128, order=('conv', 'norm', 'act'),
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0)),
        block_type='basicblock'),
    pts_backbone=dict(
        type='SECOND', in_channels=256, out_channels=[128, 256],
        layer_nums=[5, 5], layer_strides=[1, 2]),
    pts_neck=dict(
        type='SECONDFPN', in_channels=[128, 256], out_channels=[256, 256],
        upsample_strides=[1, 2], use_conv_for_no_stride=True),
    pts_bbox_head=dict(
        type='TransFusionHead', num_proposals=200, auxiliary=True,
        in_channels=512, hidden_channel=128, num_classes=10,
        num_decoder_layers=1, num_heads=8, nms_kernel_size=3,
        ffn_channel=256, dropout=0.1, bn_momentum=0.1, activation='relu',
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(
            type='TransFusionBBoxCoder', pc_range=point_cloud_range[:2],
            voxel_size=voxel_size[:2], out_size_factor=out_size_factor,
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            score_threshold=0.0, code_size=10),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2,
                      alpha=0.25, reduction='mean', loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', reduction='mean', loss_weight=0.25),
        loss_heatmap=dict(type='GaussianFocalLoss', reduction='mean',
                          loss_weight=1.0)),
    train_cfg=dict(pts=dict(
        dataset='nuScenes',
        assigner=dict(
            type='HungarianAssigner3D',
            iou_calculator=dict(type='BboxOverlaps3D', coordinate='lidar'),
            cls_cost=dict(type='FocalLossCost', gamma=2, alpha=0.25,
                          weight=0.15),
            reg_cost=dict(type='BBoxBEVL1Cost', weight=0.25),
            iou_cost=dict(type='IoU3DCost', weight=0.25)),
        pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
        grid_size=[1440, 1440, 40], voxel_size=voxel_size,
        out_size_factor=out_size_factor,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
        point_cloud_range=point_cloud_range)),
    test_cfg=dict(pts=dict(
        dataset='nuScenes', grid_size=[1440, 1440, 40],
        out_size_factor=out_size_factor, pc_range=point_cloud_range[0:2],
        voxel_size=voxel_size[:2], nms_type=None)))

optimizer = dict(type='AdamW', lr=0.0001, betas=(0.9, 0.999),
                 weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 0.0001), cyclic_times=1,
                 step_ratio_up=0.4)
total_epochs = 20
checkpoint_config = dict(interval=1)
log_config = dict(interval=50, hooks=[
    dict(type='TextLoggerHook'),
    dict(type='TensorboardLoggerHook'),
])  # reference configs/MSMDFusion_nusc_voxel_LC.py:296-299
