"""TransFusion-L on Waymo (voxel, 3-class, no velocity).

Mirrors reference configs/transfusion_waymo_voxel_L.py: 0.1m voxels over a
[-75.2, 75.2] range (sparse_shape [41, 1504, 1504]), 300 proposals,
code_size 8 (Waymo boxes carry no velocity).
"""
point_cloud_range = [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0]
voxel_size = [0.1, 0.1, 0.15]
out_size_factor = 8
class_names = ['Car', 'Pedestrian', 'Cyclist']
dataset_type = 'WaymoDataset'
data_root = 'data/waymo/kitti_format/'
max_points_per_sample = 180000

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=6,
         use_dim=5),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
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
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=6,
         use_dim=5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'waymo_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names,
               load_interval=5, box_type_3d='LiDAR'),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'waymo_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=True,
             box_type_3d='LiDAR'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'waymo_infos_val.pkl',
              pipeline=test_pipeline, classes=class_names, test_mode=True,
              box_type_3d='LiDAR'))

model = dict(
    type='TransFusionDetector',
    pts_voxel_layer=dict(
        max_num_points=5, voxel_size=voxel_size,
        max_voxels=(150000, 150000), point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=5, sparse_shape=[41, 1504, 1504],
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
        type='TransFusionHead', num_proposals=300, auxiliary=True,
        in_channels=512, hidden_channel=128, num_classes=3,
        num_decoder_layers=1, num_heads=8, nms_kernel_size=3,
        ffn_channel=256, dropout=0.1, bn_momentum=0.1, activation='relu',
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2)),
        bbox_coder=dict(
            type='TransFusionBBoxCoder', pc_range=point_cloud_range[:2],
            voxel_size=voxel_size[:2], out_size_factor=out_size_factor,
            post_center_range=[-80.0, -80.0, -10.0, 80.0, 80.0, 10.0],
            score_threshold=0.0, code_size=8),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2,
                      alpha=0.25, reduction='mean', loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', reduction='mean', loss_weight=2.0),
        loss_heatmap=dict(type='GaussianFocalLoss', reduction='mean',
                          loss_weight=1.0)),
    train_cfg=dict(pts=dict(
        dataset='Waymo',
        assigner=dict(
            type='HungarianAssigner3D',
            iou_calculator=dict(type='BboxOverlaps3D', coordinate='lidar'),
            cls_cost=dict(type='FocalLossCost', gamma=2, alpha=0.25,
                          weight=0.6),
            reg_cost=dict(type='BBoxBEVL1Cost', weight=2.0),
            iou_cost=dict(type='IoU3DCost', weight=2.0)),
        pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
        grid_size=[1504, 1504, 40], voxel_size=voxel_size,
        out_size_factor=out_size_factor,
        code_weights=[1.0] * 8,
        point_cloud_range=point_cloud_range)),
    test_cfg=dict(pts=dict(
        dataset='Waymo', grid_size=[1504, 1504, 40],
        out_size_factor=out_size_factor, pc_range=point_cloud_range[:2],
        voxel_size=voxel_size[:2], nms_type=None)))

optimizer = dict(type='AdamW', lr=0.0001, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 0.0001), cyclic_times=1,
                 step_ratio_up=0.4)
total_epochs = 36
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
