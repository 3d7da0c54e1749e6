"""SECOND on KITTI 3-class (the minimum end-to-end slice, BASELINE config 1).

Mirrors reference configs/_base_/models/hv_second_secfpn_kitti.py.
"""
point_cloud_range = [0, -40, -3, 70.4, 40, 1]
voxel_size = [0.05, 0.05, 0.1]
class_names = ['Pedestrian', 'Cyclist', 'Car']
dataset_type = 'KittiDataset'
data_root = 'data/kitti/'

max_points_per_sample = 40000

model = dict(
    type='VoxelNet',
    pts_voxel_layer=dict(
        max_num_points=5, voxel_size=voxel_size, max_voxels=(16000, 40000),
        point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=4),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=4, sparse_shape=[41, 1600, 1408],
        output_channels=128, order=('conv', 'norm', 'act'),
        encoder_channels=((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)),
        encoder_paddings=((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)),
        block_type='conv_module'),
    pts_backbone=dict(
        type='SECOND', in_channels=256, out_channels=[128, 256],
        layer_nums=[5, 5], layer_strides=[1, 2]),
    pts_neck=dict(
        type='SECONDFPN', in_channels=[128, 256], out_channels=[256, 256],
        upsample_strides=[1, 2]),
    pts_bbox_head=dict(
        type='Anchor3DHead', num_classes=3, in_channels=512,
        feat_channels=512, use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -1.78, 70.4, 40.0, -1.78]],
            sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73], [1.6, 3.9, 1.56]],
            rotations=[0, 1.57], reshape_out=False),
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=7),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.1111111, loss_weight=2.0),
        loss_dir=dict(type='CrossEntropyLoss', loss_weight=0.2)),
    train_cfg=dict(pts=dict(
        pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45,
        point_cloud_range=point_cloud_range)),
    test_cfg=dict(pts=dict(
        use_rotate_nms=True, nms_across_levels=False, nms_thr=0.01,
        score_thr=0.1, min_bbox_size=0, nms_pre=100, max_num=50)))

# reference configs/_base_/datasets/kitti-3d-3class.py pipelines, with the
# static-shape PadPoints/PadGroundTruth capacities of this framework
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='PadGroundTruth', max_gt=128),
    dict(type='FormatBundle3D', class_names=class_names),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]
data = dict(
    samples_per_gpu=6,
    workers_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'kitti_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names,
               test_mode=False, box_type_3d='LiDAR'),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'kitti_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names,
             test_mode=True, box_type_3d='LiDAR'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'kitti_infos_val.pkl',
              pipeline=test_pipeline, classes=class_names,
              test_mode=True, box_type_3d='LiDAR'))
optimizer = dict(type='AdamW', lr=0.0018, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4), cyclic_times=1,
                 step_ratio_up=0.4)
total_epochs = 40
