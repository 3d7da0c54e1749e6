"""3DSSD (SSD3DNet) on KITTI single-class Car.

Mirrors reference configs/3dssd/3dssd_kitti-3d-car.py +
configs/_base_/models/3dssd.py on this framework's point-based zoo.
"""
point_cloud_range = [0, -40, -5, 70, 40, 3]
class_names = ['Car']
dataset_type = 'KittiDataset'
data_root = 'data/kitti/'
num_points = 16384

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='ObjectNoise', num_try=100, translation_std=[1.0, 1.0, 0],
         global_rot_range=[0.0, 0.0],
         rot_range=[-1.0471975511965976, 1.0471975511965976]),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.9, 1.1]),
    dict(type='BackgroundPointsFilter', bbox_enlarge_range=(0.5, 2.0, 0.5)),
    dict(type='IndoorPointSample', num_points=num_points),
    dict(type='PadGroundTruth', max_gt=64),
    dict(type='FormatBundle3D', class_names=class_names),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=4,
         use_dim=4),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='IndoorPointSample', num_points=num_points),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'kitti_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names,
               box_type_3d='LiDAR'),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'kitti_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=True,
             box_type_3d='LiDAR'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'kitti_infos_val.pkl',
              pipeline=test_pipeline, classes=class_names, test_mode=True,
              box_type_3d='LiDAR'))

model = dict(
    type='SSD3DNet',
    backbone=dict(
        type='PointNet2SAMSG', in_channels=4,
        num_points=(4096, 512, 256),
        radii=((0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8)),
        num_samples=((32, 32, 64), (32, 32, 64), (32, 32, 32)),
        sa_channels=(((16, 16, 32), (16, 16, 32), (32, 32, 64)),
                     ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
                     ((128, 128, 256), (128, 192, 256), (128, 256, 256)))),
    bbox_head=dict(
        type='SSD3DHead', num_classes=1, in_channels=768,
        num_candidates=256, num_dir_bins=12, aggregation_radius=4.8,
        aggregation_samples=16),
    train_cfg=dict(sample_mod='spec', pos_distance_thr=10.0,
                   expand_dims_length=0.05),
    test_cfg=dict(nms_thr=0.1, score_thr=0.0, per_class_proposal=True,
                  max_output_num=100))

optimizer = dict(type='AdamW', lr=0.002, weight_decay=0.0)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[45, 60])
total_epochs = 80
log_config = dict(interval=30)
checkpoint_config = dict(interval=1)
