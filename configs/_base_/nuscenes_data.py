"""nuScenes dataset defaults shared by the LiDAR configs."""
point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]
dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
input_modality = dict(use_lidar=True, use_camera=False, use_radar=False,
                      use_map=False, use_external=False)

# fixed-capacity padding for the TPU static-shape pipeline
max_points_per_sample = 300000

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
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
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=4,
    train=dict(
        type='CBGSDataset',
        dataset=dict(
            type=dataset_type, data_root=data_root,
            ann_file=data_root + 'nuscenes_infos_train.pkl',
            pipeline=train_pipeline, classes=class_names,
            modality=input_modality, test_mode=False, box_type_3d='LiDAR')),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'nuscenes_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names,
             modality=input_modality, test_mode=True, box_type_3d='LiDAR'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'nuscenes_infos_val.pkl',
              pipeline=test_pipeline, classes=class_names,
              modality=input_modality, test_mode=True, box_type_3d='LiDAR'))
