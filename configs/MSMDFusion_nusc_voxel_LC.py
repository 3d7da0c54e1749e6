"""MSMDFusion LiDAR+Camera flagship config (TPU-native stack).

Mirrors the reference configs/MSMDFusion_nusc_voxel_LC.py hyperparameters:
MDU virtual points + multi-scale GMA fusion + TransFusion head.
"""
_base_ = '_base_/nuscenes_data.py'

point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
voxel_size = [0.075, 0.075, 0.2]
out_size_factor = 8
img_scale = (800, 448)
num_views = 6

input_modality = dict(use_lidar=True, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

# fixed capacities for the static-shape multimodal pipeline
fg_max_points_per_cam = 25000
fg_real_max_points_per_cam = 20000

class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]
dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
max_points_per_sample = 300000

# full multimodal train pipeline (reference MSMDFusion_nusc_voxel_LC.py:27-62)
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='LoadMultiViewImageFromFiles'),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.785, 0.785],
         scale_ratio_range=[0.9, 1.1], translation_std=[0.5, 0.5, 0.5]),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectNameFilter', classes=class_names),
    dict(type='PointShuffle'),
    # foreground-2D (MDU virtual point) pipeline
    dict(type='LoadForeground2D', dataset=dataset_type),
    dict(type='LoadForeground2DFromMultiSweeps', dataset=dataset_type,
         sweeps_num=10),
    dict(type='GlobalRotTransFilterForeground2D',
         point_cloud_range=point_cloud_range),
    dict(type='MyResize', img_scale=img_scale, keep_ratio=True),
    dict(type='MyNormalize', **img_norm_cfg),
    dict(type='MyPad', size_divisor=32),
    dict(type='ImgScaleCropFlipForeground2D'),
    dict(type='ShuffleForeground2D'),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='PadGroundTruth', max_gt=500),
    dict(type='PadForeground2D', max_points=fg_max_points_per_cam,
         max_real_points=fg_real_max_points_per_cam),
    dict(type='FormatBundle3D', class_names=class_names),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadMultiViewImageFromFiles'),
    dict(type='LoadForeground2D', dataset=dataset_type),
    dict(type='LoadForeground2DFromMultiSweeps', dataset=dataset_type,
         sweeps_num=10),
    dict(type='GlobalRotTransFilterForeground2D',
         point_cloud_range=point_cloud_range),
    dict(type='MyResize', img_scale=img_scale, keep_ratio=True),
    dict(type='MyNormalize', **img_norm_cfg),
    dict(type='MyPad', size_divisor=32),
    dict(type='ImgScaleCropFlipForeground2D'),
    dict(type='PadPoints', max_points=max_points_per_sample),
    dict(type='PadForeground2D', max_points=fg_max_points_per_cam,
         max_real_points=fg_real_max_points_per_cam),
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

model = dict(
    type='MSMDFusionDetector',
    freeze_img=True,
    spatial_shapes=[[41, 1440, 1440], [21, 720, 720], [11, 360, 360],
                    [5, 180, 180]],
    downscale_factors=[1, 2, 4, 8],
    fps_num_list=[2048, 2048, 2048, 2048],
    radius_list=[6, 3, 2, 1],
    max_cluster_samples_list=[200, 100, 50, 25],
    dist_thresh_list=[13.3, 6.6, 3.3, 1.6],
    fg_max_voxels=[40000, 30000, 20000, 10000],
    img_backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, norm_eval=True, style='pytorch'),
    img_neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, num_outs=5),
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
    multimodal_middle_encoder=dict(
        type='SparseMultiModalEncoderPaint',
        in_channels_3D=(16, 32, 64, 128),
        in_channels_2D=(64, 64, 64, 64),
        out_channels=(32, 64, 128, 128),
        padding=(1, 1, (0, 1, 1), 0),
        order=('conv', 'norm', 'act')),
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
                 weight_decay=0.05,
                 paramwise_cfg=dict(custom_keys={'norm': dict(decay_mult=0.)}))
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=1.0 / 1000, step=[4, 5])
total_epochs = 6
checkpoint_config = dict(interval=1)
log_config = dict(interval=50, hooks=[
    dict(type='TextLoggerHook'),
    dict(type='TensorboardLoggerHook'),
])  # reference configs/MSMDFusion_nusc_voxel_LC.py:296-299
freeze_lidar_components = True
