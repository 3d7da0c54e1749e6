"""CenterPoint voxel nuScenes (TPU-native stack).

Mirrors the reference configs/centerpoint/centerpoint_0075voxel_*.py family.
"""
_base_ = '_base_/nuscenes_data.py'

point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
voxel_size = [0.075, 0.075, 0.2]
out_size_factor = 8

model = dict(
    type='CenterPoint',
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
        type='CenterHead', in_channels=512, share_conv_channel=64,
        tasks=[
            dict(num_class=1, class_names=['car']),
            dict(num_class=2, class_names=['truck', 'construction_vehicle']),
            dict(num_class=2, class_names=['bus', 'trailer']),
            dict(num_class=1, class_names=['barrier']),
            dict(num_class=2, class_names=['motorcycle', 'bicycle']),
            dict(num_class=2, class_names=['pedestrian', 'traffic_cone']),
        ],
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2),
                          vel=(2, 2)),
        bbox_coder=dict(
            type='CenterPointBBoxCoder', pc_range=point_cloud_range[:2],
            voxel_size=voxel_size[:2], out_size_factor=out_size_factor,
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            max_num=500, score_threshold=0.1, code_size=9)),
    train_cfg=dict(pts=dict(
        grid_size=[1440, 1440, 40], voxel_size=voxel_size,
        out_size_factor=out_size_factor, dense_reg=1, gaussian_overlap=0.1,
        max_objs=500, min_radius=2, point_cloud_range=point_cloud_range,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2])),
    test_cfg=dict(pts=dict(
        post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        max_per_img=500, max_pool_nms=False,
        min_radius=[4, 12, 10, 1, 0.85, 0.175], score_threshold=0.1,
        out_size_factor=out_size_factor, voxel_size=voxel_size[:2],
        pc_range=point_cloud_range[:2], nms_type='circle', pre_max_size=1000,
        post_max_size=83, nms_thr=0.2)))

optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4), cyclic_times=1,
                 step_ratio_up=0.4)
total_epochs = 20
