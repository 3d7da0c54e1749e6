"""TransFusion-L on nuScenes pillars (no sparse conv).

Mirrors reference configs/transfusion_nusc_pillar_L.py: 0.2m pillars,
PillarFeatureNet(64) + PointPillarsScatter(512x512) + 3-stage SECOND, the
same TransFusion head at out_size_factor 4.
"""
_base_ = 'transfusion_nusc_voxel_L.py'

point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
voxel_size = [0.2, 0.2, 8.0]
out_size_factor = 4

model = dict(
    pts_voxel_layer=dict(
        max_num_points=20, voxel_size=voxel_size,
        max_voxels=(30000, 60000), point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(
        type='PillarFeatureNet', in_channels=5, feat_channels=[64],
        with_distance=False, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range),
    pts_middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64, output_shape=[540, 540]),
    pts_backbone=dict(
        type='SECOND', in_channels=64, out_channels=[64, 128, 256],
        layer_nums=[3, 5, 5], layer_strides=[2, 2, 2]),
    pts_neck=dict(
        type='SECONDFPN', in_channels=[64, 128, 256],
        out_channels=[128, 128, 128], upsample_strides=[1, 2, 4]),
    pts_bbox_head=dict(
        in_channels=384,
        bbox_coder=dict(voxel_size=voxel_size[:2],
                        out_size_factor=out_size_factor)),
    train_cfg=dict(pts=dict(
        grid_size=[540, 540, 1], voxel_size=voxel_size,
        out_size_factor=out_size_factor)),
    test_cfg=dict(pts=dict(
        grid_size=[540, 540, 1], out_size_factor=out_size_factor,
        voxel_size=voxel_size[:2])))
