"""TransFusion-LC on Waymo (voxel stack + head image fusion, 5 cameras).

Mirrors reference configs/transfusion_waymo_voxel_LC.py.
"""
_base_ = 'transfusion_waymo_voxel_L.py'

num_views = 5  # Waymo has 5 cameras

model = dict(
    freeze_img=True,
    img_backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, norm_eval=True, style='pytorch'),
    img_neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, num_outs=5),
    pts_bbox_head=dict(
        fuse_img=True, num_views=num_views, in_channels_img=256,
        out_size_factor_img=4))

input_modality = dict(use_lidar=True, use_camera=True)
