"""TransFusion-LC on nuScenes pillars (pillar stack + head image fusion).

Mirrors reference configs/transfusion_nusc_pillar_LC.py: the pillar-L
stack plus a frozen ResNet50+FPN image branch and fuse_img=True.
"""
_base_ = 'transfusion_nusc_pillar_L.py'

num_views = 6

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

input_modality = dict(use_lidar=True, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
