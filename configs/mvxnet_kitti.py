"""MVXNet (MVXFasterRCNN / PointFusion) on KITTI 3-class.

Mirrors reference configs/mvxnet/dv_mvx-fpn_second_secfpn_adamw_2x8_80e_
kitti-3d-3class.py: voxel stack with image-feature point decoration
(PointFusion) before the VFE.
"""
_base_ = 'second_kitti.py'

point_cloud_range = [0, -40, -3, 70.4, 40, 1]
voxel_size = [0.05, 0.05, 0.1]

model = dict(
    type='MVXFasterRCNN',
    pts_voxel_layer=dict(
        max_num_points=10, voxel_size=voxel_size, max_voxels=(16000, 40000),
        point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=4),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=4, sparse_shape=[41, 1600, 1408],
        output_channels=128, order=('conv', 'norm', 'act'),
        encoder_channels=((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)),
        encoder_paddings=((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)),
        block_type='conv_module'),
    img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
    img_neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, num_outs=5),
    fusion_layer=dict(type='PointFusion', img_channels=256, pts_channels=4,
                      mid_channels=128, out_channels=4,
                      img_levels=(0, 1, 2, 3, 4)))
