"""Dynamic-voxelization SECOND on KITTI 3-class.

Mirrors reference configs/dynamic_voxelization/dv_second_secfpn_2x8_cosine_
80e_kitti-3d-3class.py: the second_kitti stack with DynamicVoxelNet
(dynamic voxelize + DynamicSimpleVFE; no per-voxel point caps).
"""
_base_ = 'second_kitti.py'

point_cloud_range = [0, -40, -3, 70.4, 40, 1]
voxel_size = [0.05, 0.05, 0.1]

model = dict(
    type='DynamicVoxelNet',
    pts_voxel_layer=dict(
        # reference dv has NO caps; static shapes need one — 40k covers a
        # KITTI scan's in-range voxel count with ~2.3x headroom
        max_num_points=-1, voxel_size=voxel_size,
        max_voxels=(40000, 40000), point_cloud_range=point_cloud_range),
    # the dynamic path mean-reduces points per voxel inside extract_feat
    # (dynamic_scatter); HardSimpleVFE here only records num_features
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=4))

optimizer = dict(type='AdamW', lr=0.003, weight_decay=0.001)
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4),
                 cyclic_times=1, step_ratio_up=0.4)
total_epochs = 80
