"""Part-A2 on KITTI 3-class.

Mirrors reference configs/parta2/hv_PartA2_secfpn_2x8_cyclic_80e_kitti-3d-
3class.py on this framework's two-stage interface (SparseUNet middle
encoder, PartA2RPNHead proposals, dual-branch RoI-aware aggregation head).
"""
_base_ = 'second_kitti.py'

point_cloud_range = [0, -40, -3, 70.4, 40, 1]
voxel_size = [0.05, 0.05, 0.1]

model = dict(
    _delete_=True,  # PartA2 has rpn/roi heads, not the base pts_bbox_head
    type='PartA2',
    pts_voxel_layer=dict(
        max_num_points=5, voxel_size=voxel_size, max_voxels=(16000, 40000),
        point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=4),
    pts_middle_encoder=dict(
        type='SparseUNet', in_channels=4, sparse_shape=[41, 1600, 1408],
        base_channels=16, output_channels=128,
        encoder_channels=((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64)),
        encoder_paddings=((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1)),
        decoder_channels=((64, 64, 64), (64, 64, 32), (32, 32, 16),
                          (16, 16, 16)),
        order=('conv', 'norm', 'act')),
    pts_backbone=dict(type='SECOND', in_channels=256,
                      out_channels=[128, 256], layer_nums=[5, 5],
                      layer_strides=[1, 2]),
    pts_neck=dict(type='SECONDFPN', in_channels=[128, 256],
                  out_channels=[256, 256], upsample_strides=[1, 2]),
    rpn_head=dict(
        type='PartA2RPNHead', num_classes=3, in_channels=512,
        feat_channels=512, use_direction_classifier=True,
        anchor_generator=dict(
            type='Anchor3DRangeGenerator',
            ranges=[[0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -0.6, 70.4, 40.0, -0.6],
                    [0, -40.0, -1.78, 70.4, 40.0, -1.78]],
            sizes=[[0.6, 0.8, 1.73], [0.6, 1.76, 1.73], [1.6, 3.9, 1.56]],
            rotations=[0, 1.57], reshape_out=False),
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=7),
        loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(beta=0.1111111, loss_weight=2.0),
        loss_dir=dict(loss_weight=0.2)),
    roi_head=dict(
        type='PartAggregationROIHead', num_classes=3,
        roi_grid=(14, 14, 14), in_channels=16,
        seg_conv_channels=(64, 64), part_conv_channels=(64, 64),
        merge_conv_channels=(128, 128), down_conv_channels=(128, 256),
        shared_fc_channels=(256, 512, 512, 512),
        cls_channels=(256, 256), reg_channels=(256, 256)),
    num_proposals=128,
    train_cfg=dict(
        rpn=dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
        rcnn=dict(cls_pos_thr=0.75, cls_neg_thr=0.25)),
    test_cfg=dict(
        rpn=dict(nms_pre=1024, nms_thr=0.8, score_thr=0.0, max_num=100),
        rcnn=dict(nms_thr=0.01, score_thr=0.1)))

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4), cyclic_times=1,
                 step_ratio_up=0.4)
total_epochs = 80
