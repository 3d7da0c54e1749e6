"""PointPillars + FreeAnchor on nuScenes.

Mirrors reference configs/free_anchor/hv_pointpillars_fpn_sbn-all_free-
anchor_4x8_2x_nus-3d.py: the pillar stack with the FreeAnchor3DHead bag
losses replacing IoU assignment.
"""
_base_ = 'pointpillars_nusc.py'

model = dict(
    pts_bbox_head=dict(
        type='FreeAnchor3DHead',
        pre_anchor_topk=25, bbox_thr=0.5, gamma=2.0, alpha=0.5),
    train_cfg=dict(pts=dict(code_weight=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                                         1.0, 0.25, 0.25])))

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=1.0 / 1000, step=[20, 23])
total_epochs = 24
