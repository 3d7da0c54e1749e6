"""ImVoteNet on SUNRGBD 10-class (LiDAR + image vote cues).

Mirrors reference configs/imvotenet/imvotenet_stage2_16x8_sunrgbd-3d-10class
.py: the VoteNet point branch plus 2D-detection vote lifting (VoteFusion).
The 2D detector itself is an offline artifact (metas['bboxes_2d']) like the
reference's stage-1 Faster R-CNN outputs.
"""
_base_ = 'votenet_sunrgbd.py'

model = dict(
    type='ImVoteNet',
    img_backbone=dict(type='ResNet', depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
    img_neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, num_outs=5))
