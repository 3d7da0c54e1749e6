"""VoteNet indoor detector.

TPU-native equivalent of mmdet3d/models/detectors/votenet.py: PointNet++
backbone + VoteHead over raw (masked fixed-capacity) point clouds.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ...registry import BACKBONES, DETECTORS, HEADS


@DETECTORS.register('VoteNet')
class VoteNet(nn.Module):
    backbone: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.backbone_net = BACKBONES.build(dict(self.backbone))
        head_cfg = dict(self.bbox_head)
        head_cfg['train_cfg'] = dict(self.train_cfg) if self.train_cfg \
            else None
        head_cfg['test_cfg'] = dict(self.test_cfg) if self.test_cfg else None
        self.head = HEADS.build(head_cfg)

    def __call__(self, points, points_mask, train: bool = False):
        feat_dict = self.backbone_net(points, points_mask, train=train)
        return self.head(feat_dict, train=train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        return self.head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds):
        return self.head.get_bboxes(preds)
