"""Part-A2 two-stage detector.

TPU-native equivalent of mmdet3d/models/detectors/parta2.py: SparseUNet
middle encoder (BEV + full-resolution per-voxel "part" features), an
anchor-based RPN over the BEV map, then RoI refinement with part-aware
pooling — proposals are a fixed top-K set instead of dynamic NMS output.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import voxelize_batch
from ...registry import (BACKBONES, DETECTORS, HEADS, MIDDLE_ENCODERS, NECKS,
                         VOXEL_ENCODERS)


@DETECTORS.register('PartA2')
class PartA2(nn.Module):
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    rpn_head: Any = None
    roi_head: Any = None
    num_proposals: int = 128
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.voxel_encoder = VOXEL_ENCODERS.build(dict(self.pts_voxel_encoder))
        self.middle_encoder = MIDDLE_ENCODERS.build(
            dict(self.pts_middle_encoder))
        self.backbone = BACKBONES.build(dict(self.pts_backbone))
        self.neck = NECKS.build(dict(self.pts_neck)) if self.pts_neck else None
        rpn_cfg = dict(self.rpn_head)
        rpn_cfg['train_cfg'] = (dict(self.train_cfg.get('rpn', {}))
                                if self.train_cfg else None)
        rpn_cfg['test_cfg'] = dict((self.test_cfg or {}).get('rpn', {}))
        self.rpn = HEADS.build(rpn_cfg)
        roi_cfg = dict(self.roi_head)
        roi_cfg['train_cfg'] = (dict(self.train_cfg.get('rcnn', {}))
                                if self.train_cfg else None)
        roi_cfg['test_cfg'] = dict((self.test_cfg or {}).get('rcnn', {}))
        self.roi = HEADS.build(roi_cfg)
        # pointwise semantic branch: seg score + intra-object part coords
        # (reference PointwiseSemanticHead, part_aggregation_roi_head
        # _semantic_forward_train :296-316)
        self.seg_fc = nn.Dense(64, name='semantic_fc')
        self.seg_out = nn.Dense(1, name='semantic_seg')
        self.part_out = nn.Dense(3, name='semantic_part')

    def __call__(self, points, points_mask, train: bool = False):
        vl = self.pts_voxel_layer
        max_voxels = vl['max_voxels']
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0] if train else max_voxels[1]
        voxels, num_points, coors, valid = voxelize_batch(
            points, points_mask, vl['voxel_size'], vl['point_cloud_range'],
            vl['max_num_points'], max_voxels)
        voxel_features = self.voxel_encoder(voxels, num_points, coors)
        bev, seg = self.middle_encoder(voxel_features, coors, valid,
                                       points.shape[0], train=train)
        feats = self.backbone(bev, train=train)
        if self.neck is not None:
            feats = self.neck(feats, train=train)
        rpn_out = self.rpn(feats[0], train=train)

        # fixed top-K proposals from RPN scores (replaces NMS proposal gen)
        res = self.rpn.get_bboxes(rpn_out)
        scores = jnp.where(res['valid'], res['scores'], -1e9)
        b = scores.shape[0]
        k = min(self.num_proposals, scores.shape[1])
        _, top = jax.lax.top_k(scores, k)
        rois = jnp.take_along_axis(res['boxes'], top[..., None], axis=1)
        roi_valid = jnp.take_along_axis(res['valid'], top, axis=1)

        # per-voxel part features at full resolution (single-sample pooling;
        # loop over the small batch)
        vl_size = jnp.asarray(vl['voxel_size'])
        pcr = jnp.asarray(vl['point_cloud_range'][:3])
        # pointwise semantic predictions feed the part-aware RoI pooling
        sem = jnp.maximum(self.seg_fc(seg.features), 0)
        seg_logit = self.seg_out(sem)                       # [P, 1]
        part_reg = jax.nn.sigmoid(self.part_out(sem))       # [P, 3]
        part_feats = jnp.concatenate(
            [part_reg, jax.nn.sigmoid(seg_logit)], axis=-1)
        centers = (seg.coords[:, 1:][:, ::-1].astype(jnp.float32) + 0.5) \
            * vl_size + pcr
        roi_outs = []
        for bi in range(b):
            sel = seg.coords[:, 0] == bi
            roi_outs.append(self.roi(
                centers, seg.features, seg.valid & sel, rois[bi],
                roi_valid[bi], part_feats=part_feats, train=train))
        roi_out = {key: jnp.stack([r[key] for r in roi_outs])
                   for key in roi_outs[0]}
        return {'rpn': rpn_out, 'roi': roi_out,
                'semantic': {'seg_logit': seg_logit, 'part_reg': part_reg,
                             'centers': centers,
                             'coords_b': seg.coords[:, 0],
                             'valid': seg.valid}}

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        losses = self.rpn.loss(preds['rpn'], gt_bboxes, gt_labels, gt_valid)
        losses.update(self._semantic_loss(preds['semantic'], gt_bboxes,
                                          gt_valid))
        b = gt_bboxes.shape[0]
        roi_losses = []
        for bi in range(b):
            roi_losses.append(self.roi.loss(
                {k: v[bi] for k, v in preds['roi'].items()},
                gt_bboxes[bi], gt_labels[bi], gt_valid[bi]))
        for key in roi_losses[0]:
            losses[key] = sum(r[key] for r in roi_losses) / b
        return losses

    def _semantic_loss(self, sem, gt_bboxes, gt_valid):
        """Auxiliary seg/part supervision (reference
        PointwiseSemanticHead.loss): voxel centers inside a gt box are
        foreground; their part target is the normalized intra-box coord."""
        from ...core.boxes import points_in_rbbox
        from ..losses import binary_cross_entropy, smooth_l1_loss
        centers = sem['centers']
        b = gt_bboxes.shape[0]
        seg_losses, part_losses = [], []
        for bi in range(b):
            valid = sem['valid'] & (sem['coords_b'] == bi)
            boxes = gt_bboxes[bi][..., :7]
            inside = points_in_rbbox(centers, boxes)        # [P, G]
            inside = inside & gt_valid[bi][None, :] & valid[:, None]
            fg = jnp.any(inside, axis=1)
            box_id = jnp.argmax(inside, axis=1)
            box = jnp.take(boxes, box_id, axis=0)           # [P, 7]
            local = centers - box[:, :3]
            c, s = jnp.cos(-box[:, 6]), jnp.sin(-box[:, 6])
            lx = local[:, 0] * c - local[:, 1] * s
            ly = local[:, 0] * s + local[:, 1] * c
            lz = local[:, 2]
            part_tgt = jnp.stack(
                [lx / jnp.maximum(box[:, 3], 1e-3) + 0.5,
                 ly / jnp.maximum(box[:, 4], 1e-3) + 0.5,
                 lz / jnp.maximum(box[:, 5], 1e-3)], axis=-1)
            part_tgt = jnp.clip(part_tgt, 0, 1)
            seg_l = binary_cross_entropy(sem['seg_logit'][:, 0],
                                         fg.astype(jnp.float32))
            seg_losses.append(jnp.where(valid, seg_l, 0).sum()
                              / jnp.maximum(valid.sum(), 1))
            part_l = smooth_l1_loss(sem['part_reg'], part_tgt).sum(-1)
            part_losses.append(jnp.where(fg, part_l, 0).sum()
                               / jnp.maximum(fg.sum(), 1))
        return {'loss_semantic_seg': sum(seg_losses) / b,
                'loss_semantic_part': sum(part_losses) / b}

    def get_bboxes(self, preds):
        b = preds['roi']['rois'].shape[0]
        outs = [self.roi.get_bboxes(
            {k: v[bi] for k, v in preds['roi'].items()}) for bi in range(b)]
        return {key: jnp.stack([o[key] for o in outs])
                for key in outs[0]}
