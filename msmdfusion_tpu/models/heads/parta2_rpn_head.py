"""Part-A2 RPN head: Anchor3DHead with class-agnostic proposal NMS.

TPU-native equivalent of
mmdet3d/models/dense_heads/parta2_rpn_head.py:14-311: identical conv
branches/assignment to Anchor3DHead, RPN-prefixed loss keys, and a
class-agnostic NMS that keeps scored, labeled proposals for the RoI stage
(fixed-capacity masked output instead of dynamic concatenation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.boxes import limit_period
from ...core.nms import nms_bev
from ...registry import HEADS
from .anchor3d_head import Anchor3DHead


@HEADS.register('PartA2RPNHead')
class PartA2RPNHead(Anchor3DHead):

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """RPN-prefixed keys (reference :86-125)."""
        losses = super().loss(preds, gt_bboxes, gt_labels, gt_valid)
        out = {'loss_rpn_cls': losses['loss_cls'],
               'loss_rpn_bbox': losses['loss_bbox']}
        if 'loss_dir' in losses:
            out['loss_rpn_dir'] = losses['loss_dir']
        return out

    def get_proposals(self, preds):
        """Class-agnostic NMS proposals (reference :126-311).

        Returns dict with 'boxes' [B, P, code], 'scores', 'labels',
        'valid' — P = test_cfg['nms_post'] proposals per sample.
        """
        tcfg = self.test_cfg
        cls = preds['cls_score']
        b, h, w, _ = cls.shape
        code = self.coder.code_size
        anchors = self._flat_anchors((h, w))
        m = anchors.shape[0]
        scores = jax.nn.sigmoid(cls.reshape(b, m, self.num_classes))
        reg = preds['bbox_pred'].reshape(b, m, code)
        dir_cls = preds.get('dir_cls')
        dir_in = (dir_cls.reshape(b, m, 2) if dir_cls is not None else
                  jnp.zeros((b, m, 2)))
        nms_pre = min(tcfg.get('nms_pre', 1024), m)
        nms_post = tcfg.get('nms_post', 128)

        def one(scores_s, reg_s, dir_s):
            # the proposal score/label is the per-anchor best class
            top_score = jnp.max(scores_s, axis=-1)
            top_label = jnp.argmax(scores_s, axis=-1)
            _, idx = jax.lax.top_k(top_score, nms_pre)
            anc = anchors[idx]
            boxes = self.coder.decode(anc, reg_s[idx])
            dir_label = jnp.argmax(dir_s[idx], axis=-1)
            yaw = limit_period(boxes[..., 6] - self.dir_offset,
                               self.dir_limit_offset, np.pi)
            boxes = boxes.at[..., 6].set(
                yaw + self.dir_offset + np.pi * dir_label)
            sc = top_score[idx]
            lb = top_label[idx]
            valid = sc > tcfg.get('score_thr', 0.0)
            bev = jnp.concatenate(
                [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1)
            # ONE nms over all classes together: class-agnostic
            keep, order = nms_bev(bev, sc, tcfg.get('nms_thr', 0.8),
                                  valid=valid)
            keep_in = jnp.zeros((nms_pre,), bool).at[order].set(keep) & valid
            score_keep = jnp.where(keep_in, sc, -1.0)
            _, sel = jax.lax.top_k(score_keep, nms_post)
            return (boxes[sel], sc[sel], lb[sel],
                    jnp.take(keep_in, sel) & (jnp.take(sc, sel) > 0))

        boxes, sc, lb, valid = jax.vmap(one)(scores, reg, dir_in)
        return {'boxes': boxes, 'scores': sc, 'labels': lb, 'valid': valid}
