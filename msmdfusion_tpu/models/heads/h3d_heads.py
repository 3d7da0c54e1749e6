"""H3DNet primitive heads + proposal refinement.

TPU-native re-design of mmdet3d/models/dense_heads/primitive_head.py:967
and mmdet3d/models/roi_heads/bbox_heads/h3d_bbox_head.py:932 (round 1
shipped an empty H3DNet alias — these are the real modules):

- ``PrimitiveHead``(type in {'z', 'xy', 'line'}): per-seed primitive flag
  (is the seed on a face/edge of an object?) + a vote-style offset to the
  primitive center. GT primitives derive from boxes: 'z' = the 2 horizontal
  face centers, 'xy' = the 4 vertical face centers, 'line' = the 12 edge
  midpoints (all yaw-rotated).
- ``H3DBboxHead``: refines initial (VoteNet) proposals by aggregating
  predicted-primitive features around each proposal's expected primitive
  locations (ball query on the predicted primitive centers, gated by the
  primitive flags) and regressing box residuals + an objectness rescore.

Both operate on fixed-capacity masked sets; the reference's per-primitive
matching loops become batched closest-primitive assignments.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sampling import ball_query, group_points
from ...registry import HEADS
from ..layers import MLP, torch_conv_init
from ..losses import cross_entropy, smooth_l1_loss

PRIMITIVE_COUNTS = {'z': 2, 'xy': 4, 'line': 12}


def box_primitives(boxes, kind: str):
    """Primitive centers of [_, 7+] boxes -> [..., P, 3].

    'z': top/bottom face centers; 'xy': 4 side face centers;
    'line': 12 edge midpoints. Reference primitive_head.py GT generation.
    """
    ctr = jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 2:3] + boxes[..., 5:6] * 0.5], axis=-1)
    w, l, h = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    yaw = boxes[..., 6]
    zeros = jnp.zeros_like(w)
    if kind == 'z':
        loc = jnp.stack([
            jnp.stack([zeros, zeros, h / 2], -1),
            jnp.stack([zeros, zeros, -h / 2], -1)], axis=-2)
    elif kind == 'xy':
        loc = jnp.stack([
            jnp.stack([w / 2, zeros, zeros], -1),
            jnp.stack([-w / 2, zeros, zeros], -1),
            jnp.stack([zeros, l / 2, zeros], -1),
            jnp.stack([zeros, -l / 2, zeros], -1)], axis=-2)
    else:  # line: 12 edge midpoints
        locs = []
        for sx in (-0.5, 0.5):
            for sy in (-0.5, 0.5):
                locs.append(jnp.stack([sx * w, sy * l, zeros], -1))
        for sx in (-0.5, 0.5):
            for sz in (-0.5, 0.5):
                locs.append(jnp.stack([sx * w, zeros, sz * h], -1))
        for sy in (-0.5, 0.5):
            for sz in (-0.5, 0.5):
                locs.append(jnp.stack([zeros, sy * l, sz * h], -1))
        loc = jnp.stack(locs, axis=-2)                   # [..., 12, 3]
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    rot = jnp.stack([loc[..., 0] * c - loc[..., 1] * s,
                     loc[..., 0] * s + loc[..., 1] * c,
                     loc[..., 2]], axis=-1)
    return ctr[..., None, :] + rot


@HEADS.register('PrimitiveHead')
class PrimitiveHead(nn.Module):
    primitive_mode: str = 'z'          # 'z' | 'xy' | 'line'
    in_channels: int = 256
    train_cfg: Any = None

    @nn.compact
    def __call__(self, feat_dict: Dict[str, jax.Array],
                 train: bool = False):
        feats = feat_dict['fp_features']
        xyz = feat_dict['fp_xyz']
        valid = feat_dict['fp_valid']
        h = MLP((self.in_channels, self.in_channels), final_act=True,
                name='flag_mlp')(feats)
        flag = nn.Dense(2, kernel_init=torch_conv_init, name='flag_out')(h)
        v = MLP((self.in_channels,), final_act=True, name='vote_mlp')(feats)
        offset = nn.Dense(3, kernel_init=torch_conv_init,
                          name='vote_out')(v)
        centers = xyz + jnp.where(valid[..., None], offset, 0)
        feat_res = nn.Dense(feats.shape[-1], kernel_init=torch_conv_init,
                            name='feat_res')(v)
        return {f'{self.primitive_mode}_flag': flag,
                f'{self.primitive_mode}_centers': centers,
                f'{self.primitive_mode}_features': feats + feat_res,
                f'{self.primitive_mode}_valid': valid,
                f'{self.primitive_mode}_xyz': xyz}

    def loss(self, preds, gt_bboxes, gt_valid, near_thr: float = 0.3):
        kind = self.primitive_mode
        xyz = preds[f'{kind}_xyz']
        valid = preds[f'{kind}_valid']
        prim = box_primitives(gt_bboxes, kind)           # [B, G, P, 3]
        b, g, p, _ = prim.shape
        prim = prim.reshape(b, g * p, 3)
        prim_valid = jnp.repeat(gt_valid, p, axis=1)
        d = jnp.sum((xyz[:, :, None, :] - prim[:, None, :, :]) ** 2, -1)
        d = jnp.where(prim_valid[:, None, :], d, 1e10)
        nearest = jnp.argmin(d, -1)
        nearest_d = jnp.sqrt(jnp.min(d, -1))
        on_prim = (nearest_d < near_thr) & valid

        flag_tgt = on_prim.astype(jnp.int32)
        flag_loss = cross_entropy(
            preds[f'{kind}_flag'].reshape(-1, 2), flag_tgt.reshape(-1), 2)
        flag_loss = jnp.where(valid.reshape(-1), flag_loss, 0).sum() / \
            jnp.maximum(valid.sum(), 1)

        tgt_ctr = jnp.take_along_axis(prim, nearest[..., None], axis=1)
        center_loss = smooth_l1_loss(preds[f'{kind}_centers'], tgt_ctr)
        center_loss = jnp.where(on_prim, center_loss.sum(-1), 0).sum() / \
            jnp.maximum(on_prim.sum(), 1)
        return {f'{kind}_flag_loss': flag_loss,
                f'{kind}_center_loss': center_loss}


@HEADS.register('H3DBboxHead')
class H3DBboxHead(nn.Module):
    """Refine proposals by matching predicted primitives.

    Reference h3d_bbox_head.py:932: for each initial proposal, the expected
    primitive locations are computed from its box; predicted primitive
    points within a radius vote for agreement. Here: ball-query the
    predicted primitive centers around each expected location, average
    their (flag-gated) features, and regress refinements + objectness.
    """
    num_proposals: int = 256
    in_channels: int = 256
    num_classes: int = 18
    radius: float = 0.3
    num_samples: int = 8
    train_cfg: Any = None

    @nn.compact
    def __call__(self, proposals: Dict[str, jax.Array],
                 primitives: Dict[str, jax.Array], train: bool = False):
        """proposals: VoteHead decode dict ('bboxes' [B, P, 7], 'valid').

        primitives: merged PrimitiveHead outputs for z/xy/line.
        """
        boxes = proposals['bboxes']
        b, np_, _ = boxes.shape
        gathered = []
        for kind in ('z', 'xy', 'line'):
            exp = box_primitives(boxes, kind)            # [B, P, Pk, 3]
            pk = exp.shape[2]
            centers = primitives[f'{kind}_centers']      # [B, N, 3]
            flag = jax.nn.softmax(primitives[f'{kind}_flag'], -1)[..., 1]
            feats = primitives[f'{kind}_features'] * flag[..., None]
            pvalid = primitives[f'{kind}_valid']
            per_b = []
            for i in range(b):
                q = exp[i].reshape(np_ * pk, 3)
                gi = ball_query(self.radius, self.num_samples, centers[i],
                                q, xyz_valid=pvalid[i])  # [P*Pk, S]
                gf = group_points(feats[i], gi)          # [P*Pk, S, C]
                member = (gi >= 0)[..., None]
                mean = jnp.where(member, gf, 0).sum(1) / \
                    jnp.maximum(member.sum(1), 1)
                per_b.append(mean.reshape(np_, pk, -1).mean(1))
            gathered.append(jnp.stack(per_b))            # [B, P, C]
        agg = jnp.concatenate(gathered, axis=-1)
        h = MLP((self.in_channels, self.in_channels), final_act=True,
                name='refine_mlp')(agg)
        out = nn.Dense(2 + 7, kernel_init=torch_conv_init,
                       name='refine_out')(h)
        return {'refine_obj': out[..., :2],
                'refine_delta': out[..., 2:9],
                'refined_bboxes': boxes + 0.1 * out[..., 2:9],
                'refine_valid': proposals['valid']}

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        boxes = preds['refined_bboxes']
        gt_ctr = jnp.concatenate(
            [gt_bboxes[..., :2],
             gt_bboxes[..., 2:3] + gt_bboxes[..., 5:6] * 0.5], -1)
        p_ctr = jnp.concatenate(
            [boxes[..., :2], boxes[..., 2:3] + boxes[..., 5:6] * 0.5], -1)
        d = jnp.sum((p_ctr[:, :, None] - gt_ctr[:, None]) ** 2, -1)
        d = jnp.where(gt_valid[:, None, :], d, 1e10)
        nearest = jnp.argmin(d, -1)
        nd = jnp.sqrt(jnp.min(d, -1))
        pos = (nd < 0.3) & preds['refine_valid']
        neg = (nd > 0.6) & preds['refine_valid']
        num_pos = jnp.maximum(pos.sum(), 1)

        obj_tgt = pos.astype(jnp.int32)
        w = (pos | neg).astype(jnp.float32)
        obj_loss = cross_entropy(
            preds['refine_obj'].reshape(-1, 2), obj_tgt.reshape(-1), 2)
        obj_loss = (obj_loss * w.reshape(-1)).sum() / jnp.maximum(w.sum(), 1)

        gt_for = jnp.take_along_axis(gt_bboxes[..., :7],
                                     nearest[..., None], axis=1)
        reg_loss = smooth_l1_loss(boxes, gt_for).sum(-1)
        reg_loss = jnp.where(pos, reg_loss, 0).sum() / num_pos
        return {'refine_obj_loss': obj_loss, 'refine_reg_loss': reg_loss}
