"""Indoor / auxiliary detector zoo: SSD3DNet, H3DNet, ImVoteNet,
MVXFasterRCNN.

TPU-native equivalents of the remaining mmdet3d detector inventory
(mmdet3d/models/detectors/__init__.py:1-31). These share the point-based
machinery (PointNet++ backbones, vote-style heads, projection fusion):

- ``SSD3DNet`` (ssd3dnet.py): single-stage point detector — PointNet++
  backbone + vote-style candidate head (the reference SSD3DHead's F-FPS
  candidate generation is approximated by the backbone's FPS sampling).
- ``H3DNet`` (h3dnet.py): VoteNet with a hybrid set of geometric-primitive
  refinement targets; here the primitive branches are additional VoteHead
  outputs (structural coverage; full primitive matching queued in PLAN.md).
- ``ImVoteNet`` (imvotenet.py): VoteNet + image votes — 2D detections are
  lifted by projecting seed points into the image and gathering image
  features (fusion_layers.project_points_to_image).
- ``MVXFasterRCNN`` (mvx_faster_rcnn / mvx_two_stage.py): the generic
  LiDAR+camera voxel detector where voxel features are decorated with
  sampled image features (PointFusion) before the middle encoder.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import voxelize_batch
from ...registry import (BACKBONES, DETECTORS, FUSION_LAYERS, HEADS,
                         MIDDLE_ENCODERS, NECKS, VOXEL_ENCODERS)
from .votenet import VoteNet


@DETECTORS.register('SSD3DNet')
class SSD3DNet(VoteNet):
    """3DSSD single-stage point detector.

    Reference mmdet3d/models/detectors/ssd3dnet.py: PointNet2SAMSG backbone
    + SSD3DHead (F-FPS candidates, spatial shift, centerness targets,
    corner loss — heads/ssd3d_head.py). Assembly is VoteNet-shaped.
    """


@DETECTORS.register('H3DNet')
class H3DNet(nn.Module):
    """H3DNet: VoteNet proposals + geometric-primitive refinement.

    Reference mmdet3d/models/detectors/h3dnet.py (+ primitive_head.py:967,
    h3d_bbox_head.py:932): a backbone feeds (a) a VoteHead for initial
    proposals, (b) three PrimitiveHeads (z/xy/line face+edge centers), and
    an H3DBboxHead matches predicted primitives against each proposal's
    expected primitive locations to refine boxes and rescore objectness.
    The reference runs 4 backbone towers; here one shared backbone feeds
    all heads (documented simplification).
    """
    backbone: Any = None
    bbox_head: Any = None         # VoteHead config (initial proposals)
    primitive_list: Any = None    # list of PrimitiveHead configs
    refine_head: Any = None       # H3DBboxHead config
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.backbone_net = BACKBONES.build(dict(self.backbone))
        head_cfg = dict(self.bbox_head)
        head_cfg['train_cfg'] = dict(self.train_cfg) if self.train_cfg \
            else None
        head_cfg['test_cfg'] = dict(self.test_cfg) if self.test_cfg else None
        self.head = HEADS.build(head_cfg)
        prim_cfgs = self.primitive_list or [
            dict(type='PrimitiveHead', primitive_mode=m)
            for m in ('z', 'xy', 'line')]
        self.primitive_heads = [HEADS.build(dict(c)) for c in prim_cfgs]
        self.refine = HEADS.build(dict(
            self.refine_head or dict(type='H3DBboxHead')))

    def __call__(self, points, points_mask, train: bool = False):
        feat_dict = self.backbone_net(points, points_mask, train=train)
        vote_preds = self.head(feat_dict, train=train)
        primitives = {}
        for ph in self.primitive_heads:
            primitives.update(ph(feat_dict, train=train))
        proposals = self.head.get_bboxes(vote_preds)
        refine_preds = self.refine(proposals, primitives, train=train)
        return dict(vote=vote_preds, primitives=primitives,
                    refine=refine_preds)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        losses = self.head.loss(preds['vote'], gt_bboxes, gt_labels,
                                gt_valid)
        for ph in self.primitive_heads:
            losses.update(ph.loss(preds['primitives'], gt_bboxes, gt_valid))
        losses.update(self.refine.loss(preds['refine'], gt_bboxes,
                                       gt_labels, gt_valid))
        return losses

    def get_bboxes(self, preds):
        out = self.head.get_bboxes(preds['vote'])
        refine = preds['refine']
        obj = jax.nn.softmax(refine['refine_obj'], -1)[..., 1]
        return dict(bboxes=refine['refined_bboxes'],
                    scores=out['scores'] * obj, labels=out['labels'],
                    valid=refine['refine_valid'])


@DETECTORS.register('ImVoteNet')
class ImVoteNet(nn.Module):
    """VoteNet fused with image features at the seed points."""
    backbone: Any = None
    bbox_head: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.backbone_net = BACKBONES.build(dict(self.backbone))
        self.backbone_img = (BACKBONES.build(dict(self.img_backbone))
                             if self.img_backbone else None)
        self.neck_img = (NECKS.build(dict(self.img_neck))
                         if self.img_neck else None)
        head_cfg = dict(self.bbox_head)
        head_cfg['train_cfg'] = dict(self.train_cfg) if self.train_cfg \
            else None
        head_cfg['test_cfg'] = dict(self.test_cfg) if self.test_cfg else None
        self.head = HEADS.build(head_cfg)
        from ..layers import MLP
        from ..fusion_layers import VoteFusion
        self.img_proj = MLP((128,), final_act=True, name='img_proj')
        self.vote_fusion = VoteFusion(
            num_classes=int(dict(self.bbox_head).get('num_classes', 10)),
            max_imvote_per_pixel=3, name='vote_fusion')
        self.cue_proj = MLP((128,), final_act=True, name='cue_proj')

    def __call__(self, points, points_mask, img=None, metas=None,
                 train: bool = False):
        feat_dict = self.backbone_net(points, points_mask, train=train)
        metas = metas or {}
        if img is not None and 'bboxes_2d' in metas:
            # real ImVoteNet path: lift 2D detections into per-seed vote
            # cues (reference imvotenet.py + VoteFusion, vote_fusion.py:12)
            b = img.shape[0]
            seeds = feat_dict['fp_xyz']                      # [B, S, 3]
            s = seeds.shape[1]
            cues_all = []
            for bi in range(b):
                cues, mask = self.vote_fusion(
                    img[bi, 0] if img.ndim == 5 else img[bi],
                    metas['bboxes_2d'][bi], metas['bbox_valid'][bi],
                    seeds[bi], metas['depth2img'][bi],
                    (img.shape[-3], img.shape[-2]))
                k = self.vote_fusion.max_imvote_per_pixel
                # [feat, K*S] -> per-seed mean over the K votes
                per_seed = cues.T.reshape(k, s, -1)
                m = mask.reshape(k, s, 1).astype(per_seed.dtype)
                pooled = (per_seed * m).sum(0) / jnp.maximum(m.sum(0), 1)
                cues_all.append(pooled)
            cue_feats = self.cue_proj(jnp.stack(cues_all))
            feat_dict = dict(feat_dict)
            feat_dict['fp_features'] = jnp.concatenate(
                [feat_dict['fp_features'], cue_feats], axis=-1)
            return self.head(feat_dict, train=train)
        if img is not None and self.backbone_img is not None:
            from ..fusion_layers import project_points_to_image
            b = img.shape[0]
            feats = self.backbone_img(img.reshape(-1, *img.shape[2:]),
                                      train=False)
            if self.neck_img is not None:
                feats = self.neck_img(feats, train=False)
            lvl = feats[0]
            v = img.shape[1]
            lvl = lvl.reshape(b, v, *lvl.shape[1:])
            img_hw = (img.shape[2], img.shape[3])
            fused = []
            for bi in range(b):
                acc = jnp.zeros(
                    (feat_dict['fp_xyz'].shape[1], lvl.shape[-1]))
                for vi in range(v):
                    uv, ok = project_points_to_image(
                        feat_dict['fp_xyz'][bi], metas['lidar2img'][bi, vi],
                        img_hw)
                    scale = lvl.shape[3] / img_hw[1]
                    ui = jnp.clip((uv[:, 0] * scale).astype(jnp.int32), 0,
                                  lvl.shape[3] - 1)
                    vvi = jnp.clip((uv[:, 1] * scale).astype(jnp.int32), 0,
                                   lvl.shape[2] - 1)
                    acc = acc + jnp.where(ok[:, None], lvl[bi, vi][vvi, ui],
                                          0)
                fused.append(acc)
            img_feats = self.img_proj(jnp.stack(fused))
            feat_dict = dict(feat_dict)
            feat_dict['fp_features'] = jnp.concatenate(
                [feat_dict['fp_features'], img_feats], axis=-1)
        return self.head(feat_dict, train=train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        return self.head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds):
        return self.head.get_bboxes(preds)


@DETECTORS.register('MVXFasterRCNN')
class MVXFasterRCNN(nn.Module):
    """Voxel detector with image-feature point decoration (PointFusion)."""
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    fusion_layer: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.voxel_encoder = VOXEL_ENCODERS.build(dict(self.pts_voxel_encoder))
        self.middle_encoder = MIDDLE_ENCODERS.build(
            dict(self.pts_middle_encoder))
        self.backbone = BACKBONES.build(dict(self.pts_backbone))
        self.neck = NECKS.build(dict(self.pts_neck)) if self.pts_neck else None
        self.backbone_img = (BACKBONES.build(dict(self.img_backbone))
                             if self.img_backbone else None)
        self.neck_img = (NECKS.build(dict(self.img_neck))
                         if self.img_neck else None)
        self.fusion = (FUSION_LAYERS.build(dict(self.fusion_layer))
                       if self.fusion_layer else None)
        head_cfg = dict(self.pts_bbox_head)
        head_cfg['train_cfg'] = (dict(self.train_cfg['pts'])
                                 if self.train_cfg else None)
        head_cfg['test_cfg'] = dict(self.test_cfg['pts'])
        self.bbox_head = HEADS.build(head_cfg)

    def __call__(self, points, points_mask, img=None, metas=None,
                 train: bool = False):
        vl = self.pts_voxel_layer
        max_voxels = vl['max_voxels']
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0] if train else max_voxels[1]
        voxels, num_points, coors, valid = voxelize_batch(
            points, points_mask, vl['voxel_size'], vl['point_cloud_range'],
            vl['max_num_points'], max_voxels)
        voxel_features = self.voxel_encoder(voxels, num_points, coors)
        if (img is not None and self.backbone_img is not None and
                self.fusion is not None):
            b, v = img.shape[:2]
            feats = self.backbone_img(img.reshape(b * v, *img.shape[2:]),
                                      train=False)
            if self.neck_img is not None:
                feats = self.neck_img(feats, train=False)
            img_hw = (img.shape[2], img.shape[3])
            # voxel centers as pseudo-points for fusion (single sample loop)
            vs = jnp.asarray(vl['voxel_size'])
            origin = jnp.asarray(vl['point_cloud_range'][:3])
            centers = (coors[:, 1:][:, ::-1].astype(jnp.float32) + 0.5) * \
                vs + origin
            # fuse once per sample (projection matrices differ), then pick
            # each voxel row's own sample via its batch id — a clean batched
            # formulation of the reference's per-sample PointFusion loop
            # (point_fusion.py:306)
            per_view = [f.reshape(b, v, *f.shape[1:]) for f in feats]
            fused = jnp.stack([
                self.fusion([pv[bi] for pv in per_view], centers,
                            voxel_features, metas['lidar2img'][bi], img_hw,
                            train=train)
                for bi in range(b)])                      # [B, K, C]
            row_batch = jnp.clip(coors[:, 0], 0, b - 1)
            voxel_features = jnp.take_along_axis(
                fused, row_batch[None, :, None], axis=0)[0]
            voxel_features = jnp.where(valid[:, None], voxel_features, 0)
        x = self.middle_encoder(voxel_features, coors, valid,
                                points.shape[0], train=train)
        if isinstance(x, tuple):
            x = x[0]
        feats_out = self.backbone(x, train=train)
        if self.neck is not None:
            feats_out = self.neck(feats_out, train=train)
        return self.bbox_head(feats_out[0], train=train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        return self.bbox_head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds):
        return self.bbox_head.get_bboxes(preds)
