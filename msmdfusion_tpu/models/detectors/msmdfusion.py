"""MSMDFusion: LiDAR + camera detector with MDU virtual points + GMA fusion.

TPU-native re-design of mmdet3d/models/detectors/MSMDFusion.py:92-610
(``MSMDFusionDetector``). The per-sample/per-camera python loops of the
reference become fixed-capacity batched array ops:

- ``extract_img_feat`` (:146-167): ResNet50 + FPN over [B*V, H, W, 3].
- ``depth_aware_channel_compression`` (:335-369): sparse depth canvas via one
  scatter, bilinear resize per level, 5x5/5x5/3x3 compression convs to 49ch.
- ``get_foreground2D`` (:169-238): gather compressed features at foreground
  pixels, score_net(feat | depth | lidar2img) confidence weighting — one
  batched gather + matmul instead of B x 6 loops.
- ``fetch_2D_voxels`` (:371-393): foreground points + decorated features
  voxelized per scale (voxel size x downscale factor), mean-VFE, xyz
  normalized by [13.5, 13.5, 2.0].
- modality split + GMA encoder: see middle_encoders/gma_encoder.py.
- ``SPPModule`` BEV fusion (:47-90): ASPP-style 1x1/3x3/d6/d12 convs.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse.tensor import make_sparse_tensor, to_dense_bev
from ...ops.voxelize import voxelize_batch, voxelize_mean_batch
from ...registry import (BACKBONES, DETECTORS, HEADS, MIDDLE_ENCODERS, NECKS,
                         VOXEL_ENCODERS)
from ..layers import ConvModule, MLP, torch_conv_init
from ..voxel_encoders.voxel_encoder import hard_simple_vfe


class SPPModule(nn.Module):
    """ASPP-style BEV fusion block (reference SPPModule, MSMDFusion.py:47-90)."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [
            ConvModule(self.out_channels, 1, padding=0,
                       norm_eps=1e-3, norm_momentum=0.01)(x, train=train),
            ConvModule(self.out_channels, 3, padding=1,
                       norm_eps=1e-3, norm_momentum=0.01)(x, train=train),
            ConvModule(self.out_channels, 3, padding=1, dilation=6,
                       norm_eps=1e-3, norm_momentum=0.01)(x, train=train),
            ConvModule(self.out_channels, 3, padding=1, dilation=12,
                       norm_eps=1e-3, norm_momentum=0.01)(x, train=train),
        ]
        cat = jnp.concatenate(branches, axis=-1)
        return ConvModule(self.out_channels, 1, padding=0, norm_eps=1e-3,
                          norm_momentum=0.01)(cat, train=train)


@DETECTORS.register('MSMDFusionDetector')
class MSMDFusionDetector(nn.Module):
    freeze_img: bool = True
    spatial_shapes: Sequence[Sequence[int]] = (
        (41, 1440, 1440), (21, 720, 720), (11, 360, 360), (5, 180, 180))
    downscale_factors: Sequence[int] = (1, 2, 4, 8)
    fps_num_list: Sequence[int] = (2048,) * 4
    radius_list: Sequence[float] = (6, 3, 2, 1)
    max_cluster_samples_list: Sequence[int] = (200, 100, 50, 25)
    dist_thresh_list: Sequence[float] = (13.3, 6.6, 3.3, 1.6)
    # fixed 2D-branch voxel capacities per scale (TPU static shapes)
    fg_max_voxels: Sequence[int] = (40000, 30000, 20000, 10000)
    img_backbone: Any = None
    img_neck: Any = None
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    multimodal_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    # 'bfloat16' runs the feature path (image branch, sparse encoders, BEV
    # stack, head attention) in bf16; box decode upcasts to fp32. Cast the
    # params tree to bf16 as well for full effect.
    compute_dtype: str = 'float32'

    def setup(self):
        self.backbone_img = BACKBONES.build(dict(self.img_backbone))
        self.neck_img = NECKS.build(dict(self.img_neck))
        self.voxel_encoder = VOXEL_ENCODERS.build(dict(self.pts_voxel_encoder))
        self.middle_encoder = MIDDLE_ENCODERS.build(
            dict(self.pts_middle_encoder))
        self.mm_encoder = MIDDLE_ENCODERS.build(
            dict(self.multimodal_middle_encoder))
        self.backbone_pts = BACKBONES.build(dict(self.pts_backbone))
        self.neck_pts = NECKS.build(dict(self.pts_neck))
        head_cfg = dict(self.pts_bbox_head)
        head_cfg['train_cfg'] = (dict(self.train_cfg['pts'])
                                 if self.train_cfg else None)
        head_cfg['test_cfg'] = dict(self.test_cfg['pts'])
        self.bbox_head = HEADS.build(head_cfg)

        # depth-aware channel compression convs (reference conv1x1_blocks,
        # MSMDFusion.py:108-124): 5x5, 5x5, 3x3 -> 49 channels
        self.compress_convs = [
            ConvModule(49, k, padding=k // 2, norm_eps=1e-3,
                       norm_momentum=0.01, name=f'compress_{i}')
            for i, k in enumerate((5, 5, 3))]
        # score_net: Linear(49 feat + 1 depth + 16 lidar2img -> 1) + ReLU
        self.score_net = MLP((1,), final_act=True, name='score_net')
        self.bev_fusion = SPPModule(256, name='bev_fusion')

    # ------------------------------------------------------------------
    def extract_img_feat(self, img, train: bool):
        """img [B, V, H, W, 3] -> FPN levels, each [B*V, h, w, 256]."""
        b, v = img.shape[0], img.shape[1]
        flat = img.reshape(b * v, *img.shape[2:])
        if self.compute_dtype == 'bfloat16':
            flat = flat.astype(jnp.bfloat16)
        img_train = train and not self.freeze_img
        feats = self.backbone_img(flat, train=img_train)
        feats = self.neck_img(feats, train=img_train)
        if train and self.freeze_img:
            # reference freeze_img sets requires_grad=False on the image
            # branch (tools/train.py:185-219): no gradient flows into it,
            # so the ResNet50+FPN backward is skipped outright (the optax
            # mask alone would still pay the backward FLOPs)
            feats = [jax.lax.stop_gradient(f) for f in feats]
        return feats

    def depth_aware_compression(self, img_feats, fg_real_pixels, fg_real_mask,
                                input_hw, train: bool):
        """Decorate the first 3 FPN levels with a sparse depth channel.

        fg_real_pixels: [B, V, Mr, 3] (u, v, depth) in input-image scale.
        """
        b, v, mr = fg_real_pixels.shape[:3]
        h, w = input_hw
        u = fg_real_pixels[..., 0].astype(jnp.int32)
        vv = fg_real_pixels[..., 1].astype(jnp.int32)
        depth = fg_real_pixels[..., 2]
        ok = fg_real_mask & (u >= 0) & (u < w) & (vv >= 0) & (vv < h)
        cam = jax.lax.broadcasted_iota(jnp.int32, (b, v, mr), 1) + \
            jax.lax.broadcasted_iota(jnp.int32, (b, v, mr), 0) * v
        flat = (cam * h + vv) * w + u
        flat = jnp.where(ok, flat, b * v * h * w)
        canvas = jnp.zeros((b * v * h * w + 1,), depth.dtype)
        canvas = canvas.at[flat.reshape(-1)].set(depth.reshape(-1),
                                                 mode='drop')
        canvas = canvas[:-1].reshape(b * v, h, w, 1)

        out = []
        for i in range(3):
            feat = img_feats[i]
            fh, fw = feat.shape[1:3]
            sp = jax.image.resize(canvas, (feat.shape[0], fh, fw, 1),
                                  method='bilinear')
            out.append(self.compress_convs[i](
                jnp.concatenate([feat, sp], axis=-1), train=train))
        return out

    def get_foreground2d(self, feat, fg_pixels, fg_points, fg_mask, lidar2img,
                         input_hw):
        """Gather per-pixel features, apply score_net confidence weighting.

        feat: [B*V, h, w, 49]; fg_pixels [B, V, M, 3] (u, v, depth);
        fg_points [B, V, M, Dp]; lidar2img [B, V, 4, 4].
        Returns decorated points [B, V*M, Dp+49] and mask [B, V*M].
        """
        b, v, m = fg_pixels.shape[:3]
        fh, fw = feat.shape[1:3]
        scale = fw / input_hw[1]  # feature-map / input downscale factor
        u = (fg_pixels[..., 0] * scale).astype(jnp.int32)
        vv = (fg_pixels[..., 1] * scale).astype(jnp.int32)
        ok = fg_mask & (u >= 0) & (u < fw) & (vv >= 0) & (vv < fh)
        feat_bv = feat.reshape(b, v, fh, fw, -1)

        def gather_cam(f, uu, vvv):
            return f[vvv, uu]                        # [M, 49]
        gathered = jax.vmap(jax.vmap(gather_cam))(
            feat_bv, jnp.clip(u, 0, fw - 1), jnp.clip(vv, 0, fh - 1))
        gathered = jnp.where(ok[..., None], gathered, 0)

        trans = lidar2img.reshape(b, v, 1, 16)
        trans = jnp.broadcast_to(trans, (b, v, m, 16))
        score_in = jnp.concatenate(
            [gathered, fg_pixels[..., 2:3], trans], axis=-1)
        score = self.score_net(score_in)             # [B, V, M, 1]
        weighted = gathered * score
        pcd = jnp.concatenate([fg_points, weighted], axis=-1)
        return pcd.reshape(b, v * m, -1), ok.reshape(b, v * m)

    def fetch_2d_voxels(self, pcd, mask, scale_idx: int, train: bool):
        """Voxelize decorated foreground points at one scale (:371-393)."""
        vl = self.pts_voxel_layer
        factor = self.downscale_factors[scale_idx]
        voxel_size = [s * factor for s in vl['voxel_size']]
        feats, coors, valid = voxelize_mean_batch(
            pcd, mask, voxel_size, vl['point_cloud_range'],
            self.fg_max_voxels[scale_idx] * pcd.shape[0])
        norm = jnp.asarray([13.5, 13.5, 2.0], feats.dtype)
        feats = feats.at[:, :3].divide(norm)
        return make_sparse_tensor(
            feats, coors, valid, tuple(self.spatial_shapes[scale_idx]),
            pcd.shape[0], assume_sorted=True)

    def extract_pts_feat(self, points, points_mask, img_feats, fg, input_hw,
                         train):
        vl = self.pts_voxel_layer
        max_voxels = vl['max_voxels']
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0] if train else max_voxels[1]
        batch_size = points.shape[0]
        voxel_features, coors, valid = voxelize_mean_batch(
            points, points_mask, vl['voxel_size'], vl['point_cloud_range'],
            max_voxels * batch_size)
        if self.compute_dtype == 'bfloat16':
            voxel_features = voxel_features.astype(jnp.bfloat16)
        x, encode_features, enc_cache = self.middle_encoder(
            voxel_features, coors, valid, batch_size, train=train,
            assume_sorted=True, return_cache=True)
        # the GMA grouped only-3D convs run on exactly these coordinate
        # sets: hand them the encoder's rulebooks (spconv indice_key reuse)
        # so they skip 4 plan+rows builds (~20 ms/iter at full scale)
        shared_plans = [enc_cache.get(('subm', f'subm{i + 1}'))
                        for i in range(4)]

        # multi-scale 2D-branch voxels (reference
        # extract_multiscale_voxel_feat, :400-418)
        comp = self.depth_aware_compression(
            img_feats, fg['fg_real_pixels'], fg['fg_real_mask'], input_hw,
            train)
        feat_list = [comp[0], comp[0], comp[1], comp[2]]
        voxel_2d_list = []
        for i in range(4):
            pcd, mask = self.get_foreground2d(
                feat_list[i], fg['fg_pixels'], fg['fg_points'],
                fg['fg_mask'], fg['lidar2img'], input_hw)
            voxel_2d_list.append(self.fetch_2d_voxels(pcd, mask, i, train))

        stage_outs = self.mm_encoder(
            encode_features[:4], voxel_2d_list, self.fps_num_list,
            self.radius_list, self.max_cluster_samples_list,
            self.dist_thresh_list, train=train, shared_plans=shared_plans)

        x_mm = to_dense_bev(stage_outs[-1])          # [B, 180, 180, 384]
        x = self.bev_fusion(jnp.concatenate([x, x_mm], axis=-1), train=train)
        feats = self.backbone_pts(x, train=train)
        return self.neck_pts(feats, train=train)

    # ------------------------------------------------------------------
    def __call__(self, points, points_mask, img, fg: Dict[str, Any],
                 train: bool = False):
        """Full multimodal forward.

        Args:
            points: [B, N, 5]; points_mask [B, N].
            img: [B, V, H, W, 3] normalized images.
            fg: dict of foreground arrays — fg_pixels [B, V, M, 3],
                fg_points [B, V, M, 15], fg_mask [B, V, M],
                fg_real_pixels [B, V, Mr, 3], fg_real_mask [B, V, Mr],
                lidar2img [B, V, 4, 4]. Pixel coords are in the padded
                input-image scale (img.shape gives the static H, W).
        """
        input_hw = (img.shape[2], img.shape[3])
        img_feats = self.extract_img_feat(img, train)
        pts_feats = self.extract_pts_feat(points, points_mask, img_feats, fg,
                                          input_hw, train)
        return self.bbox_head(pts_feats[0], train=train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        return self.bbox_head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds):
        return self.bbox_head.get_bboxes(preds)
