"""TransFusion detection head (transformer decoder over BEV features).

TPU-native re-design of mmdet3d/models/dense_heads/transfusion_head.py:
- PositionEmbeddingLearned (:25-41), TransformerDecoderLayer (:44-122) and
  the functional MHA (:125-504) become channels-last flax modules;
- heatmap-based query initialization with per-class max-pool NMS (:839-874);
- FFN multi-branch prediction head (:507-590);
- Hungarian target assignment (:1092-1218): the reference's per-sample CPU
  scipy ``linear_sum_assignment`` sync becomes a device-native auction LAP
  (ops/matching.py) over fixed-capacity padded GTs — no host round trip;
- losses (:1220-1286) and decode (:1288-1379).

Head outputs use the reference's [B, C, P] channel-first layout so the
bbox coder and loss bookkeeping stay directly comparable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.coders import TransFusionBBoxCoder
from ...core.gaussian import draw_heatmap, gaussian_radius
from ...core.iou3d import boxes_iou_3d
from ...ops.matching import assign_proposals
from ...registry import HEADS, BBOX_CODERS
from ..layers import (ConvModule, MaskedBatchNorm, get_activation,
                      torch_conv_init)
from ..losses import l1_loss, gaussian_focal_loss, sigmoid_focal_loss


class PositionEmbeddingLearned(nn.Module):
    """2-layer pointwise MLP with BN (reference :25-41)."""
    num_pos_feats: int = 288

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        """xyz [B, P, D] -> [B, P, num_pos_feats]."""
        x = nn.Dense(self.num_pos_feats, kernel_init=torch_conv_init)(xyz)
        x = MaskedBatchNorm(momentum=0.1, eps=1e-5)(x, train=train)
        x = jnp.maximum(x, 0)
        return nn.Dense(self.num_pos_feats, kernel_init=torch_conv_init)(x)


class MultiheadAttention(nn.Module):
    """Standard MHA, channels-last (reference :125-504)."""
    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None,
                 train: bool = False):
        """query [B, P, C], key/value [B, S, C] -> [B, P, C]."""
        b, p, c = query.shape
        s = key.shape[1]
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, kernel_init=torch_conv_init)(query)
        k = nn.Dense(c, kernel_init=torch_conv_init)(key)
        v = nn.Dense(c, kernel_init=torch_conv_init)(value)
        q = q.reshape(b, p, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum('bhpd,bhsd->bhps', q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd)
        if attn_mask is not None:
            logits = logits + attn_mask  # additive, broadcast over heads
        weights = jax.nn.softmax(logits, axis=-1)
        if train and self.dropout > 0:
            weights = nn.Dropout(self.dropout, deterministic=False)(weights)
        out = jnp.einsum('bhps,bhsd->bhpd', weights, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, p, c).astype(query.dtype)
        return nn.Dense(c, kernel_init=torch_conv_init)(out)


class TransformerDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN with learned position embeds (:44-122)."""
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = 'relu'
    cross_only: bool = False
    pos_dim: int = 2

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, attn_mask=None,
                 train: bool = False):
        """query [B, P, C], key [B, S, C], query_pos [B, P, D]."""
        self_pe = PositionEmbeddingLearned(self.d_model, name='self_posembed')
        cross_pe = PositionEmbeddingLearned(self.d_model,
                                            name='cross_posembed')
        qpe = self_pe(query_pos, train=train)
        kpe = cross_pe(key_pos, train=train)
        act = get_activation(self.activation)

        def drop(x):
            if train and self.dropout > 0:
                return nn.Dropout(self.dropout, deterministic=False)(x)
            return x

        if not self.cross_only:
            q = query + qpe
            attn_out = MultiheadAttention(
                self.d_model, self.nhead, self.dropout,
                name='self_attn')(q, q, q, train=train)
            query = query + drop(attn_out)
            query = nn.LayerNorm(epsilon=1e-5, name='norm1')(query)

        attn_out = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name='multihead_attn')(
                query + qpe, key + kpe, key + kpe, attn_mask=attn_mask,
                train=train)
        query = query + drop(attn_out)
        query = nn.LayerNorm(epsilon=1e-5, name='norm2')(query)

        ff = nn.Dense(self.dim_feedforward, kernel_init=torch_conv_init,
                      name='linear1')(query)
        ff = drop(act(ff))
        ff = nn.Dense(self.d_model, kernel_init=torch_conv_init,
                      name='linear2')(ff)
        query = query + drop(ff)
        query = nn.LayerNorm(epsilon=1e-5, name='norm3')(query)
        return query


class FFNHead(nn.Module):
    """Multi-branch 1x1-conv prediction head (reference FFN, :507-590)."""
    heads: Dict[str, Tuple[int, int]]  # name -> (out_ch, num_conv)
    head_conv: int = 64
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, P, C] -> dict of [B, P, out_ch]."""
        out = {}
        for head, (classes, num_conv) in self.heads.items():
            y = x
            for i in range(num_conv - 1):
                y = nn.Dense(self.head_conv, use_bias=True,
                             kernel_init=torch_conv_init,
                             name=f'{head}_{i}')(y)
                y = MaskedBatchNorm(momentum=0.1, eps=1e-5,
                                    name=f'{head}_{i}_bn')(y, train=train)
                y = jnp.maximum(y, 0)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if head == 'heatmap' else nn.initializers.zeros)
            y = nn.Dense(classes, use_bias=True, kernel_init=torch_conv_init,
                         bias_init=bias_init, name=f'{head}_out')(y)
            out[head] = y
        return out


def _local_maximum_nms(heatmap, kernel_size: int, flat_classes: Sequence[int]):
    """Keep only local maxima; some classes use kernel 1 (reference :847-859).

    heatmap: [B, H, W, C] sigmoided.
    """
    if kernel_size <= 1:
        return heatmap
    pad = kernel_size // 2
    pooled = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max,
        (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), 'VALID')
    # reference zeroes the border: place pooled into a zero canvas
    local_max = jnp.zeros_like(heatmap)
    local_max = local_max.at[:, pad:-pad, pad:-pad, :].set(pooled)
    # kernel-1 classes: every cell is its own local max
    if flat_classes:
        cls_idx = jnp.asarray(list(flat_classes))
        local_max = local_max.at[..., cls_idx].set(heatmap[..., cls_idx])
    return jnp.where(heatmap == local_max, heatmap, 0.0)


@HEADS.register('TransFusionHead')
class TransFusionHead(nn.Module):
    num_proposals: int = 128
    auxiliary: bool = True
    in_channels: int = 128 * 3
    hidden_channel: int = 128
    num_classes: int = 4
    num_decoder_layers: int = 3
    num_heads: int = 8
    nms_kernel_size: int = 1
    ffn_channel: int = 256
    dropout: float = 0.1
    bn_momentum: float = 0.1
    activation: str = 'relu'
    common_heads: Any = None
    num_heatmap_convs: int = 2
    initialize_by_heatmap: bool = True
    learnable_query_pos: bool = False
    bbox_coder: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    loss_heatmap: Any = None
    fuse_img: bool = False
    num_views: int = 0
    in_channels_img: int = 64
    out_size_factor_img: int = 4

    def setup(self):
        self.coder = BBOX_CODERS.build(dict(self.bbox_coder))
        if self.test_cfg is not None:
            x_size = self.test_cfg['grid_size'][0] // \
                self.test_cfg['out_size_factor']
            y_size = self.test_cfg['grid_size'][1] // \
                self.test_cfg['out_size_factor']
            self._bev_shape = (y_size, x_size)
        heads = dict(self.common_heads or {})
        heads['heatmap'] = (self.num_classes, self.num_heatmap_convs)
        self._pred_heads = [
            FFNHead(heads, name=f'prediction_head_{i}')
            for i in range(self.num_decoder_layers)]
        self._decoders = [
            TransformerDecoderLayer(
                self.hidden_channel, self.num_heads, self.ffn_channel,
                self.dropout, self.activation, name=f'decoder_{i}')
            for i in range(self.num_decoder_layers)]
        self.shared_conv = nn.Conv(self.hidden_channel, (3, 3), padding=1,
                                   use_bias=True,
                                   kernel_init=torch_conv_init)
        self.heatmap_conv1 = ConvModule(self.hidden_channel, 3, padding=1,
                                        use_bias=True)
        self.heatmap_conv2 = nn.Conv(self.num_classes, (3, 3), padding=1,
                                     use_bias=True,
                                     kernel_init=torch_conv_init)
        self.class_encoding = nn.Dense(self.hidden_channel,
                                       kernel_init=torch_conv_init)
        if self.fuse_img:
            # image-fusion extras (reference :712-745)
            self.shared_conv_img = nn.Conv(
                self.hidden_channel, (3, 3), padding=1, use_bias=True,
                kernel_init=torch_conv_init)
            self.heatmap_conv1_img = ConvModule(
                self.hidden_channel, 3, padding=1, use_bias=True)
            self.heatmap_conv2_img = nn.Conv(
                self.num_classes, (3, 3), padding=1, use_bias=True,
                kernel_init=torch_conv_init)
            self.fc_collapsed = nn.Dense(self.hidden_channel,
                                         kernel_init=torch_conv_init)
            self._img_bev_decoders = [
                TransformerDecoderLayer(
                    self.hidden_channel, self.num_heads, self.ffn_channel,
                    self.dropout, self.activation, cross_only=True,
                    name=f'img_bev_decoder_{v}')
                for v in range(self.num_views)]
            self._img_fusion_decoder = TransformerDecoderLayer(
                self.hidden_channel, self.num_heads, self.ffn_channel,
                self.dropout, self.activation, name='img_fusion_decoder')
            heads = dict(self.common_heads or {})
            heads['heatmap'] = (self.num_classes, self.num_heatmap_convs)
            self._pred_head_fused = FFNHead(heads, name='prediction_head_fused')

    def _bev_pos(self, h, w, dtype=jnp.float32):
        """[1, H*W, 2] cell-center grid (reference create_2D_grid :758-765)."""
        ys = jax.lax.broadcasted_iota(dtype, (h, w), 0) + 0.5
        xs = jax.lax.broadcasted_iota(dtype, (h, w), 1) + 0.5
        return jnp.stack([xs, ys], axis=-1).reshape(1, h * w, 2)

    def __call__(self, inputs, img_inputs=None, metas=None,
                 train: bool = False):
        """inputs: [B, H, W, C_in] fused BEV -> dict of [B, C, P*layers].

        With fuse_img=True, img_inputs is [B, V, h, w, C_img] and metas is a
        dict with 'lidar2img' [B, V, 4, 4] and optional 'img_scale_factor'
        (reference forward_single image branches, :817-1012).
        """
        b, h, w, _ = inputs.shape
        lidar_feat = self.shared_conv(inputs)                # [B, H, W, hid]
        lidar_flat = lidar_feat.reshape(b, h * w, self.hidden_channel)
        bev_pos = jnp.broadcast_to(self._bev_pos(h, w), (b, h * w, 2))

        img_feat = None
        if self.fuse_img and img_inputs is not None:
            v = img_inputs.shape[1]
            ih, iw = img_inputs.shape[2:4]
            img_feat = self.shared_conv_img(
                img_inputs.reshape(b * v, ih, iw, -1))
            img_feat = img_feat.reshape(b, v, ih, iw, self.hidden_channel)
            # image-to-BEV: per-view cross-attn with height-collapsed
            # image columns as keys (reference :817-834)
            collapsed = jnp.max(img_feat, axis=2)            # [B, V, w, hid]
            collapsed = self.fc_collapsed(collapsed)
            bev_feat = lidar_flat
            for vi in range(self.num_views):
                col_x = jax.lax.broadcasted_iota(
                    jnp.float32, (1, iw, 2), 1)[..., :1] + vi * iw + 0.5
                col_pos = jnp.concatenate(
                    [col_x, jnp.full((1, iw, 1), 0.5)], axis=-1)
                col_pos = jnp.broadcast_to(col_pos, (b, iw, 2))
                bev_feat = self._img_bev_decoders[vi](
                    bev_feat, collapsed[:, vi], bev_pos, col_pos,
                    train=train)
            lidar_flat_fused = bev_feat
        else:
            lidar_flat_fused = None

        # heatmap query initialization
        x = self.heatmap_conv1(lidar_feat, train=train)
        dense_heatmap = self.heatmap_conv2(x)                # [B, H, W, C]
        heatmap = jax.nn.sigmoid(jax.lax.stop_gradient(dense_heatmap))
        dense_heatmap_img = None
        if lidar_flat_fused is not None:
            xi = self.heatmap_conv1_img(
                lidar_flat_fused.reshape(b, h, w, self.hidden_channel),
                train=train)
            dense_heatmap_img = self.heatmap_conv2_img(xi)
            heatmap = (heatmap + jax.nn.sigmoid(
                jax.lax.stop_gradient(dense_heatmap_img))) / 2.0
        flat_cls = ()
        if self.test_cfg is not None and \
                self.test_cfg.get('dataset') == 'nuScenes':
            flat_cls = (8, 9)
        elif self.test_cfg is not None and \
                self.test_cfg.get('dataset') == 'Waymo':
            flat_cls = (1, 2)
        heatmap = _local_maximum_nms(heatmap, self.nms_kernel_size, flat_cls)
        heatmap = heatmap.transpose(0, 3, 1, 2).reshape(b, self.num_classes,
                                                        h * w)

        top_scores, top_idx = jax.lax.top_k(
            heatmap.reshape(b, -1), self.num_proposals)
        top_classes = top_idx // (h * w)                     # [B, P]
        top_spatial = top_idx % (h * w)

        query_feat = jnp.take_along_axis(
            lidar_flat, top_spatial[:, :, None], axis=1)     # [B, P, hid]
        one_hot = jax.nn.one_hot(top_classes, self.num_classes)
        query_feat = query_feat + self.class_encoding(one_hot)
        query_pos = jnp.take_along_axis(bev_pos, top_spatial[:, :, None],
                                        axis=1)              # [B, P, 2]

        ret_layers = []
        for i in range(self.num_decoder_layers):
            query_feat = self._decoders[i](query_feat, lidar_flat, query_pos,
                                           bev_pos, train=train)
            res = self._pred_heads[i](query_feat, train=train)
            res['center'] = res['center'] + query_pos
            first_res = res
            query_pos = jax.lax.stop_gradient(res['center'])
            if not (self.fuse_img and img_inputs is not None):
                ret_layers.append(res)

        on_image_any = None
        if self.fuse_img and img_inputs is not None:
            res, on_image_any = self._image_refinement(
                query_feat, query_pos, first_res, img_feat, metas, h, w,
                train=train)
            ret_layers.append(res)

        # concat aux layers along proposals, to channel-first [B, C, P]
        out = {}
        for key in ret_layers[0]:
            out[key] = jnp.concatenate(
                [r[key].transpose(0, 2, 1) for r in ret_layers], axis=-1)
        if dense_heatmap_img is not None:
            dense_heatmap = dense_heatmap_img
        if on_image_any is not None:
            out['on_the_image'] = on_image_any
        out['dense_heatmap'] = dense_heatmap.transpose(0, 3, 1, 2)
        out['query_heatmap_score'] = jnp.take_along_axis(
            heatmap, jnp.broadcast_to(top_spatial[:, None, :],
                                      (b, self.num_classes,
                                       self.num_proposals)), axis=2)
        out['query_labels'] = top_classes
        return out

    def _image_refinement(self, query_feat, query_pos, first_res, img_feat,
                          metas, bev_h, bev_w, train: bool = False):
        """Per-view image cross-attention refinement (reference :903-1012).

        The reference loops samples and views with boolean indexing; here
        every view processes all proposals batched, gaussian-masked
        attention included, and off-image proposals fall back to the
        lidar-only predictions via masks. Later views win ties like the
        reference's sequential overwrite.
        """
        tc = self.test_cfg
        b, v, ih, iw, hid = img_feat.shape
        p = self.num_proposals
        prev_query = jax.lax.stop_gradient(query_feat)

        # decode current boxes for corner projection
        dec = self.coder.decode(
            jax.lax.stop_gradient(first_res['heatmap']).transpose(0, 2, 1),
            jax.lax.stop_gradient(first_res['rot']).transpose(0, 2, 1),
            jax.lax.stop_gradient(first_res['dim']).transpose(0, 2, 1),
            jax.lax.stop_gradient(first_res['center']).transpose(0, 2, 1),
            jax.lax.stop_gradient(first_res['height']).transpose(0, 2, 1),
            None if 'vel' not in first_res else
            jax.lax.stop_gradient(first_res['vel']).transpose(0, 2, 1))
        boxes = dec['bboxes'][..., :7]                       # [B, P, 7]
        from ...core.boxes import corners_3d
        corners = jax.vmap(corners_3d)(boxes)                # [B, P, 8, 3]

        centers_x = query_pos[..., 0] * tc['out_size_factor'] * \
            tc['voxel_size'][0] + tc['pc_range'][0]
        centers_y = query_pos[..., 1] * tc['out_size_factor'] * \
            tc['voxel_size'][1] + tc['pc_range'][1]
        centers = jnp.stack(
            [centers_x, centers_y, first_res['height'][..., 0]], axis=-1)
        pts = jnp.concatenate([centers[:, :, None, :], corners],
                              axis=2)                        # [B, P, 9, 3]

        lidar2img = metas['lidar2img']                       # [B, V, 4, 4]
        scale = metas.get('img_scale_factor', jnp.ones((b, 2)))
        hom = jnp.concatenate([pts, jnp.ones(pts.shape[:-1] + (1,))],
                              axis=-1)                       # [B, P, 9, 4]
        proj = jnp.einsum('bvij,bpkj->bvpki', lidar2img, hom)
        depth = jnp.maximum(proj[..., 2], 1e-5)
        uv = proj[..., :2] / depth[..., None]
        uv = uv * scale[:, None, None, None, :]
        img_h_pad = ih * self.out_size_factor_img
        img_w_pad = iw * self.out_size_factor_img

        ctr_uv = uv[:, :, :, 0, :]                           # [B, V, P, 2]
        on_image = ((ctr_uv[..., 0] > 0) & (ctr_uv[..., 0] < img_w_pad) &
                    (ctr_uv[..., 1] > 0) & (ctr_uv[..., 1] < img_h_pad))

        corner_uv = uv[:, :, :, 1:, :] / self.out_size_factor_img
        extent = (jnp.max(corner_uv, axis=3) -
                  jnp.min(corner_uv, axis=3))                # [B, V, P, 2]
        radius = jnp.ceil(jnp.linalg.norm(extent, axis=-1) / 2.0)
        sigma = (radius * 2 + 1) / 6.0                       # [B, V, P]

        feat_pos = self._bev_pos(ih, iw)                     # [1, ih*iw, 2]
        centers_feat = ctr_uv / self.out_size_factor_img     # [B, V, P, 2]
        d2 = jnp.sum(
            (centers_feat[..., None, :].astype(jnp.int32).astype(jnp.float32)
             - (feat_pos[None] - 0.5)[:, None]) ** 2, axis=-1)
        gauss = jnp.exp(-d2 / (2 * sigma[..., None] ** 2))   # [B, V, P, hw]
        attn_mask = jnp.log(jnp.maximum(gauss, 1e-30))

        new_query = prev_query
        assigned = jnp.full((b, p), -1, jnp.int32)
        for vi in range(v):
            refined = self._img_fusion_decoder(
                prev_query, img_feat[:, vi].reshape(b, ih * iw, hid),
                centers_feat[:, vi], jnp.broadcast_to(feat_pos,
                                                      (b, ih * iw, 2)),
                attn_mask=attn_mask[:, vi][:, None, :, :], train=train)
            sel = on_image[:, vi]
            new_query = jnp.where(sel[..., None], refined, new_query)
            assigned = jnp.where(sel, vi, assigned)
        on_any = assigned >= 0

        fused = jnp.concatenate([new_query, prev_query], axis=-1)
        res = self._pred_head_fused(fused, train=train)
        res['center'] = res['center'] + query_pos
        # off-image proposals keep the lidar-only predictions (:1009-1011)
        for key in res:
            res[key] = jnp.where(on_any[..., None], res[key],
                                 first_res[key])
        return res, on_any

    # ------------------------------------------------------------------
    # loss / targets
    # ------------------------------------------------------------------
    def loss(self, preds: Dict[str, jax.Array], gt_bboxes, gt_labels,
             gt_valid) -> Dict[str, jax.Array]:
        """Training losses (reference loss(), :1220-1286).

        Args:
            preds: forward() output.
            gt_bboxes: [B, G, code] padded bottom-center boxes (w/ velocity).
            gt_labels: [B, G] int labels.
            gt_valid: [B, G] bool.
        """
        tc = self.train_cfg
        num_layers = self.num_decoder_layers if self.auxiliary else 1
        p = self.num_proposals

        (labels, label_weights, bbox_targets, bbox_weights, num_pos,
         matched_ious, heatmap_tgt) = self.get_targets(
             preds, gt_bboxes, gt_labels, gt_valid)
        if 'on_the_image' in preds:
            # image-fusion mode: only supervise proposals on some image
            # (reference :1237-1240)
            m = preds['on_the_image'].astype(label_weights.dtype)
            label_weights = label_weights * m
            bbox_weights = bbox_weights * m[..., None]
            num_pos = jnp.sum(jnp.max(bbox_weights, axis=-1))

        loss_dict = {}
        clipped = jnp.clip(jax.nn.sigmoid(preds['dense_heatmap']), 1e-4,
                           1 - 1e-4)
        hm_avg = jnp.maximum(jnp.sum(heatmap_tgt == 1.0), 1)
        loss_dict['loss_heatmap'] = gaussian_focal_loss(
            clipped, heatmap_tgt).sum() / hm_avg

        code_weights = jnp.asarray(tc['code_weights'])
        for idx in range(num_layers):
            prefix = ('layer_-1' if idx == num_layers - 1 else f'layer_{idx}')
            sl = slice(idx * p, (idx + 1) * p)
            layer_score = preds['heatmap'][..., sl]          # [B, C, P]
            cls_score = layer_score.transpose(0, 2, 1).reshape(
                -1, self.num_classes)
            layer_labels = labels[..., sl].reshape(-1)
            layer_lw = label_weights[..., sl].reshape(-1)
            avg = jnp.maximum(num_pos, 1)
            loss_cls = sigmoid_focal_loss(
                cls_score, layer_labels, self.num_classes,
                gamma=(self.loss_cls or {}).get('gamma', 2.0),
                alpha=(self.loss_cls or {}).get('alpha', 0.25))
            loss_cls = (loss_cls * layer_lw[:, None]).sum() / avg
            loss_dict[f'{prefix}_loss_cls'] = \
                loss_cls * (self.loss_cls or {}).get('loss_weight', 1.0)

            parts = [preds['center'][..., sl], preds['height'][..., sl],
                     preds['dim'][..., sl], preds['rot'][..., sl]]
            if 'vel' in preds:
                parts.append(preds['vel'][..., sl])
            pred_box = jnp.concatenate(parts, axis=1).transpose(0, 2, 1)
            reg_w = bbox_weights[:, sl, :] * code_weights[None, None, :]
            loss_bbox = (jnp.abs(pred_box - bbox_targets[:, sl, :]) *
                         reg_w).sum() / avg
            loss_dict[f'{prefix}_loss_bbox'] = \
                loss_bbox * (self.loss_bbox or {}).get('loss_weight', 1.0)
        loss_dict['matched_ious'] = matched_ious
        return loss_dict

    def get_targets(self, preds, gt_bboxes, gt_labels, gt_valid):
        """Hungarian matching + target tensors (reference :1092-1218)."""
        tc = self.train_cfg
        p = self.num_proposals
        num_layers = self.num_decoder_layers if self.auxiliary else 1
        b = gt_bboxes.shape[0]
        code_size = self.coder.code_size

        preds = {k: (v.astype(jnp.float32)
                     if hasattr(v, 'dtype') and v.dtype == jnp.bfloat16
                     else v) for k, v in preds.items()}
        score = jax.lax.stop_gradient(preds['heatmap'])
        decoded = self.coder.decode(
            jax.lax.stop_gradient(score),
            jax.lax.stop_gradient(preds['rot']),
            jax.lax.stop_gradient(preds['dim']),
            jax.lax.stop_gradient(preds['center']),
            jax.lax.stop_gradient(preds['height']),
            jax.lax.stop_gradient(preds.get('vel')))
        pred_boxes = decoded['bboxes']                       # [B, P*L, 7|9]

        assign_lists = []
        for idx in range(num_layers):
            sl = slice(idx * p, (idx + 1) * p)
            assigned, max_iou = self._hungarian_assign(
                pred_boxes[:, sl, :], score[..., sl], gt_bboxes, gt_labels,
                gt_valid)
            assign_lists.append((assigned, max_iou))
        assigned = jnp.concatenate([a for a, _ in assign_lists], axis=1)
        max_iou = jnp.concatenate([m for _, m in assign_lists], axis=1)

        pos = assigned >= 0                                   # [B, P*L]
        safe = jnp.maximum(assigned, 0)
        gt_for = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)
        enc = jax.vmap(self.coder.encode)(gt_for)             # [B, P*L, code]
        bbox_targets = jnp.where(pos[..., None], enc, 0.0)
        bbox_weights = jnp.where(pos[..., None],
                                 jnp.ones_like(enc), 0.0)
        gt_lab = jnp.take_along_axis(gt_labels, safe, axis=1)
        labels = jnp.where(pos, gt_lab, self.num_classes)
        label_weights = jnp.ones_like(labels, dtype=jnp.float32)
        num_pos = jnp.sum(pos)
        matched_ious = jnp.sum(jnp.where(pos, max_iou, 0)) / \
            jnp.maximum(num_pos, 1)

        # dense heatmap targets
        fm_h, fm_w = self._bev_shape
        vx = tc['voxel_size'][0] * tc['out_size_factor']
        vy = tc['voxel_size'][1] * tc['out_size_factor']
        x0, y0 = tc['point_cloud_range'][0], tc['point_cloud_range'][1]

        def one_sample(boxes, labels_s, valid_s):
            width = boxes[:, 3] / vx
            length = boxes[:, 4] / vy
            radius = gaussian_radius((length, width),
                                     tc['gaussian_overlap'])
            radius = jnp.maximum(tc['min_radius'],
                                 radius.astype(jnp.int32)).astype(jnp.float32)
            cx = ((boxes[:, 0] - x0) / vx).astype(jnp.int32)
            cy = ((boxes[:, 1] - y0) / vy).astype(jnp.int32)
            ok = valid_s & (boxes[:, 3] > 0) & (boxes[:, 4] > 0)
            centers = jnp.stack([cx, cy], axis=-1)
            return draw_heatmap(centers, radius, labels_s, ok,
                                self.num_classes, (fm_h, fm_w))

        heatmap_tgt = jax.vmap(one_sample)(gt_bboxes, gt_labels, gt_valid)
        return (labels, label_weights, bbox_targets, bbox_weights, num_pos,
                matched_ious, heatmap_tgt)

    def _hungarian_assign(self, pred_boxes, cls_score, gt_bboxes, gt_labels,
                          gt_valid):
        """Batched Hungarian assignment (HungarianAssigner3D,
        mmdet3d/core/bbox/assigners/hungarian_assigner.py:96-153).

        Returns (assigned_gt [B, P] int32 (-1 = background), max_iou [B, P]).
        """
        tc = self.train_cfg
        acfg = tc['assigner']
        b, p = pred_boxes.shape[:2]
        g = gt_bboxes.shape[1]

        prob = jax.nn.sigmoid(cls_score).transpose(0, 2, 1)   # [B, P, C]
        eps = 1e-12
        gamma = acfg['cls_cost'].get('gamma', 2.0)
        alpha = acfg['cls_cost'].get('alpha', 0.25)
        neg_cost = -jnp.log(1 - prob + eps) * (1 - alpha) * prob ** gamma
        pos_cost = -jnp.log(prob + eps) * alpha * (1 - prob) ** gamma
        safe_lab = jnp.maximum(gt_labels, 0)
        cls_cost = (jnp.take_along_axis(pos_cost, safe_lab[:, None, :], 2) -
                    jnp.take_along_axis(neg_cost, safe_lab[:, None, :], 2))
        cls_cost = cls_cost * acfg['cls_cost'].get('weight', 1.0)

        pcr = tc['point_cloud_range']
        span = jnp.asarray([pcr[3] - pcr[0], pcr[4] - pcr[1]])
        start = jnp.asarray(pcr[:2])
        pxy = (pred_boxes[..., :2] - start) / span
        gxy = (gt_bboxes[..., :2] - start) / span
        reg_cost = jnp.sum(jnp.abs(pxy[:, :, None, :] - gxy[:, None, :, :]),
                           axis=-1) * acfg['reg_cost'].get('weight', 1.0)

        iou = jax.vmap(lambda a, bb: boxes_iou_3d(a[:, :7], bb[:, :7]))(
            pred_boxes, gt_bboxes)                            # [B, P, G]
        iou_cost = -iou * acfg['iou_cost'].get('weight', 1.0)

        cost = cls_cost + reg_cost + iou_cost
        big = 1e8
        cost = jnp.where(gt_valid[:, None, :], cost, big)

        # device-native auction LAP (host callbacks are unsupported on the
        # TPU runtime, and a per-step CPU sync would stall the pipeline)
        assigned = jax.vmap(assign_proposals)(cost, gt_valid)
        safe = jnp.maximum(assigned, 0)
        max_iou = jnp.where(assigned >= 0,
                            jnp.take_along_axis(iou, safe[..., None],
                                                axis=2)[..., 0], 0.0)
        return assigned, max_iou

    # ------------------------------------------------------------------
    # inference decode
    # ------------------------------------------------------------------
    def get_bboxes(self, preds):
        """Decode final-layer proposals (reference get_bboxes :1288-1379).

        Returns dict with [B, P] fixed-size 'bboxes'/'scores'/'labels'/'valid'
        (flagship MSMD config uses nms_type=None, so no NMS here; circle/
        rotated NMS variants live in core.nms for other configs).
        """
        p = self.num_proposals
        preds = {k: (v.astype(jnp.float32)
                     if hasattr(v, 'dtype') and v.dtype == jnp.bfloat16
                     else v) for k, v in preds.items()}
        score = jax.nn.sigmoid(preds['heatmap'][..., -p:])   # [B, C, P]
        one_hot = jax.nn.one_hot(preds['query_labels'], self.num_classes,
                                 axis=1)                      # [B, C, P]
        score = score * preds['query_heatmap_score'] * one_hot
        res = self.coder.decode(
            score, preds['rot'][..., -p:], preds['dim'][..., -p:],
            preds['center'][..., -p:], preds['height'][..., -p:],
            preds.get('vel', None) if preds.get('vel') is None
            else preds['vel'][..., -p:], filter=True)
        return res
