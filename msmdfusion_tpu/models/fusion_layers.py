"""Camera-LiDAR fusion layers.

TPU-native equivalents of mmdet3d/models/fusion_layers/:
- ``apply_3d_transformation`` (coord_transform.py:214): replay / invert the
  recorded 3D augmentation flow on point sets (used by the TransFusion image
  fusion and PointFusion);
- ``PointFusion`` (point_fusion.py:306): sample image features at projected
  point locations and fuse with point features;
- ``VoteFusion`` (vote_fusion.py:12-212): lift 2D detections into per-seed
  geometric/semantic/texture vote cues for ImVoteNet;
- 2D aug replay ``coord_2d_transform`` / ``bbox_2d_transform``
  (coord_transform.py:121-214) and bilinear ``point_sample`` equivalents.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import FUSION_LAYERS
from .layers import MLP, torch_conv_init


def apply_3d_transformation(points, aug_state: Dict[str, Any],
                            reverse: bool = False):
    """Replay (or invert) the recorded aug flow on [N, 3] points.

    aug_state mirrors the pipeline's record: {'angle', 'scale', 'trans',
    'flip_horizontal', 'flip_vertical'} plus an optional
    ``transformation_3d_flow`` list of ops from
    ``('R', 'S', 'T', 'HF', 'VF')`` giving the order the augmentations were
    applied in (reference GlobalRotScaleTrans records it;
    coord_transform.py:7-90 replays / reverses it op-by-op). Without a flow
    the default order R -> S -> T -> HF -> VF is used.
    """
    angle = aug_state.get('angle', 0.0)
    scale = aug_state.get('scale', 1.0)
    trans = jnp.asarray(aug_state.get('trans', (0.0, 0.0, 0.0)))
    flip_h = aug_state.get('flip_horizontal', False)
    flip_v = aug_state.get('flip_vertical', False)
    flow = list(aug_state.get('transformation_3d_flow',
                              ('R', 'S', 'T', 'HF', 'VF')))

    def rot(p, a):
        c, s = jnp.cos(a), jnp.sin(a)
        r = jnp.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], p.dtype)
        return p @ r

    sign = -1.0 if reverse else 1.0
    ops = {
        'R': lambda p: rot(p, sign * angle),
        'S': lambda p: p * (1.0 / scale if reverse else scale),
        'T': lambda p: p - trans if reverse else p + trans,
        'HF': (lambda p: p.at[:, 1].multiply(-1)) if flip_h
        else (lambda p: p),
        'VF': (lambda p: p.at[:, 0].multiply(-1)) if flip_v
        else (lambda p: p),
    }
    if reverse:
        flow = flow[::-1]
    for op in flow:
        points = ops[op](points)
    return points


def extract_2d_aug(img_meta: Dict[str, Any]):
    """(img_h, img_w, scale_factor[2], flip, crop_offset[2]) from meta.

    Reference coord_transform.py:93-119; defaults are the identity aug.
    """
    shape = img_meta.get('img_shape', (1, 1))
    sf = img_meta.get('scale_factor', (1.0, 1.0))
    if jnp.ndim(jnp.asarray(sf)) == 0:
        sf = (float(sf), float(sf))
    return (shape[0], shape[1], jnp.asarray(sf[:2], jnp.float32),
            bool(img_meta.get('flip', False)),
            jnp.asarray(img_meta.get('img_crop_offset', (0.0, 0.0)),
                        jnp.float32))


def coord_2d_transform(img_meta: Dict[str, Any], coord_2d,
                       ori2new: bool = True):
    """Replay (ori2new) or invert the 2D aug on [..., 2] pixel coords.

    Reference coord_transform.py:175-214 (scale -> crop -> flip order).
    """
    img_h, img_w, sf, flip, crop = extract_2d_aug(img_meta)
    coord_2d = jnp.asarray(coord_2d)
    if ori2new:
        out = coord_2d * sf + crop
        if flip:
            out = out.at[..., 0].set(img_w - out[..., 0])
    else:
        out = coord_2d
        if flip:
            out = out.at[..., 0].set(img_w - out[..., 0])
        out = (out - crop) / sf
    return out


def bbox_2d_transform(img_meta: Dict[str, Any], bbox_2d,
                      ori2new: bool = True):
    """Replay / invert the 2D aug on [N, >=4] (x1, y1, x2, y2, ...) boxes.

    Reference coord_transform.py:121-173 — the flip swaps left/right edges.
    """
    img_h, img_w, sf, flip, crop = extract_2d_aug(img_meta)
    bbox_2d = jnp.asarray(bbox_2d)
    xy1 = bbox_2d[..., 0:2]
    xy2 = bbox_2d[..., 2:4]
    if ori2new:
        xy1 = xy1 * sf + crop
        xy2 = xy2 * sf + crop
        if flip:
            new_l = img_w - xy2[..., 0]
            new_r = img_w - xy1[..., 0]
            xy1 = jnp.stack([new_l, xy1[..., 1]], -1)
            xy2 = jnp.stack([new_r, xy2[..., 1]], -1)
    else:
        if flip:
            new_l = img_w - xy2[..., 0]
            new_r = img_w - xy1[..., 0]
            xy1 = jnp.stack([new_l, xy1[..., 1]], -1)
            xy2 = jnp.stack([new_r, xy2[..., 1]], -1)
        xy1 = (xy1 - crop) / sf
        xy2 = (xy2 - crop) / sf
    return jnp.concatenate([xy1, xy2, bbox_2d[..., 4:]], axis=-1)


def bilinear_sample(feat, uv, img_hw):
    """Bilinear image-feature sampling (grid_sample align_corners=False).

    Args:
        feat: [h, w, C] feature map.
        uv: [N, 2] pixel coords in the ORIGINAL image frame ``img_hw``.
    Returns: [N, C].

    Reference point_fusion.py:10-97 samples with F.grid_sample(bilinear).
    """
    fh, fw = feat.shape[:2]
    x = uv[:, 0] * (fw / img_hw[1]) - 0.5
    y = uv[:, 1] * (fh / img_hw[0]) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    out = 0.
    for dy, dx, w in ((0, 0, (1 - wx) * (1 - wy)), (0, 1, wx * (1 - wy)),
                      (1, 0, (1 - wx) * wy), (1, 1, wx * wy)):
        xi = jnp.clip(x0.astype(jnp.int32) + dx, 0, fw - 1)
        yi = jnp.clip(y0.astype(jnp.int32) + dy, 0, fh - 1)
        out = out + feat[yi, xi] * w[:, None]
    return out


def project_points_to_image(points, lidar2img, img_hw,
                            img_scale_factor=None):
    """Project [N, 3] LiDAR points through a [4, 4] lidar2img matrix.

    Returns (uv [N, 2] in padded-image pixels, in_front+on-image mask [N]).
    """
    hom = jnp.concatenate([points, jnp.ones((points.shape[0], 1),
                                            points.dtype)], axis=-1)
    proj = hom @ lidar2img.T
    depth = proj[:, 2]
    uv = proj[:, :2] / jnp.maximum(depth[:, None], 1e-5)
    if img_scale_factor is not None:
        uv = uv * jnp.asarray(img_scale_factor)
    h, w = img_hw
    ok = (depth > 1e-5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < h)
    return uv, ok


@FUSION_LAYERS.register('PointFusion')
class PointFusion(nn.Module):
    """Decorate LiDAR points with sampled multi-level image features.

    Reference: fusion_layers/point_fusion.py:306.
    """
    img_channels: int = 256
    pts_channels: int = 64
    mid_channels: int = 128
    out_channels: int = 128
    img_levels: Sequence[int] = (0, 1, 2, 3, 4)
    align_corners: bool = False
    activate_out: bool = True
    fuse_out: bool = False

    @nn.compact
    def __call__(self, img_feats, points, pts_feats, lidar2img, img_hw,
                 train: bool = False):
        """img_feats: list of [V, h, w, C]; points [N, 3]; pts_feats [N, C].

        Single-sample; vmap externally for batches.
        """
        v = img_feats[0].shape[0]
        sampled = []
        for lvl in self.img_levels:
            feat = img_feats[lvl]
            per_view = []
            for vi in range(v):
                uv, ok = project_points_to_image(points, lidar2img[vi],
                                                 img_hw)
                g = bilinear_sample(feat[vi], uv, img_hw)
                per_view.append(jnp.where(ok[:, None], g, 0))
            sampled.append(sum(per_view))
        img_pts = jnp.concatenate(sampled, axis=-1)
        img_proj = nn.Dense(self.mid_channels,
                            kernel_init=torch_conv_init)(img_pts)
        pts_proj = nn.Dense(self.mid_channels,
                            kernel_init=torch_conv_init)(pts_feats)
        fused = img_proj + pts_proj
        if self.activate_out:
            fused = jnp.maximum(fused, 0)
        if self.fuse_out:
            fused = nn.Dense(self.out_channels,
                             kernel_init=torch_conv_init)(fused)
            fused = jnp.maximum(fused, 0)
        return fused


@FUSION_LAYERS.register('VoteFusion')
class VoteFusion(nn.Module):
    """Lift 2D detections into per-seed image-vote cues (ImVoteNet).

    TPU-native redesign of fusion_layers/vote_fusion.py:12-212: for each 3D
    seed, its projection is tested against every (padded, masked) 2D
    detection; the top ``max_imvote_per_pixel`` seed-box pairs by
    (in-box + confidence) contribute a 15-dim cue [xz-lifted vote (2),
    ray angle (3), per-class semantic confidence (num_classes)] plus a
    3-dim texture cue from the image, all fixed-capacity and jittable.
    Per-sample; vmap externally.
    """
    num_classes: int = 10
    max_imvote_per_pixel: int = 3

    @nn.compact
    def __call__(self, img, bboxes_2d, bbox_valid, seeds_3d, depth2img,
                 img_hw, aug_state=None, img_meta=None):
        """img [H, W, 3] (0-255); bboxes_2d [B, 6] (l, t, r, b, conf, cls);
        bbox_valid [B] bool; seeds_3d [S, 3] DEPTH-frame points;
        depth2img [4, 4] or dict(K=[4, 4], Rt=[3/4, 4])."""
        from ..core import box_modes
        eps = 1e-6
        s = seeds_3d.shape[0]
        b = bboxes_2d.shape[0]
        aug_state = aug_state or {}
        img_meta = img_meta or {}

        xyz_depth = apply_3d_transformation(seeds_3d, aug_state, reverse=True)
        if isinstance(depth2img, dict):
            k_mat = jnp.asarray(depth2img['K'])
            rt = jnp.asarray(depth2img['Rt'])
            xyz_cam = box_modes.convert_points(
                xyz_depth, box_modes.DEPTH, box_modes.CAM, rt_mat=rt)
        else:
            k_mat = jnp.asarray(depth2img)
            xyz_cam = box_modes.convert_points(
                xyz_depth, box_modes.DEPTH, box_modes.CAM)
        hom = jnp.concatenate([xyz_cam, jnp.ones((s, 1), xyz_cam.dtype)], -1)
        proj = hom @ k_mat.T
        uv_origin = jnp.round(
            proj[:, :2] / jnp.maximum(proj[:, 2:3], eps) - 1)
        uv_rescaled = coord_2d_transform(img_meta, uv_origin, True)

        # seed-in-box tests on the ORIGINAL-frame boxes (reference :68-100)
        l, t, r, bo = (bboxes_2d[:, i] for i in range(4))
        conf = jnp.where(bbox_valid, bboxes_2d[:, 4], 0.0)
        cls = bboxes_2d[:, 5].astype(jnp.int32)
        in_x = (uv_origin[:, None, 0] > l) & (uv_origin[:, None, 0] < r)
        in_y = (uv_origin[:, None, 1] > t) & (uv_origin[:, None, 1] < bo)
        in_box = in_x & in_y & bbox_valid[None, :]        # [S, B]

        sem_cue = jax.nn.one_hot(cls, self.num_classes) * conf[:, None]
        sem_cue = jnp.broadcast_to(sem_cue[None], (s, b, self.num_classes))

        # geometric cue: image-plane offset to box center lifted to 3D
        mid_u = (l + r) / 2
        mid_v = (t + bo) / 2
        z_cam = xyz_cam[:, 2:3]
        delta_u = (mid_u[None, :] - uv_origin[:, 0:1]) * z_cam / k_mat[0, 0]
        delta_v = (mid_v[None, :] - uv_origin[:, 1:2]) * z_cam / k_mat[0, 0]
        imvote = jnp.stack(
            [delta_u, delta_v, jnp.zeros_like(delta_u)], -1).reshape(-1, 3)
        if isinstance(depth2img, dict):
            imvote = box_modes.convert_points(
                imvote, box_modes.CAM, box_modes.DEPTH,
                rt_mat=jnp.asarray(depth2img['Rt']))
        else:
            imvote = box_modes.convert_points(imvote, box_modes.CAM,
                                              box_modes.DEPTH)
        imvote = apply_3d_transformation(imvote, aug_state, reverse=False)
        seed_exp = jnp.broadcast_to(seeds_3d[:, None], (s, b, 3)).reshape(
            -1, 3)
        ray = seed_exp + imvote
        ray = ray / jnp.sqrt(jnp.sum(ray ** 2, -1, keepdims=True) + eps)
        xz = ray[:, [0, 2]] / (ray[:, 1:2] + eps) * seed_exp[:, 1:2] \
            - seed_exp[:, [0, 2]]
        geo_cue = jnp.concatenate([xz, ray], -1).reshape(s, b, 5)

        two_cues = jnp.concatenate([geo_cue, sem_cue], -1) * \
            in_box[..., None].astype(jnp.float32)
        feat_dim = 5 + self.num_classes

        # top-k seed-box pairs by in-box + confidence (reference :150-175)
        k = min(self.max_imvote_per_pixel, b) if b else 0
        pair_score = in_box.astype(jnp.float32) + conf[None, :]
        if k < self.max_imvote_per_pixel:
            pad = self.max_imvote_per_pixel - k
            pair_score = jnp.concatenate(
                [pair_score, jnp.zeros((s, pad))], 1)
            two_cues = jnp.concatenate(
                [two_cues, jnp.zeros((s, pad, feat_dim))], 1)
        score, idx = jax.lax.top_k(pair_score, self.max_imvote_per_pixel)
        two_cues = jnp.take_along_axis(two_cues, idx[..., None], axis=1)
        mask = jnp.floor(score).astype(bool)              # [S, K]

        # texture cue: normalized pixel under each seed (reference :177-195)
        h, w = img_hw
        ui = jnp.clip(jnp.round(uv_rescaled[:, 0]).astype(jnp.int32), 0,
                      w - 1)
        vi = jnp.clip(jnp.round(uv_rescaled[:, 1]).astype(jnp.int32), 0,
                      h - 1)
        txt = img[vi, ui].astype(jnp.float32) / 255.0     # [S, 3]
        txt = jnp.broadcast_to(txt[:, None],
                               (s, self.max_imvote_per_pixel, 3))

        cues = jnp.concatenate([two_cues, txt], -1)       # [S, K, 18]
        # reference layout: [feat, K*S] with vote-major flattening
        cues = cues.transpose(1, 0, 2).reshape(
            self.max_imvote_per_pixel * s, feat_dim + 3).T
        mask = mask.T.reshape(-1)
        return cues, mask
