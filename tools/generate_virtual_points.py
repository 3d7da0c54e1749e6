"""Generate MDU virtual-point foreground artifacts (MVP-style).

The reference repo treats ``FOREGROUND_MIXED_6NN_WITH_DEPTH`` as a
*downloaded* artifact (reference README.md:44) produced by the MVP
pipeline ("Multimodal Virtual Point 3D Detection", Yin et al.): 2D
instance detections lift lidar depth onto densely-sampled virtual pixels
which are unprojected back to 3D. This tool closes that gap: given per-
camera 2D instances (masks or boxes) and the lidar sweep it writes
artifacts in exactly the layout `LoadForeground2D` consumes
(datasets/pipelines/foreground.py; reference
my_loading_multi_proj.py:14-120):

    virtual_pixel_indices [M, 3+11]  (u, v, depth, one-hot label block)
    real_pixel_indices    [Mr, 3+11]
    virtual_points        [M, 3]     lidar-frame xyz
    real_points           [Mr, 3]

Depth assignment: each virtual pixel takes the inverse-distance-weighted
depth of its K=6 nearest projected real foreground pixels of the same
instance (the "6NN" in the artifact name).

Usage:
    from generate_virtual_points import generate_sample_artifact
    info = generate_sample_artifact(points, cams)  # then np.save(...)
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

NUM_LABEL_SLOTS = 11   # 10 nuScenes classes + 1 background/ignore slot


def project_points(points: np.ndarray, lidar2img: np.ndarray,
                   img_hw) -> Dict[str, np.ndarray]:
    """Project lidar points into one camera.

    Returns dict(uvd [N, 3], in_img [N] bool): u, v pixel coords + depth;
    points behind the camera or outside the image are masked out.
    """
    n = points.shape[0]
    hom = np.concatenate([points[:, :3], np.ones((n, 1), points.dtype)], 1)
    proj = hom @ lidar2img.T                       # [N, 4]
    depth = proj[:, 2]
    safe = np.where(np.abs(depth) > 1e-6, depth, 1e-6)
    u = proj[:, 0] / safe
    v = proj[:, 1] / safe
    h, w = img_hw
    in_img = (depth > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    return dict(uvd=np.stack([u, v, depth], 1), in_img=in_img)


def _instance_membership(uv: np.ndarray, inst: Dict) -> np.ndarray:
    """bool mask of projected pixels inside the instance (mask or bbox)."""
    if inst.get('mask') is not None:
        m = inst['mask']
        ui = np.clip(uv[:, 0].astype(np.int64), 0, m.shape[1] - 1)
        vi = np.clip(uv[:, 1].astype(np.int64), 0, m.shape[0] - 1)
        return m[vi, ui]
    x1, y1, x2, y2 = inst['bbox']
    return ((uv[:, 0] >= x1) & (uv[:, 0] <= x2)
            & (uv[:, 1] >= y1) & (uv[:, 1] <= y2))


def _sample_virtual_pixels(inst: Dict, num: int,
                           rng: np.random.RandomState) -> np.ndarray:
    """[num, 2] (u, v) samples uniform over the instance mask / box."""
    if inst.get('mask') is not None:
        vs, us = np.nonzero(inst['mask'])
        if len(us) == 0:
            return np.zeros((0, 2), np.float32)
        sel = rng.randint(0, len(us), num)
        jitter = rng.rand(num, 2) - 0.5
        return np.stack([us[sel], vs[sel]], 1) + jitter
    x1, y1, x2, y2 = inst['bbox']
    return np.stack([rng.uniform(x1, x2, num),
                     rng.uniform(y1, y2, num)], 1).astype(np.float32)


def unproject(uv: np.ndarray, depth: np.ndarray,
              lidar2img: np.ndarray) -> np.ndarray:
    """(u, v, depth) -> lidar-frame xyz via the inverse projection."""
    n = uv.shape[0]
    img_pts = np.concatenate(
        [uv * depth[:, None], depth[:, None], np.ones((n, 1))], 1)
    inv = np.linalg.inv(lidar2img)
    out = img_pts @ inv.T
    return out[:, :3] / np.where(np.abs(out[:, 3:4]) > 1e-9, out[:, 3:4], 1)


def generate_camera_foreground(points: np.ndarray, lidar2img: np.ndarray,
                               img_hw, instances: Sequence[Dict],
                               num_virtual: int = 50, k: int = 6,
                               seed: int = 0):
    """One camera's (virtual_pixel_indices, real_pixel_indices,
    virtual_points, real_points).

    instances: list of dicts with 'label' (int < NUM_LABEL_SLOTS - 1) and
    either 'mask' (bool [H, W]) or 'bbox' [x1, y1, x2, y2].
    """
    rng = np.random.RandomState(seed)
    proj = project_points(points, lidar2img, img_hw)
    uvd, in_img = proj['uvd'], proj['in_img']

    vpx, rpx, vpt, rpt = [], [], [], []
    for inst in instances:
        member = in_img & _instance_membership(uvd[:, :2], inst)
        idx = np.nonzero(member)[0]
        onehot = np.zeros((NUM_LABEL_SLOTS,), np.float32)
        onehot[int(inst['label'])] = 1.0
        if len(idx) == 0:
            continue
        real_uvd = uvd[idx].astype(np.float32)
        rpx.append(np.concatenate(
            [real_uvd, np.tile(onehot, (len(idx), 1))], 1))
        rpt.append(points[idx, :3].astype(np.float32))

        vuv = _sample_virtual_pixels(inst, num_virtual, rng)
        if len(vuv) == 0:
            continue
        # 6NN inverse-distance-weighted depth from the instance's real
        # projected pixels
        d2 = ((vuv[:, None, :] - real_uvd[None, :, :2]) ** 2).sum(-1)
        kk = min(k, d2.shape[1])
        nn = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        nd = np.take_along_axis(d2, nn, axis=1)
        wgt = 1.0 / np.sqrt(nd + 1e-6)
        wgt /= wgt.sum(1, keepdims=True)
        depth = (np.take_along_axis(
            np.broadcast_to(real_uvd[None, :, 2], d2.shape), nn, axis=1)
            * wgt).sum(1)
        vpx.append(np.concatenate(
            [vuv.astype(np.float32), depth[:, None].astype(np.float32),
             np.tile(onehot, (len(vuv), 1))], 1))
        vpt.append(unproject(vuv, depth, lidar2img).astype(np.float32))

    def cat(chunks, width):
        if chunks:
            return np.concatenate(chunks, 0).astype(np.float32)
        return np.zeros((0, width), np.float32)

    return (cat(vpx, 3 + NUM_LABEL_SLOTS), cat(rpx, 3 + NUM_LABEL_SLOTS),
            cat(vpt, 3), cat(rpt, 3))


def generate_sample_artifact(points: np.ndarray, cams: Sequence[Dict],
                             num_virtual: int = 50, k: int = 6,
                             seed: int = 0) -> Dict[str, List[np.ndarray]]:
    """Full per-keyframe artifact dict (one list entry per camera).

    cams: list of dicts with 'lidar2img' [4, 4], 'img_hw' (h, w),
    'instances' (see generate_camera_foreground).
    """
    info = dict(virtual_pixel_indices=[], real_pixel_indices=[],
                virtual_points=[], real_points=[])
    for ci, cam in enumerate(cams):
        vpx, rpx, vpt, rpt = generate_camera_foreground(
            points, np.asarray(cam['lidar2img'], np.float64),
            cam['img_hw'], cam['instances'], num_virtual=num_virtual,
            k=k, seed=seed + ci)
        info['virtual_pixel_indices'].append(vpx)
        info['real_pixel_indices'].append(rpx)
        info['virtual_points'].append(vpt)
        info['real_points'].append(rpt)
    return info


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('root_path', help='dataset root with samples/LIDAR_TOP')
    p.add_argument('--detections', required=True,
                   help='pkl of per-sample, per-camera 2D instances '
                        '(lidar filename -> list of camera dicts)')
    p.add_argument('--out-subdir', default='FOREGROUND_MIXED_6NN_WITH_DEPTH')
    p.add_argument('--num-virtual', type=int, default=50)
    p.add_argument('--load-dim', type=int, default=5)
    args = p.parse_args()
    import pickle
    with open(args.detections, 'rb') as f:
        det = pickle.load(f)
    lidar_dir = os.path.join(args.root_path, 'samples', 'LIDAR_TOP')
    out_dir = os.path.join(args.root_path, 'samples', args.out_subdir)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fname, cams in det.items():
        pts_path = os.path.join(lidar_dir, fname)
        if not os.path.exists(pts_path):
            continue
        pts = np.fromfile(pts_path, np.float32).reshape(-1, args.load_dim)
        info = generate_sample_artifact(pts, cams,
                                        num_virtual=args.num_virtual)
        np.save(os.path.join(out_dir, fname + '.pkl'),
                np.asarray(info, dtype=object), allow_pickle=True)
        n += 1
    print(f'wrote {n} foreground artifacts to {out_dir}')


if __name__ == '__main__':
    main()
