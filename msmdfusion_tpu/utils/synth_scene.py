"""Realistic synthetic nuScenes-like scenes for benchmarks and tests.

The round-3 bench drew LiDAR points AND foreground virtual points
i.i.d.-uniform over the point-cloud range, so 2D (virtual-point) voxels
almost never landed on occupied 3D voxels — the GMA mixed path ran on
empty intersections (unrealistic: on real nuScenes most virtual points
sit ON lidar surfaces, reference detectors/MSMDFusion.py:251-325), and
per-view foreground was padded to full capacity with random points.

This module builds a physically-plausible scene instead:

- **LiDAR** points from a spinning 32-beam model: ground-ring returns
  (range set by beam elevation), wall returns with 1/r^2 density, and
  car-sized object clusters whose return count scales as 1/r^2 —
  matching the radial density profile (and 10-sweep accumulation) of a
  real nuScenes sample.
- **Camera rig**: 6 pinhole cameras in a 60-degree ring with
  nuScenes-like intrinsics; ``lidar2img`` matrices are real projective
  transforms (the round-3 bench used N(0,1) noise matrices).
- **Foreground artifacts** produced by THE SAME generator users run on
  real data (tools/generate_virtual_points.py: per-instance 2D boxes ->
  virtual pixels -> 6NN depth lifting -> unprojection), then packed
  through the real `LoadForeground2D`/`PadForeground2D` pipeline
  transforms — so virtual points lie on object surfaces and 2D/3D
  voxels collide at realistic rates (measured mixed fraction >30% at
  stage-1 resolution; see tests/test_synth_scene.py).

Everything is plain NumPy (host-side data generation, like the real
data pipeline).
"""
from __future__ import annotations

import importlib.util
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _load_gvp():
    """Import tools/generate_virtual_points.py (the real artifact tool)."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, '..', '..', 'tools',
                        'generate_virtual_points.py')
    spec = importlib.util.spec_from_file_location(
        'msmd_generate_virtual_points', os.path.abspath(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Camera rig
# ---------------------------------------------------------------------------

def camera_rig(img_hw, num_cams: int = 6, seed: int = 0) -> np.ndarray:
    """[V, 4, 4] lidar2img for a nuScenes-like 6-camera ring.

    Cameras face outward at 60-degree yaw steps (nuScenes: CAM_FRONT,
    FRONT_RIGHT, FRONT_LEFT, BACK, BACK_LEFT, BACK_RIGHT), ~70-degree
    horizontal FOV, mounted slightly below the roof lidar.
    """
    h, w = img_hw
    rng = np.random.RandomState(seed)
    fx = w / (2.0 * np.tan(np.deg2rad(35.0)))        # 70 deg hFOV
    fy = fx
    cx, cy = w / 2.0, h / 2.0
    intr = np.array([[fx, 0, cx, 0], [0, fy, cy, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    yaws = np.deg2rad([0.0, -60.0, 60.0, 180.0, 120.0, -120.0])
    mats = []
    for i in range(num_cams):
        psi = yaws[i % 6] + rng.uniform(-0.02, 0.02)
        c, s = np.cos(psi), np.sin(psi)
        fwd = np.array([c, s, 0.0])                  # camera z (lidar frame)
        right = np.array([s, -c, 0.0])               # camera x
        down = np.array([0.0, 0.0, -1.0])            # camera y
        rot = np.stack([right, down, fwd])           # R: lidar -> cam
        t = fwd * 0.7 + np.array([0, 0, -0.3])       # mount offset
        ext = np.eye(4)
        ext[:3, :3] = rot
        ext[:3, 3] = -rot @ t
        mats.append(intr @ ext)
    return np.stack(mats).astype(np.float32)


# ---------------------------------------------------------------------------
# LiDAR scene
# ---------------------------------------------------------------------------

def _box_surface_points(rng, center, dims, yaw, count):
    """Sample `count` points on the surface of an upright box."""
    l, w, h = dims
    areas = np.array([l * h, l * h, w * h, w * h, l * w])  # 4 sides + top
    face = rng.choice(5, size=count, p=areas / areas.sum())
    u = rng.uniform(-0.5, 0.5, count)
    v = rng.uniform(-0.5, 0.5, count)
    x = np.where(face < 2, u * l, np.where(face < 4,
                 np.where(face == 2, 0.5, -0.5) * w, u * l))
    y = np.where(face < 2, np.where(face == 0, 0.5, -0.5) * w,
                 np.where(face < 4, u * w, v * w))
    z = np.where(face < 4, v * h, 0.5 * h)
    c, s = np.cos(yaw), np.sin(yaw)
    px = center[0] + c * x - s * y
    py = center[1] + s * x + c * y
    pz = center[2] + z
    return np.stack([px, py, pz], 1) + rng.normal(0, 0.02, (count, 3))


def lidar_scene(rng: np.random.RandomState, n_points: int,
                pcr: Sequence[float], num_objects: int = 32,
                sweeps: int = 10):
    """(points [n_points, 5], objects) — a plausible 10-sweep lidar frame.

    objects: list of dicts(center [3], dims [3], yaw) for the car-sized
    clusters (the 2D-instance sources for the foreground generator).
    """
    max_r = float(min(pcr[3], pcr[4]))
    lidar_z = 1.8
    chunks = []

    # ground rings: 20 downward beams x ~1000 azimuths x `sweeps` sweeps.
    # Physical range noise is ~2 cm (NOT proportional to range: the
    # round-3 3%-of-r scatter smeared far rings over +-1 m of isolated
    # voxels). Sweep accumulation follows real nuScenes: the ego moves
    # between 20 Hz sweeps, so older rings land shifted by v*dt in the
    # current frame — thin, surface-coherent annuli, like real data.
    elevs = np.deg2rad(np.linspace(-29.0, -2.0, 20))
    n_az = max(int(n_points * 0.55 / (len(elevs) * sweeps)), 8)
    ego_v = rng.uniform(0.0, 9.0)                    # m/s
    ego_dir = rng.uniform(0, 2 * np.pi)
    ego_step = ego_v * 0.05 * np.array([np.cos(ego_dir), np.sin(ego_dir)])
    # smooth low-order terrain: radius and height modulation per azimuth
    t_amp = rng.uniform(0.0, 0.04)
    t_ph = rng.uniform(0, 2 * np.pi, 3)
    for phi in elevs:
        r = min(lidar_z / np.tan(-phi), max_r * 1.2)
        for s in range(sweeps):
            theta = (np.arange(n_az) / n_az) * 2 * np.pi \
                + rng.uniform(0, 2 * np.pi / n_az)
            terrain = (1.0 + t_amp * np.sin(3 * theta + t_ph[0])
                       + 0.5 * t_amp * np.sin(7 * theta + t_ph[1]))
            rr = r * terrain + rng.normal(0, 0.02, n_az)
            org = -s * ego_step                      # sweep-s ego position
            chunks.append(np.stack([
                org[0] + rr * np.cos(theta), org[1] + rr * np.sin(theta),
                np.full(n_az, -lidar_z) + rng.normal(0, 0.02, n_az)], 1))

    # walls: vertical planes, return count ~ area / d^2
    n_wall_budget = int(n_points * 0.25)
    wall_counts = []
    walls = []
    for _ in range(14):
        d = rng.uniform(12.0, max_r)
        theta = rng.uniform(0, 2 * np.pi)
        width = rng.uniform(8.0, 30.0)
        height = rng.uniform(3.0, 8.0)
        walls.append((d, theta, width, height))
        wall_counts.append(width * height / d ** 2)
    wall_counts = np.asarray(wall_counts)
    wall_counts = (wall_counts / wall_counts.sum() * n_wall_budget).astype(int)
    for (d, theta, width, height), cnt in zip(walls, wall_counts):
        if cnt <= 0:
            continue
        ctr = np.array([d * np.cos(theta), d * np.sin(theta)])
        tang = np.array([-np.sin(theta), np.cos(theta)])
        u = rng.uniform(-0.5, 0.5, cnt) * width
        z = rng.uniform(0, height, cnt) - lidar_z
        xy = ctr[None, :] + u[:, None] * tang[None, :]
        chunks.append(np.concatenate(
            [xy + rng.normal(0, 0.03, (cnt, 2)), z[:, None]], 1))

    # objects: car-sized boxes, closer-weighted, 1/d^2 returns x sweeps
    objects = []
    for _ in range(num_objects):
        d = 5.0 + (max_r - 8.0) * rng.power(1.6)
        theta = rng.uniform(0, 2 * np.pi)
        dims = np.array([rng.uniform(3.8, 5.2), rng.uniform(1.7, 2.1),
                         rng.uniform(1.4, 1.9)])
        center = np.array([d * np.cos(theta), d * np.sin(theta),
                           -lidar_z + dims[2] / 2])
        yaw = rng.uniform(0, 2 * np.pi)
        cnt = int(np.clip(sweeps * 1500.0 / d ** 2, 20, 2500))
        chunks.append(_box_surface_points(rng, center, dims, yaw, cnt))
        objects.append(dict(center=center, dims=dims, yaw=yaw,
                            label=int(rng.randint(0, 10))))

    pts = np.concatenate(chunks, 0)
    # clip to range with margin, then sample/pad to the exact target count
    in_r = np.all(np.abs(pts[:, :2]) < max_r * 1.05, axis=1)
    pts = pts[in_r]
    if len(pts) >= n_points:
        sel = rng.choice(len(pts), n_points, replace=False)
        pts = pts[sel]
    else:
        extra = rng.choice(len(pts), n_points - len(pts), replace=True)
        pts = np.concatenate([pts, pts[extra] + rng.normal(
            0, 0.01, (n_points - len(pts), 3))], 0)
    feats = np.concatenate(
        [pts, rng.uniform(0, 1, (n_points, 1)),
         np.zeros((n_points, 1))], 1).astype(np.float32)
    return feats, objects


# ---------------------------------------------------------------------------
# Foreground artifact + batch assembly
# ---------------------------------------------------------------------------

def _instances_for_camera(points, objects, lidar2img, img_hw, gvp):
    """2D bbox instances: each visible object's projected extent."""
    instances = []
    for obj in objects:
        corners = _box_surface_points(
            np.random.RandomState(0), obj['center'], obj['dims'],
            obj['yaw'], 64)
        proj = gvp.project_points(corners, lidar2img.astype(np.float64),
                                  img_hw)
        vis = proj['in_img']
        if vis.sum() < 8:
            continue
        uv = proj['uvd'][vis, :2]
        x1, y1 = uv.min(0)
        x2, y2 = uv.max(0)
        instances.append(dict(bbox=[x1, y1, x2, y2], label=obj['label']))
    return instances


def realistic_batch(shape: Dict, b: int, seed: int = 0,
                    num_virtual: int = 200,
                    return_artifacts: bool = False,
                    return_gt: bool = False, max_gt: int = 32) -> Dict:
    """Drop-in replacement for the uniform `_synth_batch` (same keys/shapes).

    shape: dict(n, v, m, mr, img_hw, pcr) — the `_flagship_model` shape
    contract. Foreground content is generated by
    tools/generate_virtual_points.py on the synthetic lidar + camera rig
    and packed via the real LoadForeground2D/PadForeground2D transforms.
    """
    from ..datasets.pipelines.foreground import (LoadForeground2D,
                                                 PadForeground2D)
    gvp = _load_gvp()
    n, v, m, mr = shape['n'], shape['v'], shape['m'], shape['mr']
    img_hw = shape['img_hw']
    pcr = shape['pcr']
    rng = np.random.RandomState(seed)

    points = np.zeros((b, n, 5), np.float32)
    imgs = rng.randn(b, v, img_hw[0], img_hw[1], 3).astype(np.float32)
    fg_batches = []
    l2i_batches = []
    artifacts = []
    gt_bboxes = np.zeros((b, max_gt, 9), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    for bi in range(b):
        pts, objects = lidar_scene(rng, n, pcr)
        points[bi] = pts
        for gi, obj in enumerate(objects[:max_gt]):
            c, d = obj['center'], obj['dims']
            # bottom-center convention (what the head's loss consumes):
            # (x, y, z_bottom, dx, dy, dz, yaw, vx, vy), static objects
            gt_bboxes[bi, gi] = [c[0], c[1], c[2] - d[2] / 2,
                                 d[0], d[1], d[2], obj['yaw'], 0.0, 0.0]
            gt_labels[bi, gi] = obj['label']
            gt_valid[bi, gi] = True
        l2i = camera_rig(img_hw, num_cams=v, seed=seed + 17 * bi)
        cams = [dict(lidar2img=l2i[ci], img_hw=img_hw,
                     instances=_instances_for_camera(
                         pts, objects, l2i[ci], img_hw, gvp))
                for ci in range(v)]
        info = gvp.generate_sample_artifact(
            pts, cams, num_virtual=num_virtual, seed=seed + 31 * bi)
        artifacts.append(info)
        organized = LoadForeground2D()._organize(info)
        padder = PadForeground2D(max_points=m, max_real_points=mr,
                                 num_cams=v)
        res = padder({'foreground2D_info': organized, 'lidar2img': l2i})
        fg_batches.append(res['foreground'])
        l2i_batches.append(l2i)

    fg = {k: np.stack([fb[k] for fb in fg_batches])
          for k in ('fg_pixels', 'fg_points', 'fg_mask',
                    'fg_real_pixels', 'fg_real_mask')}
    fg['lidar2img'] = np.stack(l2i_batches)
    batch = dict(points=points, points_mask=np.ones((b, n), bool),
                 img=imgs, fg=fg)
    if return_gt:
        batch['gt'] = dict(gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                           gt_valid=gt_valid)
    if return_artifacts:
        return batch, artifacts
    return batch
