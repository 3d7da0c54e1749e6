"""Camera/Depth box frames and Box3DMode / Coord3DMode conversions.

TPU-native re-design of the reference box-structure zoo
(mmdet3d/core/bbox/structures/{box_3d_mode.py:12-165, cam_box3d.py:9-308,
depth_box3d.py:11-325, coord_3d_mode.py:12-281}). Instead of per-frame
tensor-wrapper classes, boxes stay plain ``[N, 7+]`` arrays
``(x, y, z, dx, dy, dz, yaw[, ...])`` and the frame is an explicit mode
argument; every op is a pure jittable function on static shapes.

Frame conventions (identical to the reference):

- LIDAR: x front, y left, z up; yaw about z; bottom-center origin
  ``(0.5, 0.5, 0)``; box dims ``(w=x_size, l=y_size, h=z_size)``.
- CAM: x right, y down, z front; yaw about y; origin ``(0.5, 1.0, 0.5)``;
  dims ``(x_size, y_size=height, z_size)``.
- DEPTH: x right, y front, z up; yaw about z (NEGATIVE on rotate, see
  depth_box3d.py:113-140); origin ``(0.5, 0.5, 0)``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .boxes import limit_period

LIDAR = 0
CAM = 1
DEPTH = 2

# default sensor-frame change-of-basis (reference box_3d_mode.py:100-130)
_DEFAULT_RT = {
    (LIDAR, CAM): np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32),
    (CAM, LIDAR): np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32),
    (DEPTH, CAM): np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
    (CAM, DEPTH): np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32),
    (LIDAR, DEPTH): np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32),
    (DEPTH, LIDAR): np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32),
}

# how (x_size, y_size, z_size) columns permute under each conversion
# (reference box_3d_mode.py:102-128: e.g. LIDAR->CAM keeps [y, z, x])
_SIZE_PERM = {
    (LIDAR, CAM): (1, 2, 0),
    (CAM, LIDAR): (2, 0, 1),
    (DEPTH, CAM): (0, 2, 1),
    (CAM, DEPTH): (0, 2, 1),
    (LIDAR, DEPTH): (1, 0, 2),
    (DEPTH, LIDAR): (1, 0, 2),
}


def _apply_rt(xyz, rt_mat):
    rt_mat = jnp.asarray(rt_mat, xyz.dtype)
    if rt_mat.shape[-1] == 4:
        ones = jnp.ones(xyz.shape[:-1] + (1,), xyz.dtype)
        return (jnp.concatenate([xyz, ones], -1) @ rt_mat.T)[..., :3]
    return xyz @ rt_mat.T


def convert_boxes(boxes, src: int, dst: int, rt_mat=None):
    """Box3DMode.convert for plain arrays (box_3d_mode.py:60-165).

    Args:
        boxes: [N, 7+] array in ``src`` frame.
        rt_mat: optional [3, 3] or [3/4, 4] change-of-basis overriding the
            canonical axis permutation (e.g. a real cam2lidar extrinsic).
    Returns:
        [N, 7+] array in ``dst`` frame (same trailing dims preserved).
    """
    if src == dst:
        return boxes
    if (src, dst) not in _SIZE_PERM:
        raise NotImplementedError(f'Box3DMode {src} -> {dst}')
    boxes = jnp.asarray(boxes)
    if rt_mat is None:
        rt_mat = _DEFAULT_RT[(src, dst)]
    xyz = _apply_rt(boxes[..., :3], rt_mat)
    perm = _SIZE_PERM[(src, dst)]
    size = boxes[..., 3:6][..., list(perm)]
    yaw = boxes[..., 6:7]
    # The reference passes yaw through numerically, which is geometric only
    # because its LiDAR corners rotate clockwise (legacy). This framework's
    # LiDAR yaw is counter-clockwise (core/boxes.py), so LiDAR<->CAM/DEPTH
    # conversions negate yaw to keep corner geometry covariant
    # (tested: test_box_modes.test_corner_covariance_*).
    if (src == LIDAR) != (dst == LIDAR):
        yaw = -yaw
    return jnp.concatenate([xyz, size, yaw, boxes[..., 7:]], axis=-1)


def convert_points(points, src: int, dst: int, rt_mat=None):
    """Coord3DMode.convert_point for plain arrays (coord_3d_mode.py:180-281).

    Extra feature columns (intensity, ring, ...) pass through unchanged.
    """
    if src == dst:
        return points
    if (src, dst) not in _DEFAULT_RT:
        raise NotImplementedError(f'Coord3DMode {src} -> {dst}')
    points = jnp.asarray(points)
    if rt_mat is None:
        rt_mat = _DEFAULT_RT[(src, dst)]
    elif (src, dst) == (DEPTH, CAM):
        # reference composes the canonical flip with the provided Rt
        rt_mat = jnp.asarray(_DEFAULT_RT[(DEPTH, CAM)],
                             points.dtype) @ jnp.asarray(rt_mat).T
    elif (src, dst) == (CAM, DEPTH):
        rt_mat = jnp.asarray(rt_mat) @ jnp.asarray(
            _DEFAULT_RT[(CAM, DEPTH)], points.dtype)
    xyz = _apply_rt(points[..., :3], rt_mat)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def shift_origin(boxes, src_origin, dst_origin):
    """Re-anchor the box center between relative origins.

    Reference base_box3d.py:36-66 (``origin`` ctor arg): e.g. gravity-center
    nuScenes boxes -> bottom-center with
    ``shift_origin(b, (0.5, 0.5, 0.5), (0.5, 0.5, 0))``.
    """
    boxes = jnp.asarray(boxes)
    delta = (jnp.asarray(dst_origin, boxes.dtype)
             - jnp.asarray(src_origin, boxes.dtype))
    center = boxes[..., :3] + boxes[..., 3:6] * delta
    return jnp.concatenate([center, boxes[..., 3:]], axis=-1)


def rotation_3d_in_axis(points, angles, axis: int = 0):
    """Rotate [N, M, 3] points by per-box angles about a coordinate axis.

    Reference: mmdet3d/core/bbox/structures/utils.py:40-76. Axis semantics
    match torch (axis=1 is the CAM yaw axis, axis=2 the LiDAR/DEPTH one).
    """
    sin, cos = jnp.sin(angles), jnp.cos(angles)
    one = jnp.ones_like(sin)
    zero = jnp.zeros_like(sin)
    if axis == 1:
        rot = jnp.stack([
            jnp.stack([cos, zero, -sin], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([sin, zero, cos], -1)], -2)
    elif axis in (2, -1):
        rot = jnp.stack([
            jnp.stack([cos, -sin, zero], -1),
            jnp.stack([sin, cos, zero], -1),
            jnp.stack([zero, zero, one], -1)], -2)
    elif axis == 0:
        rot = jnp.stack([
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cos, -sin], -1),
            jnp.stack([zero, sin, cos], -1)], -2)
    else:
        raise ValueError(f'axis should be in range [0, 2], got {axis}')
    # points @ rot_mat_T, matching the reference exactly (utils.py:40-76 and
    # the cam_box3d.rotate method use the same right-multiplication, which
    # keeps corners() consistent with rotate())
    return jnp.einsum('nmj,njk->nmk', points, rot)


_CORNER_ORDER = np.stack(np.unravel_index(np.arange(8), [2] * 3),
                         axis=1)[[0, 1, 3, 2, 4, 5, 7, 6]].astype(np.float32)


def cam_corners_3d(boxes):
    """[N, 8, 3] corners of CAM-frame boxes (cam_box3d.py:101-140)."""
    boxes = jnp.asarray(boxes)
    dims = boxes[..., 3:6]
    corners_norm = jnp.asarray(_CORNER_ORDER, boxes.dtype) - jnp.asarray(
        [0.5, 1.0, 0.5], boxes.dtype)
    corners = dims[:, None, :] * corners_norm[None]
    corners = rotation_3d_in_axis(corners, boxes[..., 6], axis=1)
    return corners + boxes[:, None, :3]


def depth_corners_3d(boxes):
    """[N, 8, 3] corners of DEPTH-frame boxes (depth_box3d.py:46-86)."""
    boxes = jnp.asarray(boxes)
    dims = boxes[..., 3:6]
    corners_norm = jnp.asarray(_CORNER_ORDER, boxes.dtype) - jnp.asarray(
        [0.5, 0.5, 0.0], boxes.dtype)
    corners = dims[:, None, :] * corners_norm[None]
    corners = rotation_3d_in_axis(corners, boxes[..., 6], axis=2)
    return corners + boxes[:, None, :3]


def cam_gravity_center(boxes):
    """[N, 3] gravity centers of CAM boxes: y is DOWN (cam_box3d.py:90-97)."""
    boxes = jnp.asarray(boxes)
    return jnp.stack([boxes[..., 0],
                      boxes[..., 1] - boxes[..., 4] * 0.5,
                      boxes[..., 2]], axis=-1)


def depth_gravity_center(boxes):
    boxes = jnp.asarray(boxes)
    return jnp.concatenate(
        [boxes[..., :2], boxes[..., 2:3] + boxes[..., 5:6] * 0.5], axis=-1)


def cam_bev(boxes):
    """[N, 5] XZWHR BEV of CAM boxes (cam_box3d.py:142-146)."""
    boxes = jnp.asarray(boxes)
    return boxes[..., [0, 2, 3, 5, 6]]


def nearest_bev(bev_rotated):
    """Axis-aligned [N, 4] BEV boxes from rotated [N, 5] XYWHR.

    Reference base logic shared by all frames (cam_box3d.py:148-168).
    """
    rot = limit_period(bev_rotated[..., -1], 0.5, np.pi)
    cond = (jnp.abs(rot) > np.pi / 4)[..., None]
    xywh = jnp.where(cond, bev_rotated[..., [0, 1, 3, 2]],
                     bev_rotated[..., :4])
    centers, dims = xywh[..., :2], xywh[..., 2:]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def cam_rotate(boxes, angle, points: Optional[jnp.ndarray] = None):
    """Rotate CAM boxes about y (cam_box3d.py:170-209)."""
    boxes = jnp.asarray(boxes)
    sin, cos = jnp.sin(angle), jnp.cos(angle)
    rot_t = jnp.asarray([[cos, 0, -sin], [0, 1, 0], [sin, 0, cos]],
                        boxes.dtype)
    xyz = boxes[..., :3] @ rot_t
    out = jnp.concatenate(
        [xyz, boxes[..., 3:6], boxes[..., 6:7] + angle, boxes[..., 7:]], -1)
    if points is not None:
        points = jnp.concatenate(
            [points[..., :3] @ rot_t, points[..., 3:]], -1)
        return out, points
    return out


def depth_rotate(boxes, angle, points: Optional[jnp.ndarray] = None):
    """Rotate DEPTH boxes about z; yaw DECREASES (depth_box3d.py:113-157)."""
    boxes = jnp.asarray(boxes)
    sin, cos = jnp.sin(angle), jnp.cos(angle)
    rot_t = jnp.asarray([[cos, -sin, 0], [sin, cos, 0], [0, 0, 1]],
                        boxes.dtype).T
    xyz = boxes[..., :3] @ rot_t
    out = jnp.concatenate(
        [xyz, boxes[..., 3:6], boxes[..., 6:7] - angle, boxes[..., 7:]], -1)
    if points is not None:
        points = jnp.concatenate(
            [points[..., :3] @ rot_t, points[..., 3:]], -1)
        return out, points
    return out


def cam_flip(boxes, bev_direction: str = 'horizontal'):
    """Flip CAM boxes: horizontal = x, vertical = z (cam_box3d.py:211-247)."""
    boxes = jnp.asarray(boxes)
    if bev_direction == 'horizontal':
        boxes = boxes.at[..., 0].multiply(-1)
        boxes = boxes.at[..., 6].set(-boxes[..., 6] + np.pi)
    elif bev_direction == 'vertical':
        boxes = boxes.at[..., 2].multiply(-1)
        boxes = boxes.at[..., 6].multiply(-1)
    else:
        raise ValueError(bev_direction)
    return boxes


def depth_flip(boxes, bev_direction: str = 'horizontal'):
    """Flip DEPTH boxes: horizontal = x, vertical = y (depth_box3d.py:159)."""
    boxes = jnp.asarray(boxes)
    if bev_direction == 'horizontal':
        boxes = boxes.at[..., 0].multiply(-1)
        boxes = boxes.at[..., 6].set(-boxes[..., 6] + np.pi)
    elif bev_direction == 'vertical':
        boxes = boxes.at[..., 1].multiply(-1)
        boxes = boxes.at[..., 6].multiply(-1)
    else:
        raise ValueError(bev_direction)
    return boxes


def cam_in_range_bev(boxes, box_range):
    """CAM BEV range check on (x, z) (cam_box3d.py:249-270)."""
    boxes = jnp.asarray(boxes)
    return ((boxes[..., 0] > box_range[0]) & (boxes[..., 2] > box_range[1]) &
            (boxes[..., 0] < box_range[2]) & (boxes[..., 2] < box_range[3]))


def cam_height_overlaps(boxes1, boxes2):
    """[N, M] height overlaps of CAM boxes; +y is down (cam_box3d.py:272)."""
    boxes1, boxes2 = jnp.asarray(boxes1), jnp.asarray(boxes2)
    b1_bot = boxes1[:, 1:2]                      # bottom = y
    b1_top = b1_bot - boxes1[:, 4:5]
    b2_bot = boxes2[None, :, 1]
    b2_top = b2_bot - boxes2[None, :, 4]
    highest_bottom = jnp.minimum(b1_bot, b2_bot)
    lowest_top = jnp.maximum(b1_top, b2_top)
    return jnp.clip(highest_bottom - lowest_top, 0)


def enlarged_box(boxes, extra_width: float):
    """Grow dims by 2*extra_width, drop bottom z (depth_box3d.py:262-275)."""
    boxes = jnp.asarray(boxes)
    return jnp.concatenate([
        boxes[..., 0:2], boxes[..., 2:3] - extra_width,
        boxes[..., 3:6] + 2 * extra_width, boxes[..., 6:]], axis=-1)


_SURFACE_OFFSETS = np.array(
    [[0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0]],
    np.float32) / 2
_LINE_OFFSETS = np.array(
    [[1, 0, 1], [-1, 0, 1], [0, 1, 1], [0, -1, 1], [1, 0, -1], [-1, 0, -1],
     [0, 1, -1], [0, -1, -1], [1, 1, 0], [1, -1, 0], [-1, 1, 0], [-1, -1, 0]],
    np.float32) / 2


def get_surface_line_center(boxes):
    """Surface (6/box) and line (12/box) centers of DEPTH boxes.

    Consumed by the H3DNet primitive matching (depth_box3d.py:277-325).
    Returns ([N*6, 3], [N*12, 3]) in the reference's box-major flattening.
    """
    boxes = jnp.asarray(boxes)
    dims = boxes[..., 3:6]
    center = depth_gravity_center(boxes)
    yaw = boxes[..., 6]
    sin, cos = jnp.sin(-yaw), jnp.cos(-yaw)
    # rot_mat_T of depth_box3d.py:287-295 (rotation by -yaw, transposed)
    rot_t = jnp.stack([
        jnp.stack([cos, -sin, jnp.zeros_like(cos)], -1),
        jnp.stack([sin, cos, jnp.zeros_like(cos)], -1),
        jnp.stack([jnp.zeros_like(cos), jnp.zeros_like(cos),
                   jnp.ones_like(cos)], -1)], -2)          # [N, 3, 3]
    surf = jnp.asarray(_SURFACE_OFFSETS, boxes.dtype)[None] * dims[:, None]
    line = jnp.asarray(_LINE_OFFSETS, boxes.dtype)[None] * dims[:, None]
    surf = jnp.einsum('nmj,nkj->nmk', surf, rot_t) + center[:, None]
    line = jnp.einsum('nmj,nkj->nmk', line, rot_t) + center[:, None]
    return surf.reshape(-1, 3), line.reshape(-1, 3)
