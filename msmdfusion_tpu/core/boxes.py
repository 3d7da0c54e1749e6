"""Functional 3D box geometry in JAX (LiDAR coordinate convention).

TPU-native re-design of the reference box structures
(mmdet3d/core/bbox/structures/lidar_box3d.py:10-257, base_box3d.py:9-457).
Boxes are plain ``[N, 7+]`` arrays ``(x, y, z, w, l, h, yaw[, vx, vy])`` with
bottom-center origin ``(0.5, 0.5, 0)`` in the LiDAR frame, and every op is a
pure jittable function instead of a tensor-wrapper class. Dynamic-size
filtering is replaced by boolean masks so everything stays static-shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Limit value into a period range ``[-offset*period, (1-offset)*period)``.

    Reference: mmdet3d/core/bbox/structures/utils.py (limit_period).
    """
    return val - jnp.floor(val / period + offset) * period


def gravity_center(boxes):
    """Bottom-center boxes -> gravity (geometric) centers [N, 3].

    Reference: lidar_box3d.py gravity_center property.
    """
    bottom = boxes[..., :3]
    return bottom.at[..., 2].add(boxes[..., 5] * 0.5) if hasattr(bottom, 'at') else bottom


def to_gravity_center(boxes):
    """Return [N, 3] gravity centers from bottom-center box tensors."""
    return jnp.concatenate(
        [boxes[..., 0:2], (boxes[..., 2:3] + boxes[..., 5:6] * 0.5)], axis=-1)


def bev(boxes):
    """BEV boxes [N, 5]: (x, y, w, l, yaw)."""
    return jnp.concatenate([boxes[..., 0:2], boxes[..., 3:5], boxes[..., 6:7]],
                           axis=-1)


def corners_bev(boxes_bev):
    """Rotated BEV rectangle corners.

    Args:
        boxes_bev: [N, 5] (cx, cy, w, l, yaw).
    Returns:
        [N, 4, 2] corners in counter-clockwise order.
    """
    cx, cy, w, l, yaw = jnp.split(boxes_bev, 5, axis=-1)
    # local corner offsets (counter-clockwise)
    dx = jnp.concatenate([w, w, -w, -w], axis=-1) * 0.5  # [N, 4]
    dy = jnp.concatenate([-l, l, l, -l], axis=-1) * 0.5
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    rx = dx * cos - dy * sin + cx
    ry = dx * sin + dy * cos + cy
    return jnp.stack([rx, ry], axis=-1)


def corners_3d(boxes):
    """8 corners of 3D boxes, [N, 8, 3].

    Corner ordering matches the reference ``LiDARInstance3DBoxes.corners``
    (lidar_box3d.py:46-86): unit-cube corners at relative origin (0.5, 0.5, 0),
    i.e. z in {0, h}, x/y in {-d/2, d/2}, rotated by yaw then translated.
    """
    dims = boxes[..., 3:6]
    # unit cube corners in (x, y, z): order (000,001,011,010,110,111,101,100)
    unit = jnp.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
         [1, 1, 0], [1, 1, 1], [1, 0, 1], [1, 0, 0]], dtype=boxes.dtype)
    unit = unit - jnp.array([0.5, 0.5, 0.0], dtype=boxes.dtype)
    corners = unit[None, :, :] * dims[..., None, :]  # [N, 8, 3]
    yaw = boxes[..., 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # rotation around z axis
    x = corners[..., 0] * cos[..., None] - corners[..., 1] * sin[..., None]
    y = corners[..., 0] * sin[..., None] + corners[..., 1] * cos[..., None]
    z = corners[..., 2]
    corners = jnp.stack([x, y, z], axis=-1)
    return corners + boxes[..., None, :3]


def rotate(boxes, angle, points=None):
    """Rotate boxes (and optionally points) around the z axis by `angle` (rad).

    Uses the same active-rotation convention as the reference
    (``LiDARInstance3DBoxes.rotate``, lidar_box3d.py:112-152).
    """
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]],
                    dtype=boxes.dtype)
    center = boxes[..., :3] @ rot
    yaw = boxes[..., 6:7] + angle
    out = jnp.concatenate([center, boxes[..., 3:6], yaw, boxes[..., 7:]], axis=-1)
    if boxes.shape[-1] > 7:  # rotate velocity (vx, vy)
        vel = boxes[..., 7:9] @ rot[:2, :2]
        out = jnp.concatenate([out[..., :7], vel, out[..., 9:]], axis=-1)
    if points is not None:
        pts_xyz = points[..., :3] @ rot
        points = jnp.concatenate([pts_xyz, points[..., 3:]], axis=-1)
        return out, points
    return out


def flip(boxes, direction: str = 'horizontal'):
    """Flip boxes in BEV.

    horizontal: flip y (yaw -> -yaw); vertical: flip x (yaw -> -yaw + pi).
    Reference: lidar_box3d.py flip.
    """
    if direction == 'horizontal':
        boxes = boxes.at[..., 1].multiply(-1)
        boxes = boxes.at[..., 6].multiply(-1)
        if boxes.shape[-1] > 7:
            boxes = boxes.at[..., 8].multiply(-1)
    elif direction == 'vertical':
        boxes = boxes.at[..., 0].multiply(-1)
        boxes = boxes.at[..., 6].set(-boxes[..., 6] + np.pi)
        if boxes.shape[-1] > 7:
            boxes = boxes.at[..., 7].multiply(-1)
    else:
        raise ValueError(direction)
    return boxes


def in_range_bev(boxes, box_range):
    """Mask of boxes whose BEV center lies in [x0, y0, x1, y1]."""
    return ((boxes[..., 0] > box_range[0]) & (boxes[..., 1] > box_range[1]) &
            (boxes[..., 0] < box_range[2]) & (boxes[..., 1] < box_range[3]))


def points_in_rbbox(points, boxes):
    """Test which points fall inside rotated 3D boxes.

    Args:
        points: [P, 3+].
        boxes: [N, 7] bottom-center boxes.
    Returns:
        [P, N] bool mask.

    TPU-native equivalent of ``points_in_boxes_gpu``
    (reference: mmdet3d/ops/roiaware_pool3d/src/points_in_boxes_cuda.cu:51):
    translate+rotate each point into each box frame, compare to half-dims.
    """
    xyz = points[..., :3]
    centers = boxes[:, :3]
    local = xyz[:, None, :] - centers[None, :, :]  # [P, N, 3]
    yaw = boxes[:, 6]
    cos, sin = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = local[..., 0] * cos[None, :] - local[..., 1] * sin[None, :]
    ly = local[..., 0] * sin[None, :] + local[..., 1] * cos[None, :]
    lz = local[..., 2]
    w, l, h = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    return ((jnp.abs(lx) <= w[None, :] * 0.5) &
            (jnp.abs(ly) <= l[None, :] * 0.5) &
            (lz >= 0) & (lz <= h[None, :]))


def xywhr2xyxyr(boxes_xywhr):
    """Convert (cx, cy, w, l, yaw) to (x1, y1, x2, y2, yaw).

    Reference: mmdet3d/core/bbox/structures/utils.py (xywhr2xyxyr).
    """
    half_w = boxes_xywhr[..., 2:3] / 2
    half_l = boxes_xywhr[..., 3:4] / 2
    return jnp.concatenate([
        boxes_xywhr[..., 0:1] - half_w, boxes_xywhr[..., 1:2] - half_l,
        boxes_xywhr[..., 0:1] + half_w, boxes_xywhr[..., 1:2] + half_l,
        boxes_xywhr[..., 4:5]
    ], axis=-1)
