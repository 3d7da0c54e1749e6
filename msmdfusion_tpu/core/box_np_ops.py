"""Numpy box math for the CPU data pipeline.

TPU-native counterpart of mmdet3d/core/bbox/box_np_ops.py:857 — only the
subset the pipeline/dbsampler/converters need, re-derived from the geometry
(not a port): corners, point-in-rotated-box, range masks.
"""
from __future__ import annotations

import numpy as np


def corners_bev_np(boxes):
    """[N, 5] (cx, cy, w, l, yaw) -> [N, 4, 2] ccw corners."""
    cx, cy, w, l, yaw = [boxes[:, i] for i in range(5)]
    dx = np.stack([w, w, -w, -w], axis=1) * 0.5
    dy = np.stack([-l, l, l, -l], axis=1) * 0.5
    c, s = np.cos(yaw)[:, None], np.sin(yaw)[:, None]
    rx = dx * c - dy * s + cx[:, None]
    ry = dx * s + dy * c + cy[:, None]
    return np.stack([rx, ry], axis=-1)


def corners_3d_np(boxes):
    """[N, 7] bottom-center boxes -> [N, 8, 3] corners."""
    dims = boxes[:, 3:6]
    unit = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                     [1, 1, 0], [1, 1, 1], [1, 0, 1], [1, 0, 0]],
                    boxes.dtype) - [0.5, 0.5, 0.0]
    corners = unit[None] * dims[:, None, :]
    yaw = boxes[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    out = np.stack([x, y, corners[..., 2]], axis=-1)
    return out + boxes[:, None, :3]


def points_in_rbbox_np(points, boxes):
    """points [P, 3], boxes [N, 7+] -> [P, N] bool."""
    if len(boxes) == 0:
        return np.zeros((len(points), 0), bool)
    local = points[:, None, :3] - boxes[None, :, :3]
    yaw = boxes[:, 6]
    c, s = np.cos(-yaw), np.sin(-yaw)
    lx = local[..., 0] * c[None] - local[..., 1] * s[None]
    ly = local[..., 0] * s[None] + local[..., 1] * c[None]
    lz = local[..., 2]
    return ((np.abs(lx) <= boxes[:, 3] * 0.5) &
            (np.abs(ly) <= boxes[:, 4] * 0.5) &
            (lz >= 0) & (lz <= boxes[:, 5]))


def limit_period_np(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# frame transforms (reference box_np_ops.py:8-47)
# ---------------------------------------------------------------------------

def camera_to_lidar(points, r_rect, velo2cam):
    """Camera-frame points -> LiDAR frame via (rect @ velo2cam)^-1."""
    n = points.shape[0]
    hom = np.concatenate([points[:, :3], np.ones((n, 1), points.dtype)], 1)
    lidar = hom @ np.linalg.inv((r_rect @ velo2cam).T)
    return np.concatenate([lidar[:, :3], points[:, 3:]], axis=1)


def lidar_to_camera(points, r_rect, velo2cam):
    n = points.shape[0]
    hom = np.concatenate([points[:, :3], np.ones((n, 1), points.dtype)], 1)
    cam = hom @ (r_rect @ velo2cam).T
    return np.concatenate([cam[:, :3], points[:, 3:]], axis=1)


def box_camera_to_lidar(data, r_rect, velo2cam):
    """[N, 7] camera boxes (x, y, z, l, h, w, ry) -> LiDAR
    (x, y, z, w, l, h, yaw) with yaw = -ry - pi/2 (SECOND convention)."""
    xyz = camera_to_lidar(data[:, :3], r_rect, velo2cam)
    l, h, w = data[:, 3:4], data[:, 4:5], data[:, 5:6]
    r = data[:, 6:7]
    return np.concatenate([xyz, w, l, h, -r - np.pi / 2], axis=1)


def box_lidar_to_camera(data, r_rect, velo2cam):
    xyz = lidar_to_camera(data[:, :3], r_rect, velo2cam)
    w, l, h = data[:, 3:4], data[:, 4:5], data[:, 5:6]
    yaw = data[:, 6:7]
    return np.concatenate([xyz, l, h, w, -yaw - np.pi / 2], axis=1)


# ---------------------------------------------------------------------------
# corners (reference box_np_ops.py:48-305, 793-857)
# ---------------------------------------------------------------------------

def corners_nd(dims, origin=0.5):
    """Relative box corners per dim length + origin ([N, 2^d, d]).

    Corner order matches the reference (2d: clockwise from min point; 3d:
    the standard mmdet3d enumeration), box_np_ops.py:48-79.
    """
    ndim = int(dims.shape[1])
    corners_norm = np.stack(
        np.unravel_index(np.arange(2 ** ndim), [2] * ndim),
        axis=1).astype(dims.dtype)
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array(origin, dtype=dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(1, 2 ** ndim,
                                                            ndim)


def rotation_2d(points, angles):
    """Rotate [N, P, 2] point sets clockwise-positive (reference :81-96)."""
    c, s = np.cos(angles), np.sin(angles)
    rot_t = np.stack([[c, -s], [s, c]])          # [2, 2, N]
    return np.einsum('aij,jka->aik', points, rot_t)


def rotation_3d_in_axis_np(points, angles, axis=0):
    """Rotate [N, P, 3] point sets about a coordinate axis (:170-199)."""
    c, s = np.cos(angles), np.sin(angles)
    ones, zeros = np.ones_like(c), np.zeros_like(c)
    if axis == 1:
        rot_t = np.stack([[c, zeros, -s], [zeros, ones, zeros],
                          [s, zeros, c]])
    elif axis in (2, -1):
        rot_t = np.stack([[c, -s, zeros], [s, c, zeros],
                          [zeros, zeros, ones]])
    elif axis == 0:
        rot_t = np.stack([[ones, zeros, zeros], [zeros, c, -s],
                          [zeros, s, c]])
    else:
        raise ValueError(f'axis should be in range [0, 2], got {axis}')
    return np.einsum('aij,jka->aik', points, rot_t)


def rotation_points_single_angle(points, angle, axis=0):
    """Rotate [N, 3] points by one angle; returns (points, rot_mat_T)."""
    out = rotation_3d_in_axis_np(points[None, :, :3],
                                 np.asarray([angle]), axis=axis)[0]
    rot_t = rotation_3d_in_axis_np(np.eye(3)[None],
                                   np.asarray([angle]), axis=axis)[0]
    if points.shape[1] > 3:
        out = np.concatenate([out, points[:, 3:]], axis=1)
    return out, rot_t


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """[N, 2] centers + dims (+ angles) -> [N, 4, 2] corners (:98-119)."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers.reshape(-1, 1, 2)


def center_to_corner_box3d(centers, dims, angles=None,
                           origin=(0.5, 1.0, 0.5), axis=1):
    """KITTI-style corners: camera default origin/axis (:201-229)."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis_np(corners, angles, axis=axis)
    return corners + centers.reshape(-1, 1, 3)


def corner_to_standup_nd(boxes_corner):
    """[N, P, d] corners -> [N, 2d] axis-aligned minmax boxes (:262-280)."""
    return np.concatenate([boxes_corner.min(axis=1),
                           boxes_corner.max(axis=1)], axis=1)


def corner_to_surfaces_3d(corners):
    """[N, 8, 3] corners -> [N, 6, 4, 3] surfaces, normals pointing OUT
    (reference :376-396 vertex grouping)."""
    return np.array([
        [corners[:, 0], corners[:, 1], corners[:, 2], corners[:, 3]],
        [corners[:, 7], corners[:, 6], corners[:, 5], corners[:, 4]],
        [corners[:, 0], corners[:, 3], corners[:, 7], corners[:, 4]],
        [corners[:, 1], corners[:, 5], corners[:, 6], corners[:, 2]],
        [corners[:, 0], corners[:, 4], corners[:, 5], corners[:, 1]],
        [corners[:, 3], corners[:, 2], corners[:, 6], corners[:, 7]],
    ]).transpose([2, 0, 1, 3])


def minmax_to_corner_2d(minmax_box):
    ndim = minmax_box.shape[-1] // 2
    center = minmax_box[..., :ndim]
    dims = minmax_box[..., ndim:] - center
    return center_to_corner_box2d(center, dims, origin=0.0)


def center_to_minmax_2d(centers, dims, origin=0.5):
    if origin == 0.5:
        return np.concatenate([centers - dims / 2, centers + dims / 2],
                              axis=-1)
    corners = center_to_corner_box2d(centers, dims, origin=origin)
    return corners[:, [0, 2]].reshape(-1, 4)


def rbbox2d_to_near_bbox(rbboxes):
    """[N, 5] rotated BEV boxes -> nearest axis-aligned [N, 4] (:516-533)."""
    rots = np.abs(limit_period_np(rbboxes[..., -1], 0.5, np.pi))
    cond = (rots > np.pi / 4)[..., None]
    centered = np.where(cond, rbboxes[:, [0, 1, 3, 2]], rbboxes[:, :4])
    return center_to_minmax_2d(centered[:, :2], centered[:, 2:])


# ---------------------------------------------------------------------------
# projection / frustum culling (reference box_np_ops.py:338-655)
# ---------------------------------------------------------------------------

def points_cam2img(points_3d, proj_mat):
    """[..., 3] camera points -> [..., 2] pixels (reference :338-354)."""
    shape = points_3d.shape
    hom = np.concatenate(
        [points_3d, np.ones(shape[:-1] + (1,), points_3d.dtype)], axis=-1)
    if proj_mat.shape == (3, 4):
        proj_mat = np.concatenate(
            [proj_mat, np.array([[0, 0, 0, 1]], proj_mat.dtype)], 0)
    pix = hom @ proj_mat.T
    return pix[..., :2] / np.maximum(pix[..., 2:3], 1e-8)


def box3d_to_bbox(box3d, p2):
    """[N, 7] camera boxes -> [N, 4] image bboxes via P2 (:356-374)."""
    corners = center_to_corner_box3d(box3d[:, :3], box3d[:, 3:6],
                                     box3d[:, 6], origin=(0.5, 1.0, 0.5),
                                     axis=1)
    pix = points_cam2img(corners, p2)
    return np.concatenate([pix.min(axis=1), pix.max(axis=1)], axis=1)


def projection_matrix_to_CRT_kitti(proj):
    """P = C @ [R|T] split via QR (reference :574-596)."""
    cr = proj[0:3, 0:3]
    ct = proj[0:3, 3]
    rinv_cinv = np.linalg.inv(cr)
    rinv, cinv = np.linalg.qr(rinv_cinv)
    c = np.linalg.inv(cinv)
    r = np.linalg.inv(rinv)
    t = cinv @ ct
    return c, r, t


def get_frustum(bbox_image, c_mat, near_clip=0.001, far_clip=100):
    """[8, 3] camera-frame frustum corners of an image bbox (:626-655)."""
    fku = c_mat[0, 0]
    fkv = -c_mat[1, 1]
    u0v0 = c_mat[0:2, 2]
    z_points = np.array([near_clip] * 4 + [far_clip] * 4,
                        c_mat.dtype)[:, None]
    b = bbox_image
    box_corners = np.array(
        [[b[0], b[1]], [b[0], b[3]], [b[2], b[3]], [b[2], b[1]]],
        c_mat.dtype)
    near = (box_corners - u0v0) / np.array(
        [fku / near_clip, -fkv / near_clip], c_mat.dtype)
    far = (box_corners - u0v0) / np.array(
        [fku / far_clip, -fkv / far_clip], c_mat.dtype)
    return np.concatenate([np.concatenate([near, far], 0), z_points], 1)


def surface_equ_3d(polygon_surfaces):
    """[N, S, 4, 3] surfaces -> plane normals [N, S, 3] + offsets [N, S]."""
    surface_vec = polygon_surfaces[:, :, :2, :] - \
        polygon_surfaces[:, :, 1:3, :]
    normal_vec = np.cross(surface_vec[:, :, 0], surface_vec[:, :, 1])
    d = -np.einsum('aij,aij->ai', normal_vec, polygon_surfaces[:, :, 0])
    return normal_vec, d


def points_in_convex_polygon_3d(points, polygon_surfaces,
                                num_surfaces=None):
    """[P, 3] x [N, S, 4, 3] -> [P, N] bool (reference :682-746)."""
    normal_vec, d = surface_equ_3d(polygon_surfaces)
    sign = np.einsum('pk,nsk->pns', points, normal_vec) + d[None]
    if num_surfaces is not None:
        live = np.arange(polygon_surfaces.shape[1])[None, :] < \
            np.asarray(num_surfaces)[:, None]
        sign = np.where(live[None], sign, -1.0)
    return (sign < 0).all(axis=-1)


def points_in_convex_polygon(points, polygon, clockwise=True):
    """[P, 2] x [N, V, 2] -> [P, N] bool (reference :748-791)."""
    vec = polygon - np.roll(polygon, -1, axis=1)   # edge vectors
    if clockwise:
        vec = -vec
    # cross(edge, p - vertex) >= 0 for all edges
    rel_x = points[:, None, None, 0] - polygon[None, :, :, 0]
    rel_y = points[:, None, None, 1] - polygon[None, :, :, 1]
    cross = vec[None, :, :, 0] * rel_y - vec[None, :, :, 1] * rel_x
    return (cross >= 0).all(axis=-1)


def remove_outside_points(points, rect, trv2c, p2, image_shape):
    """Frustum-cull points outside the image (reference :598-624)."""
    c, r, t = projection_matrix_to_CRT_kitti(p2)
    image_bbox = [0, 0, image_shape[1], image_shape[0]]
    frustum = get_frustum(image_bbox, c)
    frustum -= t
    frustum = (np.linalg.inv(r) @ frustum.T).T
    frustum = camera_to_lidar(frustum, rect, trv2c)
    surfaces = corner_to_surfaces_3d(frustum[None])
    keep = points_in_convex_polygon_3d(points[:, :3], surfaces)
    return points[keep.reshape(-1)]


def create_anchors_3d_range(feature_size, anchor_range,
                            sizes=((1.6, 3.9, 1.56),),
                            rotations=(0, np.pi / 2), dtype=np.float32):
    """Range-based anchor grid [*fs, n_sizes, n_rots, 7] (:450-496)."""
    anchor_range = np.array(anchor_range, dtype)
    z = np.linspace(anchor_range[2], anchor_range[5], feature_size[0],
                    dtype=dtype)
    y = np.linspace(anchor_range[1], anchor_range[4], feature_size[1],
                    dtype=dtype)
    x = np.linspace(anchor_range[0], anchor_range[3], feature_size[2],
                    dtype=dtype)
    sizes = np.reshape(np.array(sizes, dtype=dtype), [-1, 3])
    rotations = np.array(rotations, dtype=dtype)
    rets = list(np.meshgrid(x, y, z, rotations, indexing='ij'))
    tile_shape = [1] * 5
    tile_shape[-2] = sizes.shape[0]
    for i in range(len(rets)):
        rets[i] = np.tile(rets[i][..., np.newaxis, :], tile_shape)
        rets[i] = rets[i][..., np.newaxis]
    sizes_t = np.reshape(sizes, [1, 1, 1, -1, 1, 3])
    tile_size_shape = list(rets[0].shape)
    tile_size_shape[3] = 1
    sizes_t = np.tile(sizes_t, tile_size_shape)
    rets.insert(3, sizes_t)
    ret = np.concatenate(rets, axis=-1)
    return np.transpose(ret, [2, 1, 0, 3, 4, 5])


def iou_2d(boxes, query_boxes, mode='iou', eps=0.0):
    """Axis-aligned 2D IoU/IoF [N, K] (reference iou_jit :536-572)."""
    b = boxes[:, None]
    q = query_boxes[None]
    iw = np.minimum(b[..., 2], q[..., 2]) - np.maximum(b[..., 0], q[..., 0]) \
        + eps
    ih = np.minimum(b[..., 3], q[..., 3]) - np.maximum(b[..., 1], q[..., 1]) \
        + eps
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    area_b = (b[..., 2] - b[..., 0] + eps) * (b[..., 3] - b[..., 1] + eps)
    if mode == 'iou':
        area_q = (q[..., 2] - q[..., 0] + eps) * (q[..., 3] - q[..., 1] + eps)
        denom = area_b + area_q - inter
    else:
        denom = area_b
    return inter / np.maximum(denom, 1e-12)


def boxes3d_to_corners3d_lidar(boxes3d, bottom_center=True):
    """[N, 7] LiDAR (x, y, z, w, l, h, ry) -> [N, 8, 3] KITTI corner order
    (reference :793-857)."""
    n = boxes3d.shape[0]
    w, l, h = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    x_c = np.stack([w / 2, -w / 2, -w / 2, w / 2] * 2, 1)
    y_c = np.stack([-l / 2, -l / 2, l / 2, l / 2] * 2, 1)
    if bottom_center:
        z_c = np.zeros((n, 8), np.float32)
        z_c[:, 4:] = h[:, None]
    else:
        z_c = np.stack([-h / 2] * 4 + [h / 2] * 4, 1)
    ry = boxes3d[:, 6]
    corners = np.stack([x_c, y_c, z_c], -1)             # [N, 8, 3]
    c, s = np.cos(ry), np.sin(ry)
    zeros, ones = np.zeros_like(ry), np.ones_like(ry)
    # CCW +yaw about z — this framework's convention throughout
    # (core/boxes.py corners_3d); the reference's KITTI variant rotates
    # clockwise, a legacy inconsistency dropped here.
    rot = np.stack([np.stack([c, s, zeros], -1),
                    np.stack([-s, c, zeros], -1),
                    np.stack([zeros, zeros, ones], -1)], -2)  # [N, 3, 3]
    corners = corners @ rot
    return (corners + boxes3d[:, None, :3]).astype(np.float32)
