"""Box3DMode / Coord3DMode / cam & depth frame op tests.

Oracles are independent numpy re-derivations of the reference semantics
(mmdet3d/core/bbox/structures/{box_3d_mode.py, cam_box3d.py,
depth_box3d.py, coord_3d_mode.py}).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from msmdfusion_tpu.core import box_modes as bm
from msmdfusion_tpu.core import boxes as lidar_boxes


def rand_boxes(rng, n=12, extra=0):
    b = np.zeros((n, 7 + extra), np.float32)
    b[:, :3] = rng.uniform(-20, 20, (n, 3))
    b[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if extra:
        b[:, 7:] = rng.randn(n, extra)
    return b


ALL_PAIRS = [(bm.LIDAR, bm.CAM), (bm.CAM, bm.LIDAR), (bm.DEPTH, bm.CAM),
             (bm.CAM, bm.DEPTH), (bm.LIDAR, bm.DEPTH), (bm.DEPTH, bm.LIDAR)]


@pytest.mark.parametrize('src,dst', ALL_PAIRS)
def test_convert_boxes_round_trip(rng, src, dst):
    b = rand_boxes(rng, extra=2)
    back = np.asarray(bm.convert_boxes(bm.convert_boxes(b, src, dst),
                                       dst, src))
    np.testing.assert_allclose(back, b, atol=1e-5)


def test_convert_boxes_golden_lidar_to_cam(rng):
    """LIDAR (x,y,z) -> CAM (-y,-z,x); sizes (w,l,h) -> (l,h,w)."""
    b = rand_boxes(rng)
    out = np.asarray(bm.convert_boxes(b, bm.LIDAR, bm.CAM))
    np.testing.assert_allclose(out[:, 0], -b[:, 1], atol=1e-6)
    np.testing.assert_allclose(out[:, 1], -b[:, 2], atol=1e-6)
    np.testing.assert_allclose(out[:, 2], b[:, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], b[:, [4, 5, 3]], atol=1e-6)
    # CCW LiDAR yaw negates into the clockwise CAM frame (see convert_boxes)
    np.testing.assert_allclose(out[:, 6], -b[:, 6], atol=1e-6)


def test_convert_points_golden_and_passthrough(rng):
    pts = rng.randn(50, 5).astype(np.float32)
    out = np.asarray(bm.convert_points(pts, bm.LIDAR, bm.CAM))
    np.testing.assert_allclose(out[:, 0], -pts[:, 1], atol=1e-6)
    np.testing.assert_allclose(out[:, 1], -pts[:, 2], atol=1e-6)
    np.testing.assert_allclose(out[:, 2], pts[:, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 3:], pts[:, 3:], atol=1e-6)
    back = np.asarray(bm.convert_points(out, bm.CAM, bm.LIDAR))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_convert_boxes_with_4x4_rt(rng):
    """A real extrinsic (rotation + translation) applies to centers only."""
    b = rand_boxes(rng)
    th = 0.3
    rt = np.eye(4, dtype=np.float32)
    rt[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    rt[:3, 3] = [1.0, -2.0, 0.5]
    out = np.asarray(bm.convert_boxes(b, bm.LIDAR, bm.CAM, rt_mat=rt[:3]))
    expect_xyz = b[:, :3] @ rt[:3, :3].T + rt[:3, 3]
    np.testing.assert_allclose(out[:, :3], expect_xyz, atol=1e-5)
    del th


def test_corner_covariance_lidar_to_cam(rng):
    """Corners of the converted box == rt @ corners of the source box,
    as point sets (corner enumeration order may differ between frames)."""
    b = rand_boxes(rng, n=6)
    src_corners = np.asarray(lidar_boxes.corners_3d(jnp.asarray(b)))
    rt = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    mapped = src_corners @ rt.T
    cam = bm.convert_boxes(b, bm.LIDAR, bm.CAM)
    cam_corners = np.asarray(bm.cam_corners_3d(cam))
    for i in range(len(b)):
        d = np.linalg.norm(mapped[i][:, None] - cam_corners[i][None], axis=-1)
        assert d.min(axis=1).max() < 1e-3, f'box {i}: corner sets differ'


def test_corner_covariance_lidar_to_depth(rng):
    b = rand_boxes(rng, n=6)
    src_corners = np.asarray(lidar_boxes.corners_3d(jnp.asarray(b)))
    rt = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    mapped = src_corners @ rt.T
    dep = bm.convert_boxes(b, bm.LIDAR, bm.DEPTH)
    dep_corners = np.asarray(bm.depth_corners_3d(dep))
    for i in range(len(b)):
        d = np.linalg.norm(mapped[i][:, None] - dep_corners[i][None], axis=-1)
        assert d.min(axis=1).max() < 1e-3


def test_rotation_3d_in_axis_matches_numpy(rng):
    pts = rng.randn(4, 8, 3).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    for axis in (0, 1, 2):
        out = np.asarray(bm.rotation_3d_in_axis(jnp.asarray(pts),
                                                jnp.asarray(ang), axis=axis))
        for i, a in enumerate(ang):
            c, s = np.cos(a), np.sin(a)
            if axis == 0:
                r = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
            elif axis == 1:
                r = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
            else:
                r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            # reference right-multiplies by rot_mat_T (not transposed)
            np.testing.assert_allclose(out[i], pts[i] @ r, atol=1e-5)


def test_cam_gravity_center_y_down(rng):
    b = rand_boxes(rng)
    g = np.asarray(bm.cam_gravity_center(b))
    np.testing.assert_allclose(g[:, 1], b[:, 1] - b[:, 4] * 0.5, atol=1e-6)
    np.testing.assert_allclose(g[:, [0, 2]], b[:, [0, 2]], atol=1e-6)


def test_cam_rotate_round_trip_and_points(rng):
    b = rand_boxes(rng)
    pts = rng.randn(30, 4).astype(np.float32)
    out, pts_r = bm.cam_rotate(jnp.asarray(b), 0.7, jnp.asarray(pts))
    back, pts_b = bm.cam_rotate(out, -0.7, pts_r)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pts_b), pts, atol=1e-4)
    # rotation preserves norms in the xz plane (y is the axis)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out)[:, [0, 2]], axis=1),
        np.linalg.norm(b[:, [0, 2]], axis=1), atol=1e-4)


def test_depth_rotate_yaw_decreases(rng):
    b = rand_boxes(rng)
    out = np.asarray(bm.depth_rotate(jnp.asarray(b), 0.5))
    np.testing.assert_allclose(out[:, 6], b[:, 6] - 0.5, atol=1e-6)


def test_flip_involution(rng):
    b = rand_boxes(rng)
    for fn in (bm.cam_flip, bm.depth_flip):
        for d in ('horizontal', 'vertical'):
            twice = np.asarray(fn(fn(jnp.asarray(b), d), d))
            np.testing.assert_allclose(twice[:, :6], b[:, :6], atol=1e-5)
            # yaw returns modulo 2*pi
            dy = (twice[:, 6] - b[:, 6]) / (2 * np.pi)
            np.testing.assert_allclose(dy, np.round(dy), atol=1e-5)


def test_nearest_bev_golden():
    # yaw ~ pi/2 swaps w/l; yaw ~ 0 keeps them
    bev = jnp.asarray([[0.0, 0.0, 2.0, 6.0, 0.0],
                       [1.0, 2.0, 2.0, 6.0, np.pi / 2]], jnp.float32)
    out = np.asarray(bm.nearest_bev(bev))
    np.testing.assert_allclose(out[0], [-1, -3, 1, 3], atol=1e-5)
    np.testing.assert_allclose(out[1], [-2, 1, 4, 3], atol=1e-5)


def test_cam_height_overlaps_golden():
    # y down: box bottom at y, top at y - h
    b1 = jnp.asarray([[0, 1.0, 0, 1, 2.0, 1, 0]], jnp.float32)   # y in [-1, 1]
    b2 = jnp.asarray([[0, 0.5, 0, 1, 1.0, 1, 0],                 # y in [-.5, .5]
                      [0, 5.0, 0, 1, 1.0, 1, 0]], jnp.float32)   # disjoint
    ov = np.asarray(bm.cam_height_overlaps(b1, b2))
    np.testing.assert_allclose(ov, [[1.0, 0.0]], atol=1e-6)


def test_enlarged_box_golden(rng):
    b = rand_boxes(rng)
    out = np.asarray(bm.enlarged_box(b, 0.25))
    np.testing.assert_allclose(out[:, 3:6], b[:, 3:6] + 0.5, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], b[:, 2] - 0.25, atol=1e-6)
    np.testing.assert_allclose(out[:, [0, 1, 6]], b[:, [0, 1, 6]], atol=1e-6)


def test_shift_origin_gravity_to_bottom(rng):
    b = rand_boxes(rng)
    out = np.asarray(bm.shift_origin(b, (0.5, 0.5, 0.5), (0.5, 0.5, 0.0)))
    np.testing.assert_allclose(out[:, 2], b[:, 2] - b[:, 5] * 0.5, atol=1e-6)
    back = np.asarray(bm.shift_origin(out, (0.5, 0.5, 0.0), (0.5, 0.5, 0.5)))
    np.testing.assert_allclose(back, b, atol=1e-6)


def test_surface_line_centers_brute_force(rng):
    b = rand_boxes(rng, n=3)
    surf, line = bm.get_surface_line_center(jnp.asarray(b))
    surf, line = np.asarray(surf), np.asarray(line)
    assert surf.shape == (18, 3) and line.shape == (36, 3)
    # brute-force: rotate offsets by -yaw^T (reference rot_mat_T), add center
    for i in range(3):
        dims, yaw = b[i, 3:6], b[i, 6]
        ctr = b[i, :3].copy()
        ctr[2] += dims[2] / 2
        c, s = np.cos(-yaw), np.sin(-yaw)
        rot_t = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        offs = np.array([[0, 0, 1], [0, 0, -1], [0, 1, 0],
                         [0, -1, 0], [1, 0, 0], [-1, 0, 0]]) / 2 * dims
        expect = offs @ rot_t.T + ctr
        np.testing.assert_allclose(surf[i * 6:(i + 1) * 6], expect, atol=1e-4)
