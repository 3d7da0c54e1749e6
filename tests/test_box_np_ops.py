"""box_np_ops tests (numpy pipeline box math vs independent oracles).

Reference semantics: mmdet3d/core/bbox/box_np_ops.py.
"""
import numpy as np
import pytest

from msmdfusion_tpu.core import box_np_ops as bno


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_corners_nd_2d_order():
    corners = bno.corners_nd(np.array([[2.0, 4.0]]), origin=0.5)
    np.testing.assert_allclose(
        corners[0], [[-1, -2], [-1, 2], [1, 2], [1, -2]], atol=1e-6)


def test_center_to_corner_box3d_matches_cam_corners(rng):
    """Camera-default origin/axis must agree with box_modes.cam_corners_3d."""
    from msmdfusion_tpu.core import box_modes as bm
    boxes = np.zeros((5, 7), np.float32)
    boxes[:, :3] = rng.uniform(-5, 5, (5, 3))
    boxes[:, 3:6] = rng.uniform(1, 3, (5, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    ours = bno.center_to_corner_box3d(boxes[:, :3], boxes[:, 3:6],
                                      boxes[:, 6])
    jax_ver = np.asarray(bm.cam_corners_3d(boxes))
    np.testing.assert_allclose(ours, jax_ver, atol=1e-4)


def test_boxes3d_to_corners3d_lidar_matches_corner_set(rng):
    boxes = np.zeros((4, 7), np.float32)
    boxes[:, :3] = rng.uniform(-5, 5, (4, 3))
    boxes[:, 3:6] = rng.uniform(1, 3, (4, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 4)
    a = bno.boxes3d_to_corners3d_lidar(boxes)
    b = bno.corners_3d_np(boxes)
    for i in range(4):   # same 8 corners, enumeration order may differ
        d = np.linalg.norm(a[i][:, None] - b[i][None], axis=-1)
        assert d.min(axis=1).max() < 1e-4


def test_box_camera_lidar_round_trip(rng):
    rect = np.eye(4, dtype=np.float64)
    velo2cam = np.eye(4, dtype=np.float64)
    velo2cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
    velo2cam[:3, 3] = [0.1, -0.2, 0.3]
    cam = np.zeros((6, 7))
    cam[:, :3] = rng.uniform(-10, 10, (6, 3))
    cam[:, 3:6] = rng.uniform(1, 4, (6, 3))
    cam[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    lidar = bno.box_camera_to_lidar(cam, rect, velo2cam)
    back = bno.box_lidar_to_camera(lidar, rect, velo2cam)
    np.testing.assert_allclose(back[:, :6], cam[:, :6], atol=1e-6)
    dyaw = (back[:, 6] - cam[:, 6]) / (2 * np.pi)
    np.testing.assert_allclose(dyaw, np.round(dyaw), atol=1e-6)


def test_points_cam2img_golden():
    p2 = np.array([[700.0, 0, 600, 0], [0, 700, 200, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]])
    pts = np.array([[0.0, 0.0, 10.0], [1.0, -1.0, 5.0]])
    pix = bno.points_cam2img(pts, p2)
    np.testing.assert_allclose(pix, [[600, 200], [740, 60]], atol=1e-4)


def test_box3d_to_bbox_contains_center_projection(rng):
    p2 = np.array([[700.0, 0, 600, 0], [0, 700, 200, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]])
    box = np.array([[2.0, 1.5, 20.0, 4.0, 1.5, 1.8, 0.4]])
    bbox = bno.box3d_to_bbox(box, p2)[0]
    ctr = bno.points_cam2img(np.array([[2.0, 0.75, 20.0]]), p2)[0]
    assert bbox[0] < ctr[0] < bbox[2] and bbox[1] < ctr[1] < bbox[3]


def test_projection_matrix_crt_reconstruction():
    c = np.array([[721.5, 0.0, 609.6], [0, 721.5, 172.9], [0, 0, 1]])
    r = np.eye(3)
    t = np.array([44.86, 0.216, 0.003])
    proj = np.eye(4)
    proj[:3, :3] = c @ r
    proj[:3, 3] = c @ t
    c2, r2, t2 = bno.projection_matrix_to_CRT_kitti(proj)
    np.testing.assert_allclose(c2 @ r2, c @ r, atol=1e-6)
    np.testing.assert_allclose(r2 @ np.linalg.inv(r2), np.eye(3), atol=1e-9)
    np.testing.assert_allclose(c2 @ t2, proj[:3, 3], atol=1e-6)


def test_points_in_convex_polygon_square():
    poly = np.array([[[0, 0], [0, 2], [2, 2], [2, 0]]], np.float64)  # CCW
    pts = np.array([[1.0, 1.0], [3.0, 1.0], [-0.1, 1.0]])
    inside = bno.points_in_convex_polygon(pts, poly, clockwise=False)
    assert inside[:, 0].tolist() == [True, False, False]


def test_points_in_convex_polygon_3d_matches_rbbox(rng):
    boxes = np.zeros((3, 7))
    boxes[:, :3] = rng.uniform(-3, 3, (3, 3))
    boxes[:, 3:6] = rng.uniform(1, 3, (3, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 3)
    pts = rng.uniform(-5, 5, (500, 3))
    # lidar convention corners: origin (0.5, 0.5, 0), yaw about z
    corners = bno.center_to_corner_box3d(
        boxes[:, :3], boxes[:, 3:6], boxes[:, 6],
        origin=(0.5, 0.5, 0.0), axis=2)
    surfaces = bno.corner_to_surfaces_3d(corners)
    in_poly = bno.points_in_convex_polygon_3d(pts, surfaces)
    in_rbbox = bno.points_in_rbbox_np(pts, boxes)
    # boundary points may differ; demand > 99% agreement
    agree = (in_poly == in_rbbox).mean()
    assert agree > 0.99, agree


def test_remove_outside_points_synthetic():
    rect = np.eye(4)
    trv2c = np.eye(4)
    trv2c[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
    p2 = np.array([[700.0, 0, 600, 0], [0, 700, 200, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]])
    # lidar +x is camera +z (front). A point far to the side projects out.
    pts = np.array([[10.0, 0.0, 0.0, 0.5],      # center of image
                    [10.0, 50.0, 0.0, 0.5],     # far left, outside
                    [-5.0, 0.0, 0.0, 0.5]])     # behind camera
    kept = bno.remove_outside_points(pts, rect, trv2c, p2, (400, 1200))
    assert len(kept) == 1 and kept[0, 0] == 10.0 and kept[0, 1] == 0.0


def test_rbbox2d_to_near_bbox_golden():
    rb = np.array([[0.0, 0.0, 2.0, 6.0, 0.0],
                   [0.0, 0.0, 2.0, 6.0, np.pi / 2]])
    out = bno.rbbox2d_to_near_bbox(rb)
    np.testing.assert_allclose(out[0], [-1, -3, 1, 3], atol=1e-6)
    np.testing.assert_allclose(out[1], [-3, -1, 3, 1], atol=1e-6)


def test_create_anchors_3d_range_shape_and_centers():
    anchors = bno.create_anchors_3d_range(
        (1, 4, 4), [0, 0, -1, 4, 4, -1], sizes=((1.6, 3.9, 1.56),),
        rotations=(0, np.pi / 2))
    assert anchors.shape == (1, 4, 4, 1, 2, 7)
    np.testing.assert_allclose(anchors[0, 0, 0, 0, 0, :3], [0, 0, -1],
                               atol=1e-6)
    np.testing.assert_allclose(anchors[0, -1, -1, 0, 0, :3], [4, 4, -1],
                               atol=1e-6)
    np.testing.assert_allclose(anchors[..., 3:6].reshape(-1, 3)[0],
                               [1.6, 3.9, 1.56], atol=1e-6)


def test_iou_2d_golden():
    a = np.array([[0.0, 0, 2, 2]])
    b = np.array([[1.0, 1, 3, 3], [0.0, 0, 2, 2]])
    np.testing.assert_allclose(bno.iou_2d(a, b)[0], [1 / 7, 1.0], atol=1e-6)
    np.testing.assert_allclose(bno.iou_2d(a, b, mode='iof')[0], [0.25, 1.0],
                               atol=1e-6)


def test_rotation_points_single_angle_round_trip(rng):
    pts = rng.randn(20, 5)
    out, rot_t = bno.rotation_points_single_angle(pts.copy(), 0.7, axis=2)
    back, _ = bno.rotation_points_single_angle(out, -0.7, axis=2)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    assert rot_t.shape == (3, 3)
