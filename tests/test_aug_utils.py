"""Collision-gated per-object augmentation (ObjectNoise).

Reference parity: mmdet3d/datasets/pipelines/data_augment_utils.py
(box_collision_test :30-127, noise_per_box :129-165,
noise_per_object_v3_ :328-408) and transforms_3d.py ObjectNoise.
Oracle here is hand-built geometry: known-crossing / known-disjoint /
containment rectangle pairs, plus behavioral invariants of the greedy
rejection loop (zero noise always accepted, forced overlap rejected,
points ride their box rigidly).

Note the reference's strict-inequality predicates make exactly-collinear
axis-aligned overlaps invisible (corner/edge contact never counts as a
crossing); the test geometry below uses rotations or offset y-extents so
overlaps are proper crossings, as real jittered boxes are.
"""
import numpy as np

from msmdfusion_tpu.core.box_np_ops import (center_to_corner_box2d,
                                            points_in_rbbox_np)
from msmdfusion_tpu.datasets.pipelines.aug_utils import (
    box_collision_test, noise_per_box, noise_per_object_v3)
from msmdfusion_tpu.datasets.pipelines.transforms_3d import ObjectNoise


def _corners(cx, cy, dx, dy, yaw=0.0):
    # float dtype matters: corners_nd inherits dims.dtype (reference
    # box_np_ops.py:48-79 has the same contract) and an int origin would
    # truncate 0.5 -> 0
    return center_to_corner_box2d(
        np.array([[cx, cy]], float), np.array([[dx, dy]], float),
        np.array([yaw], float))[0]


def test_box_collision_basic_cases():
    a = _corners(0, 0, 2, 2)
    far = _corners(5, 0, 2, 2)               # disjoint
    overlap = _corners(1.0, 0.4, 2, 1.0)     # proper edge crossings
    inside = _corners(0, 0, 0.5, 0.5, 0.3)   # fully contained, no crossing
    touching = _corners(2.0, 0, 2, 2)        # shares the x=1 edge exactly

    coll = box_collision_test(np.stack([a]), np.stack([far, overlap, inside,
                                                       touching]))
    assert coll.shape == (1, 4)
    assert not coll[0, 0]
    assert coll[0, 1]
    assert coll[0, 2], 'containment without edge crossing must collide'
    # reference uses strict inequalities: exact edge contact is free
    assert not coll[0, 3]


def test_box_collision_rotated_cross():
    # two long thin boxes crossing at 90 degrees through the origin:
    # neither contains the other's corners, but edges intersect
    a = _corners(0, 0, 6, 0.5, 0.0)
    b = _corners(0, 0, 6, 0.5, np.pi / 2)
    assert box_collision_test(a[None], b[None])[0, 0]


def test_box_collision_symmetry():
    rng = np.random.RandomState(3)
    boxes = np.stack([
        _corners(x, y, rng.uniform(0.5, 2), rng.uniform(0.5, 2),
                 rng.uniform(-np.pi, np.pi))
        for x, y in rng.uniform(-3, 3, (12, 2))])
    coll = box_collision_test(boxes, boxes)
    assert np.array_equal(coll, coll.T)
    # identical corner sets never satisfy the STRICT predicates (corners
    # coincide -> zero cross products) — the reference behaves the same,
    # which is why noise_per_box must clear coll[0, i] explicitly
    assert not coll.diagonal().any()


def test_noise_per_box_zero_noise_always_accepted():
    boxes = np.array([[0., 0., 2., 2., 0.3], [5., 0., 2., 2., -0.2]])
    loc = np.zeros((2, 4, 3))
    rot = np.zeros((2, 4))
    sel = noise_per_box(boxes, np.ones(2, bool), loc, rot)
    assert (sel == 0).all(), 'zero noise never collides -> first try wins'


def test_noise_per_box_rejects_forced_collision():
    # rotated neighbor clear of box 0 at rest (x-extents 1.09 + 1.39 <
    # 2.6 gap); every candidate shoves box 0 deep into box 1
    boxes = np.array([[0., 0., 2., 2., 0.1], [2.6, 0., 2., 2., 0.6]])
    loc = np.zeros((2, 8, 3))
    loc[0, :, 0] = 1.3   # all tries push box 0 right, into box 1
    rot = np.zeros((2, 8))
    sel = noise_per_box(boxes, np.ones(2, bool), loc, rot)
    assert sel[0] == -1
    assert sel[1] == 0   # box 1's zero-noise tries remain fine


def test_noise_per_box_greedy_updates_corner_set():
    # box 0 accepts a big jump to x=+4; box 1's only try moves to x=4 too,
    # which collides with box 0's NEW position -> must be rejected
    boxes = np.array([[0., 0., 2., 2., 0.2], [8., 0., 2., 2., 0.2]])
    loc = np.zeros((2, 1, 3))
    loc[0, 0, 0] = 4.0
    loc[1, 0, 0] = -4.0
    rot = np.full((2, 1), 0.05)
    sel = noise_per_box(boxes, np.ones(2, bool), loc, rot)
    assert sel[0] == 0
    assert sel[1] == -1, 'later box must see the earlier accepted noise'


def test_noise_per_object_points_ride_their_box():
    rng = np.random.RandomState(0)
    # (x, y, z_bottom, dx, dy, dz, yaw) — points_in_rbbox z spans [z, z+dz]
    gt = np.array([[0., 0., 0., 2., 2., 2., 0.],
                   [20., 0., 0., 2., 2., 2., 0.]])
    inside = np.array([[0.3, -0.2, 0.6, 9.9],
                       [20.1, 0.4, 1.3, 9.9]])
    outside = np.array([[10., 10., 0.5, 9.9]])
    pts = np.concatenate([inside, outside])
    assert points_in_rbbox_np(pts[:, :3], gt)[:2].any(axis=1).all()
    before = pts.copy()
    gt_before = gt.copy()
    noise_per_object_v3(gt, pts, rotation_perturb=[-0.3, 0.3],
                        center_noise_std=[0.5, 0.5, 0.5],
                        global_random_rot_range=[0., 0.], num_try=50,
                        rng=rng)
    # boxes moved (isolated boxes accept some noise with p ~ 1)
    assert not np.allclose(gt[:, :3], gt_before[:, :3])
    # rigid ride: p' = R(p - c) + c + t and c' = c + t, so the distance to
    # the box's reference point is invariant
    for j in range(2):
        d0 = np.linalg.norm(before[j, :3] - gt_before[j, :3])
        d1 = np.linalg.norm(pts[j, :3] - gt[j, :3])
        assert abs(d0 - d1) < 1e-9
    # extra feature channels and outside points untouched
    np.testing.assert_array_equal(pts[:, 3], before[:, 3])
    np.testing.assert_array_equal(pts[2], before[2])


def test_noise_per_object_rotation_matches_yaw_update():
    # a point rigidly attached to the box must keep its pose relative to
    # the box. The convention here (as in the reference) is clockwise
    # geometric rotation for positive angles (rotation_2d /
    # _rotation_box2d_jit_: x' = x cos + y sin), so a +rot yaw update
    # DECREASES the CCW atan2 bearing by rot: bearing + yaw is invariant.
    rng = np.random.RandomState(4)
    gt = np.array([[3., -2., 0., 2., 2., 2., 0.4]])
    pts = np.array([[3.9, -2.3, 1.0, 0.]])
    rel0 = pts[0, :2] - gt[0, :2]
    inv0 = np.arctan2(rel0[1], rel0[0]) + gt[0, 6]
    noise_per_object_v3(gt, pts, rotation_perturb=[-0.5, 0.5],
                        center_noise_std=[0.3, 0.3, 0.3],
                        global_random_rot_range=[0., 0.], num_try=30,
                        rng=rng)
    assert abs(gt[0, 6] - 0.4) > 1e-3, 'rotation noise must have applied'
    rel = pts[0, :2] - gt[0, :2]
    inv1 = np.arctan2(rel[1], rel[0]) + gt[0, 6]
    assert abs((inv1 - inv0 + np.pi) % (2 * np.pi) - np.pi) < 1e-9


def test_object_noise_pipeline_keeps_box_count_and_dims():
    rng = np.random.RandomState(7)
    np.random.seed(7)
    boxes = np.concatenate([rng.uniform(-20, 20, (6, 2)),
                            np.zeros((6, 1)),
                            rng.uniform(1, 3, (6, 3)),
                            rng.uniform(-np.pi, np.pi, (6, 1))], axis=1)
    pts = rng.uniform(-25, 25, (500, 5)).astype(np.float32)
    res = {'points': pts.copy(), 'gt_bboxes_3d': boxes.copy(),
           'gt_labels_3d': np.zeros(6, np.int64)}
    out = ObjectNoise(translation_std=(0.25, 0.25, 0.25),
                      rot_range=(-0.157, 0.157), num_try=20)(res)
    assert out['gt_bboxes_3d'].shape == boxes.shape
    # dims never change under rigid per-object noise
    np.testing.assert_allclose(out['gt_bboxes_3d'][:, 3:6], boxes[:, 3:6])
    assert out['points'].shape == pts.shape
