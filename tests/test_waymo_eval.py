"""Native Waymo L1/L2 mAP/mAPH protocol (core/evaluation/waymo_eval.py).

The reference delegates Waymo metrics to the external waymo-open-dataset
binary (mmdet3d/core/evaluation/waymo_utils/prediction_kitti_to_waymo.py);
these tests pin the native evaluator to hand-computable golden values.
"""
import numpy as np

from msmdfusion_tpu.core.evaluation.waymo_eval import (
    assign_levels, lidar_3d_iou, waymo_eval)


def _box(x, y, yaw=0.0, dx=4.0, dy=2.0, dz=1.5, z=0.0):
    return [x, y, z, dx, dy, dz, yaw]


def test_lidar_3d_iou_identity_and_disjoint():
    a = np.array([_box(0, 0)], np.float64)
    b = np.array([_box(0, 0), _box(100, 100)], np.float64)
    iou = lidar_3d_iou(a, b)
    assert np.allclose(iou[0, 0], 1.0, atol=1e-6)
    assert iou[0, 1] == 0.0


def test_lidar_3d_iou_half_height_offset():
    # identical BEV footprint, z offset by half the height -> IoU = 1/3
    a = np.array([_box(0, 0, z=0.0)], np.float64)
    b = np.array([_box(0, 0, z=0.75)], np.float64)
    assert np.allclose(lidar_3d_iou(a, b)[0, 0], 1 / 3, atol=1e-6)


def test_assign_levels():
    lv = assign_levels(np.array([10, 5, 1, 0]))
    assert lv.tolist() == [1, 2, 2, 0]
    # labeler-provided levels win over the point heuristic
    lv = assign_levels(np.array([10, 10]), labeled=np.array([2, 0]))
    assert lv.tolist() == [2, 1]


def test_perfect_detection_scores_100():
    gts = [dict(boxes=np.array([_box(0, 0), _box(10, 0)], np.float64),
                labels=np.array([0, 0]),
                num_points=np.array([20, 20]))]
    dts = [dict(boxes=np.array([_box(0, 0), _box(10, 0)], np.float64),
                labels=np.array([0, 0]),
                scores=np.array([0.9, 0.8]))]
    _, m = waymo_eval(gts, dts, ['Car'])
    assert np.isclose(m['Waymo/L1/Car/AP'], 100.0, atol=0.01)
    assert np.isclose(m['Waymo/L1/Car/APH'], 100.0, atol=0.01)
    assert np.isclose(m['Waymo/L2/Car/AP'], 100.0, atol=0.01)


def test_aph_penalizes_heading_error():
    # flipped heading: heading accuracy = 0 -> APH 0, AP unaffected
    gts = [dict(boxes=np.array([_box(0, 0, yaw=0.0)], np.float64),
                labels=np.array([0]), num_points=np.array([20]))]
    dts = [dict(boxes=np.array([_box(0, 0, yaw=np.pi)], np.float64),
                labels=np.array([0]), scores=np.array([0.9]))]
    _, m = waymo_eval(gts, dts, ['Car'])
    assert np.isclose(m['Waymo/L1/Car/AP'], 100.0, atol=0.01)
    assert m['Waymo/L1/Car/APH'] < 1.0
    # quarter-turn error on a SQUARE box (IoU unaffected) -> APH weight 0.5
    gts = [dict(boxes=np.array([_box(0, 0, yaw=0.0, dx=2.0, dy=2.0)],
                               np.float64),
                labels=np.array([0]), num_points=np.array([20]))]
    dts = [dict(boxes=np.array([_box(0, 0, yaw=np.pi / 2, dx=2.0, dy=2.0)],
                               np.float64),
                labels=np.array([0]), scores=np.array([0.9]))]
    _, m = waymo_eval(gts, dts, ['Car'])
    assert np.isclose(m['Waymo/L1/Car/AP'], 100.0, atol=0.01)
    assert np.isclose(m['Waymo/L1/Car/APH'], 50.0, atol=1.0)


def test_l1_ignores_l2_only_gt():
    # one L1 gt (detected), one L2 gt (missed): L1 recall is perfect, the
    # L2-matched detection is neither TP nor FP at L1
    gts = [dict(boxes=np.array([_box(0, 0), _box(10, 0)], np.float64),
                labels=np.array([0, 0]),
                num_points=np.array([20, 2]))]     # second box is LEVEL_2
    dts = [dict(boxes=np.array([_box(0, 0), _box(10, 0)], np.float64),
                labels=np.array([0, 0]),
                scores=np.array([0.9, 0.8]))]
    _, m = waymo_eval(gts, dts, ['Car'])
    assert np.isclose(m['Waymo/L1/Car/AP'], 100.0, atol=0.01)
    assert np.isclose(m['Waymo/L2/Car/AP'], 100.0, atol=0.01)
    # now drop the L2 detection: L1 unchanged, L2 recall halves
    dts = [dict(boxes=np.array([_box(0, 0)], np.float64),
                labels=np.array([0]), scores=np.array([0.9]))]
    _, m = waymo_eval(gts, dts, ['Car'])
    assert np.isclose(m['Waymo/L1/Car/AP'], 100.0, atol=0.01)
    assert m['Waymo/L2/Car/AP'] < 60.0


def test_false_positive_halves_precision():
    gts = [dict(boxes=np.array([_box(0, 0)], np.float64),
                labels=np.array([0]), num_points=np.array([20]))]
    dts = [dict(boxes=np.array([_box(0, 0), _box(50, 50)], np.float64),
                labels=np.array([0, 0]),
                scores=np.array([0.9, 0.95]))]     # FP scores HIGHER
    _, m = waymo_eval(gts, dts, ['Car'])
    # at every score cutoff that reaches the TP, precision is 1/2
    assert np.isclose(m['Waymo/L1/Car/AP'], 50.0, atol=1.0)


def test_zero_point_gt_excluded_everywhere():
    gts = [dict(boxes=np.array([_box(0, 0)], np.float64),
                labels=np.array([0]), num_points=np.array([0]))]
    dts = [dict(boxes=np.zeros((0, 7)), labels=np.zeros((0,), np.int64),
                scores=np.zeros((0,)))]
    _, m = waymo_eval(gts, dts, ['Car'])
    assert m['Waymo/L1/Car/AP'] == 0.0 and m['Waymo/L2/Car/AP'] == 0.0


def test_multiclass_means():
    gts = [dict(boxes=np.array([_box(0, 0), _box(10, 0, dx=0.8, dy=0.8)],
                               np.float64),
                labels=np.array([0, 1]), num_points=np.array([20, 20]))]
    dts = [dict(boxes=np.array([_box(0, 0)], np.float64),
                labels=np.array([0]), scores=np.array([0.9]))]
    _, m = waymo_eval(gts, dts, ['Car', 'Pedestrian'])
    assert np.isclose(m['Waymo/L1/mAP'], 50.0, atol=0.5)
    assert 'Waymo/L2/mAPH' in m


def test_protocol_labeled_native_proxy():
    """The native evaluator labels its output as a proxy (it is a
    re-derivation, not the official WOD binary)."""
    from msmdfusion_tpu.core.evaluation.waymo_eval import waymo_eval
    gt = [dict(boxes=np.array([[0, 0, 0, 2, 4, 1.5, 0]], np.float64),
               labels=np.array([0]), num_points=np.array([10]))]
    dt = [dict(boxes=np.array([[0, 0, 0, 2, 4, 1.5, 0]], np.float64),
               labels=np.array([0]), scores=np.array([0.9]))]
    report, metrics = waymo_eval(gt, dt, ['Car'])
    assert metrics['protocol'] == 'native-proxy'
    assert 'native' in report
