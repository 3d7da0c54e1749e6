"""Direct unit tests for the core geometry/post-processing primitives.

Round-1 gap: iou3d / NMS / coders / box ops / gaussian / anchors were only
exercised through detector smoke tests. These mirror the reference's
tests/test_utils golden-value style (test_box3d.py, test_box_np_ops.py,
test_nms.py, test_coders.py, test_anchors.py).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.core import boxes as B
from msmdfusion_tpu.core.iou3d import boxes_iou_bev, boxes_iou_3d
from msmdfusion_tpu.core.nms import (aligned_3d_nms, box3d_multiclass_nms,
                                     circle_nms, nms_bev)
from msmdfusion_tpu.core.coders import (CenterPointBBoxCoder,
                                        DeltaXYZWLHRBBoxCoder,
                                        TransFusionBBoxCoder)
from msmdfusion_tpu.core.gaussian import gaussian_radius, render_gaussian
from msmdfusion_tpu.core.anchors import Anchor3DRangeGenerator


# ---------------------------------------------------------------------------
# rotated IoU vs a shapely-free polygon-clipping numpy oracle
# ---------------------------------------------------------------------------

def _corners_np(box):
    x, y, w, l, yaw = box
    dx, dy = w / 2, l / 2
    # counter-clockwise order (Sutherland-Hodgman inside test assumes CCW)
    pts = np.array([[-dx, -dy], [dx, -dy], [dx, dy], [-dx, dy]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return pts @ rot.T + np.array([x, y])


def _poly_clip(subject, clip):
    """Sutherland-Hodgman convex polygon intersection."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-9

    def intersect(p1, p2, a, b):
        d1 = (b[0] - a[0]) * (p1[1] - a[1]) - (b[1] - a[1]) * (p1[0] - a[0])
        d2 = (b[0] - a[0]) * (p2[1] - a[1]) - (b[1] - a[1]) * (p2[0] - a[0])
        t = d1 / (d1 - d2)
        return p1 + t * (p2 - p1)

    output = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list, output = output, []
        if not input_list:
            return []
        s = input_list[-1]
        for p in input_list:
            if inside(p, a, b):
                if not inside(s, a, b):
                    output.append(intersect(s, p, a, b))
                output.append(p)
            elif inside(s, a, b):
                output.append(intersect(s, p, a, b))
            s = p
    return output


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    pts = np.asarray(poly)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def _iou_bev_oracle(a, b):
    ca, cb = _corners_np(a), _corners_np(b)
    inter = _poly_area(_poly_clip(ca, cb))
    ua = a[2] * a[3] + b[2] * b[3] - inter
    return inter / max(ua, 1e-9)


@pytest.mark.slow
def test_iou_bev_vs_polygon_oracle(rng):
    boxes_a, boxes_b = [], []
    for _ in range(30):
        boxes_a.append([rng.uniform(-5, 5), rng.uniform(-5, 5),
                        rng.uniform(0.5, 4), rng.uniform(0.5, 4),
                        rng.uniform(-np.pi, np.pi)])
        boxes_b.append([rng.uniform(-5, 5), rng.uniform(-5, 5),
                        rng.uniform(0.5, 4), rng.uniform(0.5, 4),
                        rng.uniform(-np.pi, np.pi)])
    boxes_a = np.asarray(boxes_a, np.float32)
    boxes_b = np.asarray(boxes_b, np.float32)
    got = np.asarray(boxes_iou_bev(jnp.asarray(boxes_a),
                                   jnp.asarray(boxes_b)))
    want = np.array([[_iou_bev_oracle(a, b) for b in boxes_b]
                     for a in boxes_a])
    assert np.abs(got - want).max() < 1e-2, np.abs(got - want).max()
    assert np.abs(got - want).mean() < 1e-3


def test_iou_bev_golden_cases():
    # identical boxes -> 1; disjoint -> 0; half-overlap axis-aligned
    a = jnp.asarray([[0, 0, 2, 2, 0.0]], jnp.float32)
    b = jnp.asarray([[0, 0, 2, 2, 0.0], [10, 10, 2, 2, 0.0],
                     [1, 0, 2, 2, 0.0], [0, 0, 2, 2, np.pi / 2]],
                    jnp.float32)
    iou = np.asarray(boxes_iou_bev(a, b))[0]
    assert np.allclose(iou, [1.0, 0.0, 1 / 3, 1.0], atol=1e-3), iou


def test_iou_3d_height_overlap():
    # same BEV footprint, half z-overlap
    a = jnp.asarray([[0, 0, 0.0, 2, 2, 2, 0.0]], jnp.float32)
    b = jnp.asarray([[0, 0, 1.0, 2, 2, 2, 0.0]], jnp.float32)
    iou = float(boxes_iou_3d(a, b)[0, 0])
    # inter = 2*2*1 = 4; union = 8 + 8 - 4 = 12
    assert abs(iou - 4 / 12) < 1e-4


# ---------------------------------------------------------------------------
# NMS golden cases
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_nms_bev_golden():
    boxes = jnp.asarray([
        [0, 0, 2, 2, 0.0],      # best
        [0.1, 0, 2, 2, 0.0],    # heavy overlap with 0 -> suppressed
        [5, 5, 2, 2, 0.0],      # kept
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, order = nms_bev(boxes, scores, thresh=0.5)
    kept = set(np.asarray(order)[np.asarray(keep)].tolist())
    assert kept == {0, 2}, kept


def test_circle_nms_golden():
    centers = jnp.asarray([[0, 0], [0.5, 0], [3, 3]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, order = circle_nms(centers, scores, radius=1.0)
    kept = set(np.asarray(order)[np.asarray(keep)].tolist())
    assert kept == {0, 2}, kept


def test_aligned_3d_nms_classwise():
    boxes = jnp.asarray([
        [0, 0, 0, 2, 2, 2], [0.1, 0, 0, 2.1, 2, 2], [0.1, 0, 0, 2.1, 2, 2],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 0, 1])
    keep, order = aligned_3d_nms(boxes, scores, classes, 0.25)
    kept = set(np.asarray(order)[np.asarray(keep)].tolist())
    # same-class overlap suppressed; different class survives
    assert kept == {0, 2}, kept


@pytest.mark.slow
def test_multiclass_nms_score_threshold(rng):
    n, c = 8, 3
    boxes3d = np.zeros((n, 9), np.float32)
    boxes3d[:, :2] = rng.uniform(-5, 5, (n, 2))
    boxes3d[:, 3:6] = 1.0
    bev = np.stack([boxes3d[:, 0], boxes3d[:, 1],
                    boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 6]], 1)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    out = box3d_multiclass_nms(
        jnp.asarray(boxes3d), jnp.asarray(bev), jnp.asarray(scores),
        score_thr=0.5, nms_thr=0.7, max_num=16)
    sel = np.asarray(out['valid'])
    assert np.all(np.asarray(out['scores'])[sel] > 0.5)
    assert out['boxes'].shape == (16, 9)


# ---------------------------------------------------------------------------
# coder encode/decode round-trips
# ---------------------------------------------------------------------------

def test_transfusion_coder_roundtrip(rng):
    coder = TransFusionBBoxCoder(
        pc_range=[-54.0, -54.0], voxel_size=[0.075, 0.075],
        out_size_factor=8,
        post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10],
        score_threshold=0.0, code_size=10)
    n = 16
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, :2] = rng.uniform(-50, 50, (n, 2))
    boxes[:, 2] = rng.uniform(-4, 2, n)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.uniform(-3, 3, (n, 2))
    enc = coder.encode(jnp.asarray(boxes))
    # decode expects the head's prediction dict layout [B, ch, N]
    center = enc[:, :2].T[None]
    height = enc[:, 2:3].T[None]
    dim = enc[:, 3:6].T[None]
    rot = enc[:, 6:8].T[None]
    vel = enc[:, 8:10].T[None]
    heatmap = jnp.ones((1, 1, n))
    dec = coder.decode(heatmap, rot, dim, center, height, vel)
    got = np.asarray(dec['bboxes'][0])
    # yaw compared via sin/cos (period)
    assert np.allclose(got[:, :6], boxes[:, :6], atol=1e-3)
    assert np.allclose(np.sin(got[:, 6]), np.sin(boxes[:, 6]), atol=1e-3)
    assert np.allclose(np.cos(got[:, 6]), np.cos(boxes[:, 6]), atol=1e-3)
    assert np.allclose(got[:, 7:9], boxes[:, 7:9], atol=1e-3)


def test_delta_coder_roundtrip(rng):
    coder = DeltaXYZWLHRBBoxCoder()
    n = 12
    anchors = np.zeros((n, 7), np.float32)
    anchors[:, :3] = rng.uniform(-10, 10, (n, 3))
    anchors[:, 3:6] = rng.uniform(1, 3, (n, 3))
    gt = anchors.copy()
    gt[:, :3] += rng.uniform(-1, 1, (n, 3))
    gt[:, 3:6] *= rng.uniform(0.8, 1.25, (n, 3))
    gt[:, 6] = rng.uniform(-1, 1, n)
    deltas = coder.encode(jnp.asarray(anchors), jnp.asarray(gt))
    back = np.asarray(coder.decode(jnp.asarray(anchors), deltas))
    assert np.allclose(back, gt, atol=1e-4)


# ---------------------------------------------------------------------------
# box ops
# ---------------------------------------------------------------------------

def test_limit_period():
    v = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi / 2])
    out = np.asarray(B.limit_period(v))
    assert np.allclose(out, [0.0, 0.0, 0.0, -np.pi / 2], atol=1e-5), out


def test_corners_and_points_in_rbbox():
    box = jnp.asarray([[1.0, 2.0, 0.0, 2.0, 4.0, 2.0, np.pi / 2]])
    corners = np.asarray(B.corners_3d(box))[0]
    assert corners.shape == (8, 3)
    # yaw 90deg swaps dx/dy extents around the center
    assert np.allclose(sorted([corners[:, 0].min(), corners[:, 0].max()]),
                       [-1.0, 3.0], atol=1e-5)
    pts = jnp.asarray([[1.0, 2.0, 1.0], [1.0, 2.0, 2.5], [10, 10, 1]])
    inside = np.asarray(B.points_in_rbbox(pts, box))
    assert inside[:, 0].tolist() == [True, False, False]


def test_rotate_points_with_boxes(rng):
    boxes = np.zeros((4, 7), np.float32)
    boxes[:, :3] = rng.uniform(-5, 5, (4, 3))
    boxes[:, 3:6] = 1.0
    pts = rng.uniform(-5, 5, (10, 3)).astype(np.float32)
    rb, rp = B.rotate(jnp.asarray(boxes), np.pi / 2, jnp.asarray(pts))
    # distances from origin preserved
    assert np.allclose(np.linalg.norm(np.asarray(rp)[:, :2], axis=1),
                       np.linalg.norm(pts[:, :2], axis=1), atol=1e-4)
    assert np.allclose(np.asarray(rb)[:, 6] - boxes[:, 6], np.pi / 2)


def test_flip_boxes():
    boxes = jnp.asarray([[1.0, 2.0, 0.0, 2.0, 4.0, 2.0, 0.3]])
    h = np.asarray(B.flip(boxes, 'horizontal'))
    assert h[0, 1] == -2.0 and abs(h[0, 6] + 0.3) < 1e-6
    v = np.asarray(B.flip(boxes, 'vertical'))
    assert v[0, 0] == -1.0


# ---------------------------------------------------------------------------
# gaussian heatmap utils
# ---------------------------------------------------------------------------

def test_gaussian_radius_cornernet_values():
    # CornerNet quadratic formula golden value: 10x10 box, overlap 0.5
    # reference formula (gaussian.py:60-85, min of the three CornerNet
    # roots incl. its well-known /2-instead-of-/2a quirk) gives 4.1421
    r = float(gaussian_radius((10.0, 10.0), min_overlap=0.5))
    assert abs(r - 4.1421) < 0.01, r


def test_render_gaussian_peak_and_symmetry():
    hm = np.asarray(render_gaussian(jnp.asarray([8, 8]), jnp.asarray(3),
                                    (16, 16)))
    assert hm[8, 8] == pytest.approx(1.0)
    assert hm[8, 10] == pytest.approx(hm[8, 6])
    assert hm[5, 8] == pytest.approx(hm[11, 8])


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_anchor_generator_grid():
    gen = Anchor3DRangeGenerator(
        ranges=[[0, -40, -1.78, 70.4, 40, -1.78]],
        sizes=[[1.6, 3.9, 1.56]], rotations=[0, np.pi / 2])
    anchors = np.asarray(gen.grid_anchors((2, 4)))
    # feature map 2x4, 1 size, 2 rotations
    assert anchors.reshape(-1, 7).shape[0] == 2 * 4 * 2
    flat = anchors.reshape(-1, 7)
    assert flat[:, 0].min() >= 0 and flat[:, 0].max() <= 70.4
    assert np.allclose(np.unique(flat[:, 6]), [0, np.pi / 2])


def test_partial_bin_coder_round_trip(rng):
    """Encode -> decode identity for PartialBinBasedBBoxCoder
    (reference partial_bin_based_bbox_coder.py:27-99)."""
    import jax.numpy as jnp
    from msmdfusion_tpu.core.coders import PartialBinBasedBBoxCoder
    mean_sizes = [[2.0, 2.0, 2.0], [4.0, 1.8, 1.6], [0.8, 0.8, 1.7]]
    coder = PartialBinBasedBBoxCoder(num_dir_bins=12, num_sizes=3,
                                     mean_sizes=mean_sizes)
    n = 10
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi + 0.01, np.pi - 0.01, n)
    labels = rng.randint(0, 3, n)
    center, size_class, size_res, dir_class, dir_res = coder.encode(
        jnp.asarray(boxes), jnp.asarray(labels))
    # rebuild one-hot prediction dict and decode
    out = dict(
        center=jnp.asarray(center)[None],
        dir_class=jax.nn.one_hot(dir_class, 12)[None],
        dir_res=jnp.tile(jnp.asarray(dir_res)[:, None], (1, 12))[None],
        size_class=jax.nn.one_hot(size_class, 3)[None],
        size_res=jnp.tile(jnp.asarray(size_res)[:, None, :], (1, 3, 1))[None])
    dec = np.asarray(coder.decode(out))[0]
    np.testing.assert_allclose(dec[:, :2], boxes[:, :2], atol=1e-4)
    np.testing.assert_allclose(dec[:, 2], boxes[:, 2] + boxes[:, 5] / 2,
                               atol=1e-4)
    np.testing.assert_allclose(dec[:, 3:6], boxes[:, 3:6], atol=1e-4)
    dyaw = (dec[:, 6] - boxes[:, 6]) / (2 * np.pi)
    np.testing.assert_allclose(dyaw, np.round(dyaw), atol=1e-4)


def test_anchor_free_coder_round_trip_and_split(rng):
    import jax.numpy as jnp
    from msmdfusion_tpu.core.coders import AnchorFreeBBoxCoder
    coder = AnchorFreeBBoxCoder(num_dir_bins=12)
    n = 8
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi + 0.01, np.pi - 0.01, n)
    center, size_res, dir_class, dir_res = coder.encode(
        jnp.asarray(boxes), jnp.zeros(n, jnp.int32))
    out = dict(
        center=jnp.asarray(center)[None],
        size=jnp.asarray(size_res)[None],
        dir_class=jax.nn.one_hot(dir_class, 12)[None],
        dir_res=jnp.tile(
            (jnp.asarray(dir_res) * (2 * np.pi / 12))[:, None], (1, 12))[None])
    dec = np.asarray(coder.decode(out))[0]
    np.testing.assert_allclose(dec[:, 3:6], boxes[:, 3:6], atol=1e-4)
    dyaw = (dec[:, 6] - boxes[:, 6]) / (2 * np.pi)
    np.testing.assert_allclose(dyaw, np.round(dyaw), atol=1e-4)
    # split_pred layout: 3 center + 3 size + 12 + 12 dir channels
    reg = jnp.asarray(rng.randn(2, 3 + 3 + 24, 5).astype(np.float32))
    cls = jnp.asarray(rng.randn(2, 1, 5).astype(np.float32))
    base = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    res = coder.split_pred(cls, reg, base)
    assert res['center'].shape == (2, 5, 3)
    assert res['dir_res'].shape == (2, 5, 12)


def test_iou_neg_piecewise_sampler(rng):
    """Piece-wise negative sampling semantics
    (reference iou_neg_piecewise_sampler.py:56-97)."""
    from msmdfusion_tpu.core.samplers import IoUNegPiecewiseSampler
    sampler = IoUNegPiecewiseSampler(
        num=128, pos_fraction=0.5,
        neg_piece_fractions=[0.8, 0.2],
        neg_iou_piece_thrs=[0.55, 0.1],
        return_iou=True)
    n = 1000
    gt_inds = np.zeros(n, np.int64)
    gt_inds[:40] = rng.randint(1, 5, 40)        # 40 positives
    ovl = rng.uniform(0, 0.54, n)
    res = sampler.sample(gt_inds, ovl, rng)
    assert len(res.pos_inds) == 40               # fewer than 64 expected
    assert len(res.neg_inds) == 128 - 40
    # ~80% of negatives from the high-IoU piece [0.1, 0.55)
    high = (ovl[res.neg_inds] >= 0.1).sum()
    assert high >= int(88 * 0.8) - 1
    assert res.iou is not None and len(res.iou) == 128
    # positives map back to 0-based gt indices
    assert (res.pos_assigned_gt_inds >= 0).all()
    # shortfall roll-over: almost no high-IoU negatives available
    ovl2 = rng.uniform(0, 0.09, n)               # all in the last piece
    res2 = sampler.sample(gt_inds, ovl2, rng)
    assert len(res2.neg_inds) == 88              # still filled from piece 2


def test_pseudo_sampler_keeps_all(rng):
    from msmdfusion_tpu.core.samplers import PseudoSampler
    gt_inds = np.array([0, 2, 0, 1, -1])
    res = PseudoSampler().sample(gt_inds, np.zeros(5))
    assert res.pos_inds.tolist() == [1, 3]
    assert res.neg_inds.tolist() == [0, 2]
    assert res.pos_assigned_gt_inds.tolist() == [1, 0]
