"""SSD3DNet + H3DNet forward/loss/decode (real heads, not aliases).

Reference coverage: ssd3d_head.py:572 (F-FPS candidates, centerness,
corner loss) and primitive_head.py:967 + h3d_bbox_head.py:932.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.builder import build_detector
from msmdfusion_tpu.models.heads.h3d_heads import box_primitives
import msmdfusion_tpu.models  # noqa: F401


def _points(rng, b=1, n=256):
    pts = np.concatenate([
        rng.uniform(-4, 4, (b, n, 3)),
        rng.uniform(0, 1, (b, n, 1))], axis=-1).astype(np.float32)
    return jnp.asarray(pts), jnp.ones((b, n), bool)


def _gt(rng, b=1, g=4):
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(-3, 3, (b, g, 2))
    boxes[..., 2] = -0.5
    boxes[..., 3:6] = rng.uniform(0.5, 1.5, (b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    labels = rng.randint(0, 3, (b, g)).astype(np.int32)
    return (jnp.asarray(boxes), jnp.asarray(labels),
            jnp.ones((b, g), bool))


def test_box_primitives_geometry():
    box = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, 0.0]])
    z = np.asarray(box_primitives(box, 'z'))[0]
    assert z.shape == (2, 3)
    # gravity center at z=1; top/bottom faces at 2 and 0
    assert sorted(z[:, 2].tolist()) == [0.0, 2.0]
    xy = np.asarray(box_primitives(box, 'xy'))[0]
    assert xy.shape == (4, 3)
    assert np.allclose(sorted(np.abs(xy[:, 0]).tolist()), [0, 0, 1, 1])
    assert np.allclose(sorted(np.abs(xy[:, 1]).tolist()), [0, 0, 2, 2])
    line = np.asarray(box_primitives(box, 'line'))[0]
    assert line.shape == (12, 3)
    # yaw rotation moves the face centers
    rot = np.asarray(box_primitives(
        box.at[0, 6].set(np.pi / 2), 'xy'))[0]
    assert np.allclose(sorted(np.abs(rot[:, 0]).tolist()), [0, 0, 2, 2],
                       atol=1e-5)


@pytest.mark.slow
def test_ssd3dnet_forward_loss_decode(rng):
    cfg = dict(
        type='SSD3DNet',
        backbone=dict(
            type='PointNet2SAMSG', in_channels=4, num_points=(64, 32),
            radii=((0.5, 1.0), (1.0, 2.0)), num_samples=((8, 8), (8, 8)),
            sa_channels=(((8, 16), (8, 16)), ((16, 32), (16, 32)))),
        bbox_head=dict(
            type='SSD3DHead', num_classes=3, in_channels=64,
            num_candidates=16, num_dir_bins=12, aggregation_radius=2.0,
            aggregation_samples=8),
        train_cfg=dict(), test_cfg=dict())
    model = build_detector(cfg)
    pts, mask = _points(rng)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    preds = model.apply(variables, pts, mask)
    assert preds['cls_scores'].shape == (1, 16, 3)
    assert preds['center'].shape == (1, 16, 3)

    gtb, gtl, gtv = _gt(rng)
    losses = model.apply(variables, preds, gtb, gtl, gtv,
                         method=type(model).loss)
    for k in ('centerness_loss', 'center_loss', 'corner_loss',
              'dir_class_loss', 'vote_loss'):
        assert np.isfinite(float(losses[k])), k

    out = model.apply(variables, preds, method=type(model).get_bboxes)
    assert out['bboxes'].shape == (1, 16, 7)
    assert np.all(np.asarray(out['bboxes'][..., 3:6]) > 0)

    # gradients flow (the F-FPS indices are non-differentiable gathers)
    def loss_fn(p):
        pr = model.apply({'params': p, **{k: v for k, v in variables.items()
                                          if k != 'params'}}, pts, mask,
                         train=True, mutable=['batch_stats'])[0]
        losses = model.apply(variables, pr, gtb, gtl, gtv,
                             method=type(model).loss)
        return sum(jax.tree_util.tree_leaves(losses))
    grads = jax.grad(loss_fn)(variables['params'])
    gn = sum(float(jnp.abs(g).sum()) for g in
             jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.slow
def test_h3dnet_forward_loss_decode(rng):
    cfg = dict(
        type='H3DNet',
        backbone=dict(
            type='PointNet2SASSG', in_channels=4, num_points=(64, 32),
            radius=(0.5, 1.0), num_samples=(8, 8),
            sa_channels=((16, 16), (16, 32)), fp_channels=((32, 32),)),
        bbox_head=dict(
            type='VoteHead', num_classes=3, in_channels=32,
            num_proposals=8, num_dir_bins=6,
            mean_sizes=[[1, 1, 1]] * 3, aggregation_radius=1.0,
            aggregation_samples=8),
        primitive_list=[
            dict(type='PrimitiveHead', primitive_mode=m, in_channels=32)
            for m in ('z', 'xy', 'line')],
        refine_head=dict(type='H3DBboxHead', in_channels=32, num_classes=3,
                         radius=0.5, num_samples=4),
        train_cfg=dict(), test_cfg=dict())
    model = build_detector(cfg)
    pts, mask = _points(rng)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    preds = model.apply(variables, pts, mask)
    assert 'z_flag' in preds['primitives']
    assert 'line_centers' in preds['primitives']
    assert preds['refine']['refined_bboxes'].shape[-1] == 7

    gtb, gtl, gtv = _gt(rng)
    losses = model.apply(variables, preds, gtb, gtl, gtv,
                         method=type(model).loss)
    for k in ('z_flag_loss', 'xy_center_loss', 'line_flag_loss',
              'refine_obj_loss', 'refine_reg_loss', 'vote_loss'):
        assert np.isfinite(float(losses[k])), k

    out = model.apply(variables, preds, method=type(model).get_bboxes)
    assert out['bboxes'].shape == (1, 8, 7)


@pytest.mark.slow
def test_imvotenet_vote_fusion_path(rng):
    """ImVoteNet with 2D detections: VoteFusion cues concatenate into the
    seed features (reference imvotenet.py + vote_fusion.py:12-212)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.detectors import ImVoteNet

    model = ImVoteNet(
        backbone=dict(type='PointNet2SASSG', in_channels=4,
                      num_points=(64, 32), radius=(0.4, 0.8),
                      num_samples=(8, 8), sa_channels=((16, 16), (16, 32)),
                      fp_channels=((32, 16),)),
        bbox_head=dict(
            type='VoteHead', num_classes=4, in_channels=16 + 128,
            num_proposals=16, num_dir_bins=6,
            mean_sizes=[[0.5, 0.5, 0.5]] * 4,
            aggregation_radius=0.5, aggregation_samples=8),
        train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6),
        test_cfg=dict(score_thr=0.05))
    b, n = 2, 256
    pts = jnp.asarray(rng.uniform(-2, 2, (b, n, 4)).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    img = jnp.asarray(rng.randint(0, 255, (b, 64, 96, 3)).astype(np.float32))
    nb = 5
    boxes2d = np.zeros((b, nb, 6), np.float32)
    boxes2d[..., :2] = rng.uniform(0, 60, (b, nb, 2))
    boxes2d[..., 2:4] = boxes2d[..., :2] + rng.uniform(10, 30, (b, nb, 2))
    boxes2d[..., 4] = rng.uniform(0.3, 0.9, (b, nb))
    boxes2d[..., 5] = rng.randint(0, 4, (b, nb))
    boxes2d[:, 0] = [0, 0, 96, 64, 0.9, 1]   # covers the whole image
    k_mat = np.tile(np.array(
        [[60.0, 0, 48, 0], [0, 60, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32)[None], (b, 1, 1))
    metas = dict(bboxes_2d=jnp.asarray(boxes2d),
                 bbox_valid=jnp.ones((b, nb), bool),
                 depth2img=jnp.asarray(k_mat))
    variables = model.init(jax.random.PRNGKey(0), pts, mask, img, metas)
    preds = model.apply(variables, pts, mask, img, metas)
    assert preds['center'].shape == (b, 16, 3)
    res = model.apply(variables, preds, method=ImVoteNet.get_bboxes)
    assert np.isfinite(np.asarray(res['bboxes'])).all()
    # cue path is live: zero-confidence boxes change the forward
    metas0 = dict(metas, bbox_valid=jnp.zeros((b, nb), bool))
    preds0 = model.apply(variables, pts, mask, img, metas0)
    assert np.abs(np.asarray(preds['obj_scores'])
                  - np.asarray(preds0['obj_scores'])).max() > 1e-6
