"""VoteNet forward/loss/decode smoke test."""
import numpy as np
import jax
import jax.numpy as jnp

from msmdfusion_tpu.models.detectors import VoteNet


def test_votenet_forward_loss_decode(rng):
    model = VoteNet(
        backbone=dict(type='PointNet2SASSG', in_channels=4,
                      num_points=(64, 32), radius=(0.4, 0.8),
                      num_samples=(8, 8), sa_channels=((16, 16), (16, 32)),
                      fp_channels=((32, 16),)),
        bbox_head=dict(
            type='VoteHead', num_classes=4, in_channels=16,
            num_proposals=16, num_dir_bins=6,
            mean_sizes=[[0.5, 0.5, 0.5]] * 4,
            aggregation_radius=0.5, aggregation_samples=8),
        train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6),
        test_cfg=dict(score_thr=0.05))
    pts = jnp.asarray(rng.uniform(-2, 2, (2, 256, 4)).astype(np.float32))
    mask = jnp.ones((2, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    preds = model.apply(variables, pts, mask)
    assert preds['center'].shape == (2, 16, 3)
    assert preds['obj_scores'].shape == (2, 16, 2)

    res = model.apply(variables, preds, method=VoteNet.get_bboxes)
    assert res['bboxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(res['bboxes'])).all()

    g = 3
    gt = np.zeros((2, g, 9), np.float32)
    gt[..., :3] = rng.uniform(-1.5, 1.5, (2, g, 3))
    gt[..., 3:6] = 0.5
    labels = rng.randint(0, 4, (2, g)).astype(np.int32)
    valid = np.ones((2, g), bool)
    losses = model.apply(variables, preds, jnp.asarray(gt),
                         jnp.asarray(labels), jnp.asarray(valid),
                         method=VoteNet.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_aug_test_detector_merges_flipped_views(rng):
    """Base3DDetector.aug_test routing: flipped-view detections un-flip and
    merge to the original-frame result (reference base.py:14-43)."""
    import jax.numpy as jnp
    from msmdfusion_tpu.models.detectors.mvx_two_stage import \
        aug_test_detector

    class FakeModel:
        """simple_test echoes stored per-view detections."""
        calls = []

        def apply(self, variables, points, mask, method=None):
            i = len(FakeModel.calls)
            FakeModel.calls.append(i)
            box = np.zeros((1, 1, 9), np.float32)
            # view 0: identity; view 1: horizontally flipped frame
            box[0, 0] = [1.0, (-2.0 if i else 2.0), 0, 1, 1, 1,
                         (-0.5 if i else 0.5), 0.1, (-0.2 if i else 0.2)]
            return dict(bboxes=jnp.asarray(box),
                        scores=jnp.asarray([[0.9 - 0.1 * i]]),
                        labels=jnp.asarray([[1]]),
                        valid=jnp.asarray([[True]]))

        def simple_test(self):
            pass

    model = FakeModel()
    FakeModel.calls = []
    views = [dict(points=None, points_mask=None, aug={}),
             dict(points=None, points_mask=None, aug={'flip_h': True})]
    merged = aug_test_detector(model, {}, views)
    # both views describe the SAME physical box -> circle NMS keeps one
    assert len(merged['scores']) == 1
    np.testing.assert_allclose(merged['bboxes'][0][:3], [1.0, 2.0, 0],
                               atol=1e-5)
    np.testing.assert_allclose(merged['bboxes'][0][6], 0.5, atol=1e-5)


def test_mvx_two_stage_registered():
    from msmdfusion_tpu.registry import DETECTORS
    assert 'MVXTwoStageDetector' in DETECTORS._registry or \
        DETECTORS.get('MVXTwoStageDetector') is not None
