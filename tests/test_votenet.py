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
