"""Detection losses (functional JAX).

TPU-native equivalents of the mmdet losses the reference builds from config
(FocalLoss, GaussianFocalLoss, L1Loss, SmoothL1Loss, CrossEntropyLoss) plus
mmdet3d's clip_sigmoid. All are elementwise; reduction/averaging is done by
the caller to mirror the reference's ``avg_factor`` semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_sigmoid(x, eps: float = 1e-4):
    """mmdet3d/models/utils clip_sigmoid."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


def sigmoid_focal_loss(logits, labels, num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25):
    """Per-sample focal loss, mmdet semantics.

    Args:
        logits: [N, C].
        labels: [N] int in [0, C] where C = background.
    Returns:
        [N] loss (summed over classes).
    """
    prob = jax.nn.sigmoid(logits)
    one_hot = jax.nn.one_hot(labels, num_classes)  # background -> all-zero row
    pt = jnp.where(one_hot > 0, 1 - prob, prob)
    focal_weight = jnp.where(one_hot > 0, alpha, 1 - alpha) * pt ** gamma
    ce = jnp.maximum(logits, 0) - logits * one_hot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(ce * focal_weight, axis=-1)


def gaussian_focal_loss(pred, gaussian_target, alpha: float = 2.0,
                        gamma: float = 4.0):
    """CornerNet-style focal on gaussian heatmaps (mmdet GaussianFocalLoss).

    pred must already be a clipped sigmoid.
    """
    eps = 1e-12
    pos_weights = (gaussian_target == 1).astype(pred.dtype)
    neg_weights = (1 - gaussian_target) ** gamma
    pos_loss = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos_weights
    neg_loss = -jnp.log(1 - pred + eps) * pred ** alpha * neg_weights * \
        (1 - pos_weights)
    return pos_loss + neg_loss


def l1_loss(pred, target):
    return jnp.abs(pred - target)


def smooth_l1_loss(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def binary_cross_entropy(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def cross_entropy(logits, labels, num_classes: int):
    """[N, C] logits vs [N] int labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def chamfer_distance(src, dst, src_valid=None, dst_valid=None,
                     criterion: str = 'l2'):
    """Bidirectional chamfer distance between masked point sets.

    TPU-native equivalent of mmdet3d/models/losses/chamfer_distance.py:146.
    src [N, D], dst [M, D]. Returns (loss_src [N], loss_dst [M]).
    """
    d = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    if criterion == 'l1':
        d = jnp.sqrt(jnp.maximum(d, 1e-12))
    if dst_valid is not None:
        d = jnp.where(dst_valid[None, :], d, 1e10)
    loss_src = jnp.min(d, axis=1)
    d2 = d if src_valid is None else jnp.where(src_valid[:, None], d, 1e10)
    loss_dst = jnp.min(d2, axis=0)
    if src_valid is not None:
        loss_src = jnp.where(src_valid, loss_src, 0)
    if dst_valid is not None:
        loss_dst = jnp.where(dst_valid, loss_dst, 0)
    return loss_src, loss_dst


def axis_aligned_iou_loss(pred, target):
    """1 - IoU of axis-aligned boxes (x1y1z1x2y2z2).

    TPU-native equivalent of mmdet3d/models/losses/axis_aligned_iou_loss.py.
    """
    lo = jnp.maximum(pred[..., :3], target[..., :3])
    hi = jnp.minimum(pred[..., 3:], target[..., 3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0), axis=-1)
    vol_p = jnp.prod(jnp.maximum(pred[..., 3:] - pred[..., :3], 0), axis=-1)
    vol_t = jnp.prod(jnp.maximum(target[..., 3:] - target[..., :3], 0),
                     axis=-1)
    union = vol_p + vol_t - inter
    return 1.0 - inter / jnp.maximum(union, 1e-8)
