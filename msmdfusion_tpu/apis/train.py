"""Training loop: optax AdamW + warmup/step/cyclic LR + freezing masks +
data-parallel mesh.

TPU-native re-design of the reference training stack (tools/train.py:98-283 +
the external mmcv EpochBasedRunner):
- optimizer/lr_config/grad_clip config keys keep reference semantics
  (AdamW, linear warmup + step decay or cyclic one-cycle, global-norm clip);
- ``freeze_lidar_components`` / ``freeze_img`` (tools/train.py:185-246,
  MSMDFusion.py:134-144) become optax ``masked`` zero-updates over param
  subtrees — the functional equivalent of requires_grad=False;
- DDP + NCCL allreduce (SURVEY §2.7) becomes a 1-axis ``Mesh`` with
  batch-sharded inputs and replicated params: XLA inserts the gradient
  psum automatically, and BatchNorm moments computed with jnp.mean are
  global (sync-BN for free, replacing ops/norm.py NaiveSyncBatchNorm).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


def build_lr_schedule(lr_config: Dict[str, Any], base_lr: float,
                      total_steps: int, steps_per_epoch: int):
    """LR schedules with mmcv semantics (lr_config dicts)."""
    policy = lr_config.get('policy', 'step')
    if policy == 'step':
        boundaries = {
            int(e * steps_per_epoch): 0.1
            for e in lr_config.get('step', [])}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif policy == 'cyclic':
        up_ratio, down_target = lr_config.get('target_ratio', (10, 1e-4))
        up_steps = int(total_steps * lr_config.get('step_ratio_up', 0.4))
        sched = optax.join_schedules([
            optax.linear_schedule(base_lr, base_lr * up_ratio, up_steps),
            optax.cosine_decay_schedule(base_lr * up_ratio,
                                        max(total_steps - up_steps, 1),
                                        alpha=down_target),
        ], [up_steps])
    else:
        raise ValueError(policy)

    warmup = lr_config.get('warmup')
    if warmup == 'linear':
        w_iters = lr_config.get('warmup_iters', 500)
        w_ratio = lr_config.get('warmup_ratio', 1.0 / 3)

        def with_warmup(step):
            base = sched(step)
            frac = jnp.minimum(step / w_iters, 1.0)
            scale = w_ratio + (1 - w_ratio) * frac
            return base * jnp.where(step < w_iters, scale, 1.0)
        return with_warmup
    return sched


def freeze_mask(params, predicates) -> Any:
    """Label pytree leaves 'frozen' if any predicate matches their path.

    predicates: list of substrings; a param whose '/'-joined path contains
    one is frozen (reference freeze_lidar_components matches module name
    prefixes, tools/train.py:185-219).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path, _):
        path_str = '/'.join(str(getattr(k, 'key', k)) for k in path)
        return 'frozen' if any(p in path_str for p in predicates) \
            else 'trainable'
    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(optimizer_cfg: Dict[str, Any],
                    optimizer_config: Optional[Dict[str, Any]],
                    lr_schedule,
                    params=None,
                    frozen_predicates=()) -> optax.GradientTransformation:
    """AdamW with weight-decay masks + grad clip + param freezing."""
    wd = optimizer_cfg.get('weight_decay', 0.01)
    betas = optimizer_cfg.get('betas', (0.9, 0.999))

    # no weight decay on norm/bias params (reference paramwise_cfg
    # custom_keys 'norm' decay_mult=0)
    def decay_mask(p):
        def label(path, leaf):
            path_str = '/'.join(
                str(getattr(k, 'key', k)) for k in path).lower()
            if ('bn' in path_str or 'norm' in path_str or
                    path_str.endswith('bias') or leaf.ndim <= 1):
                return False
            return True
        return jax.tree_util.tree_map_with_path(label, p)

    chain = []
    if optimizer_config and optimizer_config.get('grad_clip'):
        chain.append(optax.clip_by_global_norm(
            optimizer_config['grad_clip']['max_norm']))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    tx = optax.chain(*chain)

    if frozen_predicates and params is not None:
        labels = freeze_mask(params, frozen_predicates)
        tx = optax.multi_transform(
            {'trainable': tx, 'frozen': optax.set_to_zero()}, labels)
    return tx


class TrainState:
    """Minimal functional train state (params + batch_stats + opt state)."""

    def __init__(self, params, batch_stats, opt_state, step=0):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.step = step

    def as_tuple(self):
        return (self.params, self.batch_stats, self.opt_state, self.step)


def make_train_step(model, tx, loss_keys=None, rng_key=None,
                    frozen_predicates=()):
    """Build a jittable train_step(params, batch_stats, opt_state, batch).

    The returned function computes the summed loss dict, applies gradients,
    and returns (new_params, new_batch_stats, new_opt_state, metrics).

    frozen_predicates: BN running stats of matching subtrees are NOT
    updated — the reference freezes BN statistics alongside the params when
    fine-tuning (tools/train.py:185-219 puts frozen modules in eval mode),
    so a loaded stage-1 checkpoint's stats must not drift.
    """

    def _keep_frozen_stats(old_stats, new_stats):
        if not frozen_predicates:
            return new_stats

        def select(path, new_leaf):
            path_str = '/'.join(str(getattr(k, 'key', k)) for k in path)
            if any(p in path_str for p in frozen_predicates):
                node = old_stats
                for k in path:
                    node = node[getattr(k, 'key', k)]
                return node
            return new_leaf
        return jax.tree_util.tree_map_with_path(select, new_stats)

    def train_step(params, batch_stats, opt_state, batch, step):
        def loss_fn(p):
            variables = {'params': p, 'batch_stats': batch_stats}
            rngs = ({'dropout': jax.random.fold_in(rng_key, step)}
                    if rng_key is not None else None)
            preds, mutated = model.apply(
                variables, *batch['inputs'], train=True,
                mutable=['batch_stats'], rngs=rngs)
            losses = model.apply(
                {'params': p, 'batch_stats': batch_stats}, preds,
                batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'],
                method=type(model).loss)
            total = sum(v for k, v in losses.items()
                        if k.startswith('loss') or '_loss' in k
                        or k.endswith('loss') or 'loss' in k)
            return total, (losses, mutated['batch_stats'])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_bs = _keep_frozen_stats(batch_stats, new_bs)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics['total_loss'] = total
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_params, new_bs, new_opt, metrics

    return train_step
