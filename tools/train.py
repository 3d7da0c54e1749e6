#!/usr/bin/env python
"""Training CLI.

TPU-native re-design of the reference tools/train.py:98-283: config load ->
build detector -> optional component freezing (freeze_lidar_components /
freeze_img) -> dataset -> data-parallel jitted train loop with warmup LR,
grad clip, per-interval logging and per-epoch orbax checkpoints.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msmdfusion_tpu.config import load_config, parse_cli_overrides
from msmdfusion_tpu.registry import DATASETS
import msmdfusion_tpu.models  # noqa: F401 populate registries
from msmdfusion_tpu.models.builder import build_detector
from msmdfusion_tpu.apis.train import (build_lr_schedule, build_optimizer,
                                       make_train_step)
from msmdfusion_tpu.datasets.loader import DataLoader
from msmdfusion_tpu.parallel import (data_parallel_mesh, replicate,
                                     shard_batch)
from msmdfusion_tpu.utils.checkpoint import (latest_checkpoint,
                                             load_checkpoint,
                                             save_checkpoint)

FROZEN_LIDAR_PREFIXES = ('voxel_encoder', 'middle_encoder')
FROZEN_IMG_PREFIXES = ('backbone_img', 'neck_img')


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--load-from', default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--max-steps', type=int, default=None,
                   help='cap total steps (debug)')
    p.add_argument('--cfg-options', nargs='+', default=[])
    p.add_argument('--launcher', default='none',
                   choices=['none', 'tpu', 'manual'],
                   help='multi-host launcher (jax.distributed.initialize; '
                        'reference --launcher pytorch/slurm)')
    p.add_argument('--no-validate', action='store_true',
                   help='skip the in-training EvalHook (reference '
                        'tools/train.py --no-validate)')
    return p.parse_args()


def get_logger(work_dir):
    os.makedirs(work_dir, exist_ok=True)
    logger = logging.getLogger('msmdfusion_tpu')
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter('%(asctime)s - %(levelname)s - %(message)s')
    for handler in (logging.StreamHandler(),
                    logging.FileHandler(os.path.join(work_dir, 'train.log'))):
        handler.setFormatter(fmt)
        logger.addHandler(handler)
    return logger


def build_batch_inputs(model_type, batch):
    """Map a collated host batch to the model's positional inputs."""
    if model_type == 'MSMDFusionDetector':
        return (batch['points'], batch['points_mask'], batch['img'],
                batch['foreground'])
    return (batch['points'], batch['points_mask'])


def main():
    args = parse_args()
    from msmdfusion_tpu.parallel import init_dist
    init_dist(args.launcher)
    cfg = load_config(args.config, parse_cli_overrides(args.cfg_options))
    work_dir = args.work_dir or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    logger = get_logger(work_dir)
    logger.info(f'devices: {jax.devices()}')

    model = build_detector(cfg.model)
    dataset = DATASETS.build(dict(cfg.data.train))
    loader = DataLoader(dataset, cfg.data.samples_per_gpu,
                        num_workers=cfg.data.get('workers_per_gpu', 4),
                        seed=args.seed)
    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * cfg.total_epochs
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)

    # init params from one host batch
    rng = jax.random.PRNGKey(args.seed)
    first = next(iter(loader))
    inputs = build_batch_inputs(cfg.model.type, first)
    variables = model.init(rng, *jax.tree_util.tree_map(jnp.asarray, inputs))
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    logger.info('params: %.2fM' % (sum(
        x.size for x in jax.tree_util.tree_leaves(params)) / 1e6))

    frozen = []
    if cfg.get('freeze_lidar_components'):
        frozen += list(FROZEN_LIDAR_PREFIXES)
    if cfg.model.get('freeze_img'):
        frozen += list(FROZEN_IMG_PREFIXES)
    lr_sched = build_lr_schedule(dict(cfg.lr_config), cfg.optimizer.lr,
                                 total_steps, steps_per_epoch)
    tx = build_optimizer(dict(cfg.optimizer), dict(cfg.optimizer_config),
                         lr_sched, params=params, frozen_predicates=frozen)
    opt_state = tx.init(params)
    start_step = 0

    resume = args.resume_from or latest_checkpoint(work_dir)
    if resume:
        state = load_checkpoint(resume)
        params, batch_stats = state['params'], state['batch_stats']
        opt_state = state.get('opt_state', opt_state)
        start_step = int(state.get('step', 0))
        logger.info(f'resumed from {resume} at step {start_step}')
    elif args.load_from:
        state = load_checkpoint(args.load_from)
        params, batch_stats = state['params'], state['batch_stats']
        logger.info(f'loaded weights from {args.load_from}')

    mesh = data_parallel_mesh()
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    train_step = jax.jit(make_train_step(model, tx, rng_key=rng,
                                         frozen_predicates=tuple(frozen)))

    # observability: line-JSON scalar log (mmcv TextLoggerHook format) +
    # per-epoch EvalHook (reference `evaluation = dict(interval=1)`)
    from msmdfusion_tpu.apis.inference import make_batch_infer
    from msmdfusion_tpu.utils.log_hooks import EvalHook, JsonLogWriter
    writers = [JsonLogWriter(work_dir)]
    # reference log_config.hooks includes TensorboardLoggerHook
    # (configs/MSMDFusion_nusc_voxel_LC.py:296-299); emit real TB event
    # files when configured (utils/tb_writer.py, dependency-free)
    if any(dict(h).get('type') == 'TensorboardLoggerHook'
           for h in cfg.get('log_config', {}).get('hooks', [])):
        # exactly ONE writer even if the hook is listed twice: duplicate
        # writers collide on the second-resolution event filename
        from msmdfusion_tpu.utils.tb_writer import TensorboardEventWriter
        writers.append(TensorboardEventWriter(
            os.path.join(work_dir, 'tf_logs')))

    class _FanOut:
        def write(self, *a, **kw):
            for w in writers:
                w.write(*a, **kw)

    json_log = _FanOut()
    eval_hook = None
    eval_cfg = dict(cfg.get('evaluation', {}))
    if not args.no_validate and eval_cfg and 'val' in cfg.data:
        val_ds = DATASETS.build(dict(cfg.data.val))
        batch_infer = make_batch_infer(model, cfg.model.type)
        eval_hook = EvalHook(val_ds, None,
                             interval=eval_cfg.get('interval', 1),
                             max_samples=eval_cfg.get('max_samples'))
        logger.info(f'EvalHook: {len(val_ds)} val samples every '
                    f'{eval_hook.interval} epoch(s)')

    step = start_step
    log_interval = cfg.get('log_config', {}).get('interval', 50)
    t0 = time.time()
    # on resume, continue from the right epoch with the same per-epoch
    # shuffle a fresh run would have used (DistributedSampler.set_epoch
    # semantics) instead of replaying from epoch 0
    start_epoch = min(start_step // max(steps_per_epoch, 1),
                      cfg.total_epochs)
    for epoch in range(start_epoch, cfg.total_epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            if step >= total_steps:
                break
            device_batch = {
                'inputs': shard_batch(mesh, build_batch_inputs(
                    cfg.model.type, batch)),
                'gt_bboxes': shard_batch(mesh, batch['gt_bboxes_3d']),
                'gt_labels': shard_batch(
                    mesh, batch['gt_labels_3d'].astype(np.int32)),
                'gt_valid': shard_batch(mesh, batch['gt_valid']),
            }
            params, batch_stats, opt_state, metrics = train_step(
                params, batch_stats, opt_state, device_batch, step)
            step += 1
            if step % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                rate = log_interval * cfg.data.samples_per_gpu * \
                    len(jax.devices()) / (time.time() - t0)
                t0 = time.time()
                logger.info(
                    f'epoch {epoch} step {step}/{total_steps} '
                    f'{rate:.1f} samples/s ' +
                    ' '.join(f'{k}={v:.4f}' for k, v in metrics.items()))
                json_log.write('train', epoch, step, metrics,
                               lr=float(lr_sched(step)),
                               samples_per_s=round(rate, 2))
        ckpt = save_checkpoint(
            work_dir, step, jax.device_get(params),
            jax.device_get(batch_stats), jax.device_get(opt_state),
            meta={'epoch': epoch, 'config': args.config})
        logger.info(f'saved {ckpt}')
        if eval_hook is not None and eval_hook.should_run(epoch):
            variables = {'params': params}
            if batch_stats:
                variables['batch_stats'] = batch_stats
            val_metrics = eval_hook.run(
                lambda b: batch_infer(variables, b))
            logger.info('val: ' + ' '.join(
                f'{k}={v:.4f}' for k, v in val_metrics.items()))
            json_log.write('val', epoch, step, val_metrics)
        if step >= total_steps:
            break


if __name__ == '__main__':
    main()
