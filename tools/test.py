#!/usr/bin/env python
"""Evaluation / inference CLI.

TPU-native re-design of tools/test.py:101-219: dataloader -> jitted forward
+ decode -> masked fixed-size detections -> --out pickle / --format-only
submission / dataset.evaluate.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msmdfusion_tpu.config import load_config, parse_cli_overrides
from msmdfusion_tpu.registry import DATASETS
import msmdfusion_tpu.models  # noqa: F401
from msmdfusion_tpu.models.builder import build_detector
from msmdfusion_tpu.datasets.loader import DataLoader
from msmdfusion_tpu.utils.checkpoint import load_checkpoint


def parse_args():
    p = argparse.ArgumentParser(description='Test a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default=None, help='pickle output path')
    p.add_argument('--eval', nargs='*', default=None)
    p.add_argument('--format-only', action='store_true')
    p.add_argument('--max-samples', type=int, default=None)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def unpack_detections(res):
    """Masked fixed-size decode output -> per-sample variable-size numpy."""
    out = []
    bboxes = np.asarray(res['bboxes'])
    scores = np.asarray(res['scores'])
    labels = np.asarray(res['labels'])
    valid = np.asarray(res.get('valid', np.ones(scores.shape, bool)))
    for i in range(bboxes.shape[0]):
        m = valid[i]
        out.append(dict(bboxes=bboxes[i][m], scores=scores[i][m],
                        labels=labels[i][m]))
    return out


def main():
    args = parse_args()
    cfg = load_config(args.config, parse_cli_overrides(args.cfg_options))
    model = build_detector(cfg.model)
    dataset = DATASETS.build(dict(cfg.data.test))
    loader = DataLoader(dataset, 1, shuffle=False, drop_last=False,
                        num_workers=cfg.data.get('workers_per_gpu', 4))

    if args.checkpoint:
        state = load_checkpoint(args.checkpoint)
        variables = {'params': state['params'],
                     'batch_stats': state['batch_stats']}
    else:
        print('WARNING: no checkpoint; random init')
        first = next(iter(loader))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(first['points']),
                               jnp.asarray(first['points_mask']))

    @jax.jit
    def infer(points, points_mask):
        preds = model.apply(variables, points, points_mask, train=False)
        return model.apply(variables, preds, method=type(model).get_bboxes)

    results = []
    t0 = time.time()
    for i, batch in enumerate(loader):
        if args.max_samples and i >= args.max_samples:
            break
        res = infer(jnp.asarray(batch['points']),
                    jnp.asarray(batch['points_mask']))
        results.extend(unpack_detections(jax.device_get(res)))
        if (i + 1) % 50 == 0:
            print(f'{i + 1} samples, {(i + 1) / (time.time() - t0):.2f} fps')

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
    if args.format_only:
        path = dataset.format_results(results)
        print(f'submission written to {path}')
    elif args.eval is not None:
        metrics = dataset.evaluate(results)
        print(metrics)


if __name__ == '__main__':
    main()
