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
    p.add_argument('--launcher', default='none',
                   choices=['none', 'tpu', 'manual'],
                   help='multi-host launcher (reference --launcher pytorch/'
                        'slurm; here jax.distributed.initialize)')
    return p.parse_args()


from msmdfusion_tpu.apis.inference import (batch_model_inputs as
                                            build_infer_inputs,
                                            unpack_detections)


def main():
    args = parse_args()
    from msmdfusion_tpu.parallel import (collect_results, init_dist,
                                         merge_sharded_results,
                                         shard_indices)
    multi = init_dist(args.launcher)
    cfg = load_config(args.config, parse_cli_overrides(args.cfg_options))
    model = build_detector(cfg.model)
    dataset = DATASETS.build(dict(cfg.data.test))
    # rank-sharded evaluation (reference multi_gpu_test's
    # DistributedSampler; results are re-interleaved after the gather)
    indices = shard_indices(len(dataset)) if multi \
        else np.arange(len(dataset))
    shard = _IndexedView(dataset, indices)
    loader = DataLoader(shard, 1, shuffle=False, drop_last=False,
                        num_workers=cfg.data.get('workers_per_gpu', 4))

    if args.checkpoint:
        state = load_checkpoint(args.checkpoint)
        variables = {'params': state['params'],
                     'batch_stats': state['batch_stats']}
    else:
        print('WARNING: no checkpoint; random init')
        first = next(iter(loader))
        variables = model.init(jax.random.PRNGKey(0),
                               *build_infer_inputs(cfg.model.type, first))

    @jax.jit
    def infer(*inputs):
        preds = model.apply(variables, *inputs, train=False)
        return model.apply(variables, preds, method=type(model).get_bboxes)

    results = []
    t0 = time.time()
    for i, batch in enumerate(loader):
        if args.max_samples and i >= args.max_samples:
            break
        res = infer(*build_infer_inputs(cfg.model.type, batch))
        results.extend(unpack_detections(jax.device_get(res)))
        if (i + 1) % 50 == 0:
            print(f'{i + 1} samples, {(i + 1) / (time.time() - t0):.2f} fps')

    if multi:
        results = merge_sharded_results(collect_results(results),
                                        len(dataset))
        if jax.process_index() != 0:
            return

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
    if args.format_only:
        path = dataset.format_results(results)
        print(f'submission written to {path}')
    elif args.eval is not None:
        metrics = dataset.evaluate(results)
        print(metrics)


class _IndexedView:
    """Dataset view over a subset of indices (rank shard)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


if __name__ == '__main__':
    main()
