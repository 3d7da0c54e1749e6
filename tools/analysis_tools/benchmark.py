#!/usr/bin/env python
"""Inference FPS benchmark CLI.

TPU-native equivalent of the reference tools/analysis_tools/benchmark.py
(warmup + synced timing over a dataset): measures E2E frames/sec of any
config on synthetic or real data.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--samples', type=int, default=50)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--num-points', type=int, default=200000)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.config import load_config
    from msmdfusion_tpu.models.builder import build_detector
    import msmdfusion_tpu.models  # noqa: F401

    cfg = load_config(args.config)
    model = build_detector(cfg.model)
    pcr = cfg.model.pts_voxel_layer.point_cloud_range
    rng = np.random.RandomState(0)
    n = args.num_points
    pts = np.concatenate([
        rng.uniform(pcr[0], pcr[3], (1, n, 1)),
        rng.uniform(pcr[1], pcr[4], (1, n, 1)),
        rng.uniform(pcr[2], pcr[5], (1, n, 1)),
        rng.uniform(0, 1, (1, n, 2))], axis=-1).astype(np.float32)
    mask = np.ones((1, n), bool)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(pts), jnp.asarray(mask))

    @jax.jit
    def infer(p, m):
        preds = model.apply(variables, p, m, train=False)
        return model.apply(variables, preds, method=type(model).get_bboxes)

    pj, mj = jnp.asarray(pts), jnp.asarray(mask)
    for _ in range(args.warmup):
        jax.block_until_ready(infer(pj, mj))
    times = []
    for i in range(args.samples):
        t0 = time.perf_counter()
        jax.block_until_ready(infer(pj, mj))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    print(f'fps (median): {1.0 / np.median(arr):.2f}')
    print(f'fps (best):   {1.0 / arr.min():.2f}')
    print(f'latency ms: min {arr.min()*1e3:.1f} '
          f'median {np.median(arr)*1e3:.1f} max {arr.max()*1e3:.1f}')


if __name__ == '__main__':
    main()
