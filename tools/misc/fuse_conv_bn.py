#!/usr/bin/env python
"""Fold frozen BatchNorm statistics into preceding conv kernels.

TPU-native equivalent of the reference tools/misc/fuse_conv_bn.py: walks the
variables tree, folds (scale, bias, mean, var) of each MaskedBatchNorm that
directly follows a Conv/Dense into that layer's kernel/bias, and neutralizes
the BN parameters (scale=1, bias=0, mean=0, var=1) so the layer becomes an
identity XLA folds away at compile time. Numerically identical inference,
fewer elementwise passes.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

CONV_KEYS = ('Conv_0', 'SubMConv3d_0', 'SparseConv3d_0', 'ConvTranspose_0',
             'Dense_0')
BN_KEYS = ('MaskedBatchNorm_0',)


def fuse_tree(params, stats, eps=1e-3):
    fused = 0
    for name, node in list(params.items()):
        if not isinstance(node, dict):
            continue
        conv_key = next((c for c in CONV_KEYS if c in node), None)
        bn_key = next((b for b in BN_KEYS if b in node), None)
        stat_node = stats.get(name, {}) if isinstance(stats, dict) else {}
        if conv_key and bn_key and bn_key in stat_node:
            conv = node[conv_key]
            bn = node[bn_key]
            st = stat_node[bn_key]
            gamma, beta = np.asarray(bn['scale']), np.asarray(bn['bias'])
            mean, var = np.asarray(st['mean']), np.asarray(st['var'])
            factor = gamma / np.sqrt(var + eps)
            kernel = np.asarray(conv['kernel'])
            conv['kernel'] = kernel * factor  # broadcast over out channel
            # neutralize BN without touching the conv's (possibly absent)
            # bias: BN becomes y + (beta - mean*factor)
            bn['scale'] = np.ones_like(gamma)
            bn['bias'] = beta - mean * factor
            st['mean'] = np.zeros_like(mean)
            st['var'] = np.ones_like(var) - eps
            fused += 1
        # recurse
        fused += fuse_tree(node, stat_node, eps)
    return fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint')
    p.add_argument('out')
    args = p.parse_args()
    from msmdfusion_tpu.utils.checkpoint import load_checkpoint, \
        save_checkpoint
    import jax
    state = load_checkpoint(args.checkpoint)
    params = jax.tree_util.tree_map(np.asarray, state['params'])
    stats = jax.tree_util.tree_map(np.asarray, state['batch_stats'])
    n = fuse_tree(params, stats)
    print(f'fused {n} conv+bn pairs')
    save_checkpoint(os.path.dirname(args.out) or '.', 0, params, stats,
                    meta={'fused_conv_bn': n})


if __name__ == '__main__':
    main()
