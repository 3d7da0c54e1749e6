#!/usr/bin/env python
"""Isolated timings for the sparse-conv engine ops at flagship stage scales.

Times (loop-in-jit, min-of-N — the tunneled chip shows multi-tenant
contention windows, so never trust single timings):

  - build_plan / plan_rows / attach_rows (the per-indice_key rulebook cost)
  - the vgather conv kernel per (capacity, Cin, Cout) stage shape
  - the one-hot match kernel (MSMD_CONV_ALGO=onehot comparison)
  - downsample_out_coords, make_sparse_tensor (union-like)

Coordinate sets come from a realistic synthetic scene voxelized at the
flagship grid (utils/synth_scene.py) so bracket spans / live-tile
fractions match the E2E bench, not i.i.d. uniform fantasy.

Usage:
    python tools/analysis_tools/conv_microbench.py [--ops conv,rows,...]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)


def timeit(fn, *args, n=8, inner=16):
    """min-of-n of (fn repeated `inner` times in one jit) / inner, ms.

    ``fn(salt, *args)`` must fold the int32 ``salt`` (0 at runtime, but
    data-dependent on the previous iteration's output) into an operand —
    that dependency chain is what stops XLA from CSE/LICM-folding the
    ``inner`` repetitions into a single call.
    """

    @jax.jit
    def loop(*a):
        def body(i, carry):
            salt, _ = carry
            out = fn(salt, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.reshape(-1)[0]
            # genuinely data-dependent, always 0 at runtime
            new_salt = (probe.astype(jnp.float32) > 1e30).astype(jnp.int32)
            return (new_salt, out)

        _, out0 = body(0, (jnp.int32(0), None))
        return jax.lax.fori_loop(1, inner, body, (jnp.int32(0), out0))

    out = jax.block_until_ready(loop(*args))   # compile
    best = float('inf')
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3, out[1]


def stage_sets():
    """Realistic coordinate sets + capacities per flagship stage."""
    from msmdfusion_tpu.utils.synth_scene import realistic_batch
    from msmdfusion_tpu.ops.voxelize import voxelize_mean_batch
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor
    from msmdfusion_tpu.ops.sparse.conv import downsample_out_coords

    shape = dict(n=250000, v=6, m=20000, mr=15000, img_hw=(448, 800),
                 pcr=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0])
    batch = realistic_batch(shape, b=1, seed=0)
    feats, coors, valid = voxelize_mean_batch(
        jnp.asarray(batch['points']), jnp.asarray(batch['points_mask']),
        [0.075, 0.075, 0.2], shape['pcr'], 160000)
    st0 = make_sparse_tensor(feats, coors, valid, (41, 1440, 1440), 1,
                             assume_sorted=True)
    sets = {0: st0}
    caps = {1: 76000, 2: 26500, 3: 23500}
    st = st0
    for i in (1, 2, 3):
        ks = (3, 1, 1) if i == 3 else 3
        sd = (2, 1, 1) if i == 3 else 2
        pd = (0, 1, 1) if i == 2 else (0 if i == 3 else 1)
        out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
            st, ks, sd, pd, caps[i])
        nf = jnp.zeros((out_keys.shape[0], 1), jnp.float32)
        st = make_sparse_tensor(nf, out_coords, out_valid, out_shape, 1,
                                assume_sorted=True)
        sets[i] = st
    return sets


CONFIGS = [
    # (name, stage, cin, cout)  — the flagship's conv population
    ('enc1_c16', 0, 16, 16),
    ('enc2_c32', 1, 32, 32),
    ('enc3_c64', 2, 64, 64),
    ('enc4_c128', 3, 128, 128),
    ('agg0_c80', 0, 80, 80),
    ('agg1_c96', 1, 96, 96),
    ('agg2_c128', 2, 128, 128),
    ('agg3_c192', 3, 192, 192),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ops', default='rows,conv,onehot,coords,glue')
    ap.add_argument('--configs', default=None,
                    help='comma list of config names (default all)')
    args = ap.parse_args()
    ops = set(args.ops.split(','))

    from msmdfusion_tpu.ops.sparse.matchconv import (
        _pallas_conv, _vgather_conv, attach_rows, build_subm_plan, plan_rows)
    from msmdfusion_tpu.ops.sparse.conv import downsample_out_coords
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor

    sets = stage_sets()
    for i, st in sets.items():
        print(f'stage {i}: capacity={st.capacity} '
              f'occ={int(jnp.sum(st.valid))}', flush=True)

    rng = np.random.RandomState(0)
    want = set((args.configs or '').split(',')) if args.configs else None
    for name, stage, cin, cout in CONFIGS:
        if want and name not in want:
            continue
        st = sets[stage]
        k = st.capacity
        feats = jnp.asarray(rng.randn(k, cin).astype(np.float32))
        feats = jnp.where(st.valid[:, None], feats, 0)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)

        def salted(salt, _st=st):
            # salt is 0 at runtime but data-dependent on the previous
            # iteration: the add defeats CSE/LICM without changing keys
            return dataclasses.replace(_st, keys=_st.keys + salt,
                                       coords=_st.coords + salt)

        ms_plan, plan = timeit(
            lambda salt, _s: build_subm_plan(salted(salt), 3), 0)
        line = f'{name:12s} K={k:7d} plan={ms_plan:6.2f}'
        if 'rows' in ops:
            ms_rows, _ = timeit(
                lambda salt, keys, p=plan: plan_rows(keys + salt, p),
                st.keys)
            ms_att, planr = timeit(
                lambda salt, keys, p=plan: attach_rows(keys + salt, p),
                st.keys)
            line += f' rows={ms_rows:6.2f} attach={ms_att:6.2f}'
        else:
            planr = attach_rows(st.keys, plan)
        planr = jax.block_until_ready(planr)
        if 'conv' in ops:
            probe = _vgather_conv(feats, planr, w)
            if probe is None:
                line += ' vgather=  NOFIT'
            else:
                ms_vg, _ = timeit(
                    lambda salt, f, wt, p=planr: _vgather_conv(
                        f + salt.astype(f.dtype), p, wt), feats, w)
                line += f' vgather={ms_vg:6.2f}'
        if 'onehot' in ops:
            ms_oh, _ = timeit(
                lambda salt, f, keys, wt, p=plan: _pallas_conv(
                    f + salt.astype(f.dtype), keys, p, wt),
                feats, st.keys, w)
            line += f' onehot={ms_oh:6.2f}'
        print(line, flush=True)

    if 'coords' in ops:
        for i in (0, 1, 2):
            st = sets[i]
            ms, _ = timeit(
                lambda salt, _s, _st=st: downsample_out_coords(
                    dataclasses.replace(_st, keys=_st.keys + salt,
                                        coords=_st.coords + salt),
                    3, 2, 1, _st.capacity),
                0)
            print(f'downsample_out_coords stage{i} K={st.capacity}: '
                  f'{ms:6.2f} ms', flush=True)

    if 'glue' in ops:
        st = sets[0]
        k = st.capacity
        f80 = jnp.asarray(rng.randn(k + 32000, 80).astype(np.float32))
        c2 = jnp.concatenate([st.coords, st.coords[:32000]], axis=0)
        v2 = jnp.concatenate([st.valid, st.valid[:32000]])
        ms, _ = timeit(
            lambda salt, f: make_sparse_tensor(
                f + salt.astype(f.dtype), c2, v2, (41, 1440, 1440), 1,
                capacity=160000), f80)
        print(f'make_sparse_tensor union-like (204k rows, 80ch -> 160k): '
              f'{ms:6.2f} ms', flush=True)


if __name__ == '__main__':
    main()
