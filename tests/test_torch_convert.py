"""Checkpoint converter: rules must produce exactly the model.init tree.

Synthesizes a torch-style state_dict with reference key names/layouts from
the flax tree (via the inverse transposes), converts it, and checks value
round-trip + exact tree match against jax.eval_shape(model.init).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import msmdfusion_tpu.models  # noqa: F401
from msmdfusion_tpu.config import load_config
from msmdfusion_tpu.models.builder import build_detector
from msmdfusion_tpu.utils.torch_convert import (convert_transfusion_l,
                                                transfusion_l_rules)


def flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = v
    return out


def synthesize_state_dict(rules, flax_params, flax_stats, rng):
    """Inverse-transform flax shapes into a torch-style state_dict."""
    fp = flatten(flax_params)
    fs = flatten(flax_stats)
    sd = {}
    for t, f, kind in rules.rules:
        if kind == 'conv2d':
            k = fp[f + '/kernel']
            sd[t + '.weight'] = rng.randn(
                k.shape[3], k.shape[2], k.shape[0], k.shape[1]).astype(
                    np.float32)
            if f + '/bias' in fp:
                sd[t + '.bias'] = rng.randn(k.shape[3]).astype(np.float32)
        elif kind == 'deconv2d':
            k = fp[f + '/kernel']
            sd[t + '.weight'] = rng.randn(
                k.shape[2], k.shape[3], k.shape[0], k.shape[1]).astype(
                    np.float32)
        elif kind == 'spconv':
            k = fp[f + '/kernel']  # [T, I, O]; assume cubic kernel
            t3 = round(k.shape[0] ** (1 / 3))
            if t3 ** 3 == k.shape[0]:
                kz = ky = kx = t3
            else:  # (3,1,1) conv_out style
                kz, ky, kx = k.shape[0], 1, 1
            sd[t + '.weight'] = rng.randn(
                k.shape[2], kz, ky, kx, k.shape[1]).astype(np.float32)
        elif kind == 'linear':
            k = fp[f + '/kernel']
            sd[t + '.weight'] = rng.randn(k.shape[1], k.shape[0]).astype(
                np.float32)
            if f + '/bias' in fp:
                sd[t + '.bias'] = rng.randn(k.shape[1]).astype(np.float32)
        elif kind in ('bn', 'ln'):
            c = fp[f + '/scale'].shape[0]
            sd[t + '.weight'] = rng.randn(c).astype(np.float32)
            sd[t + '.bias'] = rng.randn(c).astype(np.float32)
            if kind == 'bn':
                sd[t + '.running_mean'] = rng.randn(c).astype(np.float32)
                sd[t + '.running_var'] = np.abs(rng.randn(c)).astype(
                    np.float32)
        elif kind == 'mha':
            e = fp[f + '/Dense_0/kernel'].shape[0]
            sd[t + '.in_proj_weight'] = rng.randn(3 * e, e).astype(np.float32)
            sd[t + '.in_proj_bias'] = rng.randn(3 * e).astype(np.float32)
            sd[t + '.out_proj.weight'] = rng.randn(e, e).astype(np.float32)
            sd[t + '.out_proj.bias'] = rng.randn(e).astype(np.float32)
    return sd


def test_converter_covers_transfusion_l(rng):
    cfg = load_config('configs/transfusion_nusc_voxel_L.py')
    model = build_detector(cfg.model)
    pts = jnp.zeros((1, 1000, 5))
    mask = jnp.ones((1, 1000), bool)
    tree = jax.eval_shape(model.init, jax.random.PRNGKey(0), pts, mask)
    flax_params = jax.tree_util.tree_map(lambda x: np.zeros(x.shape),
                                         tree['params'])
    flax_stats = jax.tree_util.tree_map(lambda x: np.zeros(x.shape),
                                        tree['batch_stats'])

    rules = transfusion_l_rules()
    sd = synthesize_state_dict(rules, flax_params, flax_stats, rng)
    variables, unused = convert_transfusion_l(sd)
    assert not unused, f'unconverted torch keys: {unused[:5]}'

    got_p = flatten(variables['params'])
    want_p = flatten(flax_params)
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not extra, f'converter produced unknown paths: {extra[:8]}'
    # every produced path must match the model tree's shape
    for path, val in got_p.items():
        assert val.shape == tuple(want_p[path].shape), \
            f'{path}: {val.shape} vs {want_p[path].shape}'
    got_s = flatten(variables['batch_stats'])
    want_s = flatten(flax_stats)
    for path, val in got_s.items():
        assert path in want_s and val.shape == tuple(want_s[path].shape), path
    # coverage: anything missing is a converter gap worth knowing about
    assert len(missing) == 0, f'paths not covered: {missing[:10]}'


@pytest.mark.slow
def test_converter_covers_msmdfusion_flagship(rng):
    """Flagship converter covers 100%% of params except the GMA dummy
    embeddings (no torch counterpart — the reference draws a fresh random
    row per step, sparse_multimodal_encoder_painting.py:372)."""
    from msmdfusion_tpu.utils.torch_convert import (convert_msmdfusion,
                                                    merge_variables,
                                                    msmdfusion_rules)
    cfg = load_config('configs/MSMDFusion_nusc_voxel_LC.py')
    model = build_detector(cfg.model)
    b, v, n, m, mr = 1, 6, 500, 40, 30
    pts = jnp.zeros((b, n, 5))
    mask = jnp.ones((b, n), bool)
    img = jnp.zeros((b, v, 64, 64, 3))
    fg = dict(fg_pixels=jnp.zeros((b, v, m, 3)),
              fg_points=jnp.zeros((b, v, m, 15)),
              fg_mask=jnp.ones((b, v, m), bool),
              fg_real_pixels=jnp.zeros((b, v, mr, 3)),
              fg_real_mask=jnp.ones((b, v, mr), bool),
              lidar2img=jnp.zeros((b, v, 4, 4)))
    tree = jax.eval_shape(model.init, jax.random.PRNGKey(0), pts, mask, img,
                          fg)
    flax_params = jax.tree_util.tree_map(lambda x: np.zeros(x.shape),
                                         tree['params'])
    flax_stats = jax.tree_util.tree_map(lambda x: np.zeros(x.shape),
                                        tree['batch_stats'])

    rules = msmdfusion_rules()
    sd = synthesize_state_dict(rules, flax_params, flax_stats, rng)
    variables, unused = convert_msmdfusion(sd)
    assert not unused, f'unconverted torch keys: {unused[:5]}'

    got_p = flatten(variables['params'])
    want_p = flatten(flax_params)
    extra = sorted(set(got_p) - set(want_p))
    assert not extra, f'converter produced unknown paths: {extra[:8]}'
    for path, val in got_p.items():
        assert val.shape == tuple(want_p[path].shape), \
            f'{path}: {val.shape} vs {want_p[path].shape}'
    got_s = flatten(variables['batch_stats'])
    want_s = flatten(flax_stats)
    for path, val in got_s.items():
        assert path in want_s and val.shape == tuple(want_s[path].shape), path
    missing = sorted(set(want_p) - set(got_p))
    allow = [p for p in missing if 'dummy_embedding' in p]
    hard_missing = [p for p in missing if 'dummy_embedding' not in p]
    assert not hard_missing, f'paths not covered: {hard_missing[:10]}'
    assert len(allow) == 4  # one learned dummy row per GMA stage

    # merge keeps the un-sourced params from init
    merged = merge_variables(
        jax.tree_util.tree_map(lambda x: np.zeros(x.shape), tree), variables)
    mp = flatten(merged['params'])
    assert set(mp) == set(want_p)
