"""Numeric forward-agreement between torch modules and converted flax ones.

The converter tests (test_torch_convert.py) prove the NAME/shape mapping;
these prove the MATH: build a tiny torch module, convert its state_dict with
utils/torch_convert.py, run both forwards on the same input, and assert
agreement <= 1e-5.  Covers every transform kind the converter uses
(conv2d / deconv2d / spconv / linear / bn / ln / mha) plus the
TransFusionBBoxCoder decode math transcribed from the reference
(mmdet3d/core/bbox/coders/transfusion_bbox_coder.py:39-126).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

torch = pytest.importorskip('torch')

from msmdfusion_tpu.utils.torch_convert import (ConverterRules, t_conv2d,
                                                t_deconv2d, t_linear,
                                                t_spconv)

ATOL = 1e-5


def _np(t):
    # copy: torch buffers update IN PLACE (BN running stats) and .numpy()
    # shares memory — an aliased view would let the torch forward mutate
    # the converted flax inputs after the fact
    return t.detach().numpy().copy()


def test_conv2d_forward_parity(rng):
    tc = torch.nn.Conv2d(3, 8, 3, padding=1, bias=True)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)       # NCHW
    with torch.no_grad():
        want = _np(tc(torch.from_numpy(x)))             # [2, 8, 9, 11]

    fl = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)])
    params = {'kernel': t_conv2d(_np(tc.weight)), 'bias': _np(tc.bias)}
    got = fl.apply({'params': params},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))  # NHWC
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want,
                               atol=ATOL, rtol=1e-5)


def test_conv_transpose2d_forward_parity(rng):
    # SECONDFPN deblock shape: kernel == stride == 2, no bias
    tc = torch.nn.ConvTranspose2d(6, 4, 2, stride=2, bias=False)
    x = rng.randn(2, 6, 5, 7).astype(np.float32)
    with torch.no_grad():
        want = _np(tc(torch.from_numpy(x)))             # [2, 4, 10, 14]

    fl = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding='VALID',
                          use_bias=False)
    params = {'kernel': t_deconv2d(_np(tc.weight))}
    got = fl.apply({'params': params},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want,
                               atol=ATOL, rtol=1e-5)


def test_linear_and_conv1d_forward_parity(rng):
    tl = torch.nn.Linear(7, 5)
    x = rng.randn(4, 7).astype(np.float32)
    with torch.no_grad():
        want = _np(tl(torch.from_numpy(x)))
    got = nn.Dense(5).apply(
        {'params': {'kernel': t_linear(_np(tl.weight)),
                    'bias': _np(tl.bias)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=1e-5)

    # Conv1d kernel-1 (the reference head's prediction convs) == Dense
    tc = torch.nn.Conv1d(7, 5, 1)
    with torch.no_grad():
        want = _np(tc(torch.from_numpy(x[:, :, None])))[..., 0]
    got = nn.Dense(5).apply(
        {'params': {'kernel': t_linear(_np(tc.weight)),
                    'bias': _np(tc.bias)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=1e-5)


def test_batchnorm_eval_and_momentum_parity(rng):
    """MaskedBatchNorm matches torch BN semantics exactly: biased var for
    normalization, UNBIASED var into the running estimate, and
    ``running = (1 - momentum) * running + momentum * batch`` (the
    reference's norm_cfg momentum=0.01, torch convention)."""
    from msmdfusion_tpu.models.layers import MaskedBatchNorm
    tb = torch.nn.BatchNorm1d(6, momentum=0.01, eps=1e-3)
    with torch.no_grad():
        tb.weight.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tb.bias.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tb.running_mean.copy_(
            torch.from_numpy(rng.randn(6).astype(np.float32)))
        tb.running_var.copy_(torch.from_numpy(
            np.abs(rng.randn(6)).astype(np.float32) + 0.5))
    x = rng.randn(32, 6).astype(np.float32)

    fl = MaskedBatchNorm(momentum=0.01, eps=1e-3)
    variables = {
        'params': {'scale': _np(tb.weight), 'bias': _np(tb.bias)},
        'batch_stats': {'mean': _np(tb.running_mean),
                        'var': _np(tb.running_var)},
    }

    # eval forward
    tb.eval()
    with torch.no_grad():
        want_eval = _np(tb(torch.from_numpy(x)))
    got_eval = fl.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval, atol=ATOL,
                               rtol=1e-5)

    # train forward + running-stat update
    tb.train()
    with torch.no_grad():
        want_train = _np(tb(torch.from_numpy(x)))
    got_train, updates = fl.apply(variables, jnp.asarray(x), train=True,
                                  mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got_train), want_train, atol=ATOL,
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates['batch_stats']['mean']), _np(tb.running_mean),
        atol=ATOL, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates['batch_stats']['var']), _np(tb.running_var),
        atol=ATOL, rtol=1e-5)


def test_layernorm_forward_parity(rng):
    tl = torch.nn.LayerNorm(10)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(rng.randn(10).astype(np.float32)))
        tl.bias.copy_(torch.from_numpy(rng.randn(10).astype(np.float32)))
    x = rng.randn(3, 4, 10).astype(np.float32)
    with torch.no_grad():
        want = _np(tl(torch.from_numpy(x)))
    # torch LayerNorm eps default is 1e-5 (flax default 1e-6) — the head's
    # norms pass epsilon=1e-5 for exactly this reason
    got = nn.LayerNorm(epsilon=1e-5).apply(
        {'params': {'scale': _np(tl.weight), 'bias': _np(tl.bias)}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=1e-5)


def test_multihead_attention_forward_parity(rng):
    """torch nn.MultiheadAttention -> the head's MultiheadAttention via the
    converter's mha rule (in_proj split into Dense_0..2, out_proj Dense_3).
    Covers reference transfusion_head.py:125-504 decoder attention."""
    from msmdfusion_tpu.models.heads.transfusion_head import \
        MultiheadAttention
    e, h = 16, 4
    tm = torch.nn.MultiheadAttention(e, h, dropout=0.0, batch_first=True)
    q = rng.randn(2, 5, e).astype(np.float32)
    kv = rng.randn(2, 9, e).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(q), torch.from_numpy(kv),
                     torch.from_numpy(kv), need_weights=False)
    want = _np(want)

    r = ConverterRules()
    r.mha('attn', 'm')
    sd = {'attn.' + k: _np(v) for k, v in tm.state_dict().items()}
    converted, unused = r.apply(sd)
    assert not unused
    fl = MultiheadAttention(embed_dim=e, num_heads=h, dropout=0.0)
    got = fl.apply({'params': converted['params']['m']},
                   jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_spconv_weight_layout_vs_dense_conv3d(rng):
    """t_spconv + our submanifold conv == torch Conv3d on a fully-active
    grid (submanifold conv with every site active IS a dense conv).

    Proves the tap enumeration (z-major, x-fastest) and the [T, I, O]
    layout against torch's [O, I, kz, ky, kx] ground truth. spconv2 stores
    [O, kz, ky, kx, I] (reference mmdet3d/ops/spconv semantics), so the
    torch Conv3d weight is permuted into that layout first.
    """
    from msmdfusion_tpu.ops.sparse.conv import (build_subm_neighbor_table,
                                                subm_conv)
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor
    ci, co = 4, 6
    z, y, x = 3, 4, 5
    tc = torch.nn.Conv3d(ci, co, 3, padding=1, bias=False)
    vol = rng.randn(1, ci, z, y, x).astype(np.float32)
    with torch.no_grad():
        want = _np(tc(torch.from_numpy(vol)))[0]        # [co, z, y, x]

    # torch [O, I, kz, ky, kx] -> spconv [O, kz, ky, kx, I] -> ours [T, I, O]
    w_spconv = _np(tc.weight).transpose(0, 2, 3, 4, 1)
    w = t_spconv(w_spconv)

    coords = np.stack(np.meshgrid(np.arange(z), np.arange(y), np.arange(x),
                                  indexing='ij'), -1).reshape(-1, 3)
    coords = np.concatenate(
        [np.zeros((coords.shape[0], 1), np.int64), coords], 1)
    feats = vol[0].transpose(1, 2, 3, 0).reshape(-1, ci)
    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                            jnp.ones((coords.shape[0],), bool), (z, y, x), 1)
    table = build_subm_neighbor_table(st, 3)
    out = subm_conv(st, jnp.asarray(w), table)
    dense = np.zeros((z, y, x, co), np.float32)
    c = np.asarray(out.coords)
    v = np.asarray(out.valid)
    dense[c[v, 1], c[v, 2], c[v, 3]] = np.asarray(out.features)[v]
    np.testing.assert_allclose(dense.transpose(3, 0, 1, 2), want,
                               atol=1e-4, rtol=1e-4)


def test_transfusion_coder_decode_vs_reference_math(rng):
    """Our coder.decode == the reference decode transcribed in numpy
    (transfusion_bbox_coder.py:39-126)."""
    from msmdfusion_tpu.core.coders import TransFusionBBoxCoder
    b, c, p = 2, 10, 16
    pc_range = [-54.0, -54.0]
    voxel_size = [0.075, 0.075]
    osf = 8
    heat = rng.rand(b, c, p).astype(np.float32)
    rot = rng.randn(b, 2, p).astype(np.float32)
    dim = rng.randn(b, 3, p).astype(np.float32) * 0.3
    center = (rng.rand(b, 2, p) * 180).astype(np.float32)
    height = rng.randn(b, 1, p).astype(np.float32)
    vel = rng.randn(b, 2, p).astype(np.float32)

    # reference math, verbatim in numpy
    ref_labels = heat.argmax(1)
    ref_scores = heat.max(1)
    cx = center[:, 0] * osf * voxel_size[0] + pc_range[0]
    cy = center[:, 1] * osf * voxel_size[1] + pc_range[1]
    dims = np.exp(dim)
    zb = height[:, 0] - dims[:, 2] * 0.5
    yaw = np.arctan2(rot[:, 0], rot[:, 1])
    ref_boxes = np.concatenate(
        [cx[:, :, None], cy[:, :, None], zb[:, :, None],
         np.moveaxis(dims, 1, 2), yaw[:, :, None],
         np.moveaxis(vel, 1, 2)], -1)

    coder = TransFusionBBoxCoder(pc_range=pc_range, out_size_factor=osf,
                                 voxel_size=voxel_size,
                                 post_center_range=[-61.2, -61.2, -10.0,
                                                    61.2, 61.2, 10.0],
                                 score_threshold=0.0, code_size=10)
    out = coder.decode(jnp.asarray(heat), jnp.asarray(rot), jnp.asarray(dim),
                       jnp.asarray(center), jnp.asarray(height),
                       jnp.asarray(vel), filter=True)
    np.testing.assert_allclose(np.asarray(out['bboxes']), ref_boxes,
                               atol=ATOL, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out['scores']), ref_scores,
                               atol=ATOL, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out['labels']), ref_labels)
    # filter mask matches the reference's center-range + score predicate
    want_mask = ((ref_boxes[..., :3] >= np.array([-61.2, -61.2, -10.0])).all(-1)
                 & (ref_boxes[..., :3] <= np.array([61.2, 61.2, 10.0])).all(-1))
    np.testing.assert_array_equal(np.asarray(out['valid']), want_mask)
