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


# ---------------------------------------------------------------------------
# Composite-module parity (round-5, VERDICT item 4): assembled blocks, not
# just single layers — the converter + module semantics must agree through
# whole sub-networks.
# ---------------------------------------------------------------------------

class _TorchPosEmbed(torch.nn.Module):
    """Reference PositionEmbeddingLearned (transfusion_head.py:25-41)."""

    def __init__(self, input_channel, num_pos_feats):
        super().__init__()
        self.position_embedding_head = torch.nn.Sequential(
            torch.nn.Conv1d(input_channel, num_pos_feats, 1),
            torch.nn.BatchNorm1d(num_pos_feats), torch.nn.ReLU(),
            torch.nn.Conv1d(num_pos_feats, num_pos_feats, 1))

    def forward(self, xyz):                       # [B, P, D]
        return self.position_embedding_head(xyz.transpose(1, 2).contiguous())


class _TorchDecoderLayer(torch.nn.Module):
    """Reference TransformerDecoderLayer transcription
    (transfusion_head.py:44-122; dropout elided — eval parity)."""

    def __init__(self, d, nhead, dff, pos_dim=2):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(d, nhead, dropout=0.0)
        self.multihead_attn = torch.nn.MultiheadAttention(d, nhead,
                                                          dropout=0.0)
        self.linear1 = torch.nn.Linear(d, dff)
        self.linear2 = torch.nn.Linear(dff, d)
        self.norm1 = torch.nn.LayerNorm(d)
        self.norm2 = torch.nn.LayerNorm(d)
        self.norm3 = torch.nn.LayerNorm(d)
        self.self_posembed = _TorchPosEmbed(pos_dim, d)
        self.cross_posembed = _TorchPosEmbed(pos_dim, d)

    def forward(self, query, key, query_pos, key_pos):
        # query [B, C, P], key [B, C, S] (reference layout)
        qpe = self.self_posembed(query_pos).permute(2, 0, 1)
        kpe = self.cross_posembed(key_pos).permute(2, 0, 1)
        query = query.permute(2, 0, 1)
        key = key.permute(2, 0, 1)
        q = k = v = query + qpe
        query2 = self.self_attn(q, k, v)[0]
        query = self.norm1(query + query2)
        query2 = self.multihead_attn(query + qpe, key + kpe, key + kpe)[0]
        query = self.norm2(query + query2)
        query2 = self.linear2(torch.relu(self.linear1(query)))
        query = self.norm3(query + query2)
        return query.permute(1, 2, 0)


def test_transfusion_decoder_layer_composite_parity(rng):
    """One FULL decoder layer (self+cross attn + FFN + learned pos-embeds)
    through the converter == the reference transcription, <= 1e-4."""
    from msmdfusion_tpu.models.heads.transfusion_head import \
        TransformerDecoderLayer
    d, nhead, dff, p, s, b = 16, 4, 32, 6, 10, 2
    tm = _TorchDecoderLayer(d, nhead, dff)
    tm.eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    for pe in (tm.self_posembed, tm.cross_posembed):
        bn = pe.position_embedding_head[1]
        with torch.no_grad():
            bn.running_mean.copy_(torch.from_numpy(
                rng.randn(d).astype(np.float32) * 0.3))
            bn.running_var.copy_(torch.from_numpy(
                np.abs(rng.randn(d)).astype(np.float32) + 0.5))
    query = rng.randn(b, d, p).astype(np.float32)
    key = rng.randn(b, d, s).astype(np.float32)
    qpos = rng.randn(b, p, 2).astype(np.float32)
    kpos = rng.randn(b, s, 2).astype(np.float32)
    with torch.no_grad():
        want = _np(tm(torch.from_numpy(query), torch.from_numpy(key),
                      torch.from_numpy(qpos), torch.from_numpy(kpos)))

    r = ConverterRules()
    d_t, d_f = 'dec', 'dec'
    r.mha(f'{d_t}.self_attn', f'{d_f}/self_attn')
    r.mha(f'{d_t}.multihead_attn', f'{d_f}/multihead_attn')
    r.linear(f'{d_t}.linear1', f'{d_f}/linear1')
    r.linear(f'{d_t}.linear2', f'{d_f}/linear2')
    for i in (1, 2, 3):
        r.ln(f'{d_t}.norm{i}', f'{d_f}/norm{i}')
    for pe in ('self_posembed', 'cross_posembed'):
        r.linear(f'{d_t}.{pe}.position_embedding_head.0',
                 f'{d_f}/{pe}/Dense_0')
        r.bn(f'{d_t}.{pe}.position_embedding_head.1',
             f'{d_f}/{pe}/MaskedBatchNorm_0')
        r.linear(f'{d_t}.{pe}.position_embedding_head.3',
                 f'{d_f}/{pe}/Dense_1')
    sd = {'dec.' + k: _np(v) for k, v in tm.state_dict().items()
          if 'num_batches' not in k}
    converted, unused = r.apply(sd)
    assert not unused, unused

    fl = TransformerDecoderLayer(d_model=d, nhead=nhead,
                                 dim_feedforward=dff, dropout=0.0)
    variables = {k: v['dec'] for k, v in converted.items()}
    got = fl.apply(variables, jnp.asarray(query.transpose(0, 2, 1)),
                   jnp.asarray(key.transpose(0, 2, 1)),
                   jnp.asarray(qpos), jnp.asarray(kpos), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=1e-4, rtol=1e-4)


def test_resnet_stage_fpn_level_composite_parity(rng):
    """A ResNet bottleneck stage (2 blocks incl. downsample projection) +
    one FPN lateral/output level, converted end-to-end, <= 1e-4.
    Reference: mmdet ResNet/FPN consumed by MSMDFusion.py:138-144."""
    from msmdfusion_tpu.models.backbones.resnet import Bottleneck

    class TorchBottleneck(torch.nn.Module):
        def __init__(self, cin, planes, stride=1, expansion=4):
            super().__init__()
            cout = planes * expansion
            self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                         padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            self.conv3 = torch.nn.Conv2d(planes, cout, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    torch.nn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idn)

    cin, planes = 8, 4
    blocks = torch.nn.ModuleList([TorchBottleneck(cin, planes, stride=2),
                                  TorchBottleneck(16, planes)])
    lateral = torch.nn.Conv2d(16, 8, 1)
    fpn_conv = torch.nn.Conv2d(8, 8, 3, padding=1)
    for m in list(blocks.modules()) + [lateral, fpn_conv]:
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.2))
                m.running_var.copy_(torch.from_numpy(
                    np.abs(rng.randn(m.num_features)).astype(np.float32)
                    + 0.5))
    x = rng.randn(2, cin, 12, 16).astype(np.float32)
    for m in blocks:
        m.eval()
    with torch.no_grad():
        h = x
        ht = torch.from_numpy(h)
        for m in blocks:
            ht = m(ht)
        want = _np(fpn_conv(lateral(ht)))

    r = ConverterRules()
    for b, m in enumerate(blocks):
        tb, fb = f'layer1.{b}', f'layer1_{b}'
        for c in (1, 2, 3):
            r.conv(f'{tb}.conv{c}', f'{fb}/conv{c}')
            r.bn(f'{tb}.bn{c}', f'{fb}/bn{c}')
        if m.downsample is not None:
            r.conv(f'{tb}.downsample.0', f'{fb}/downsample_conv')
            r.bn(f'{tb}.downsample.1', f'{fb}/downsample_bn')
    r.conv('lat', 'lateral_0')
    r.conv('fpn', 'fpn_conv_0')
    sd = {}
    for b, m in enumerate(blocks):
        sd.update({f'layer1.{b}.' + k: _np(v)
                   for k, v in m.state_dict().items()
                   if 'num_batches' not in k})
    sd.update({'lat.' + k: _np(v) for k, v in lateral.state_dict().items()})
    sd.update({'fpn.' + k: _np(v) for k, v in fpn_conv.state_dict().items()})
    converted, unused = r.apply(sd)
    assert not unused, unused

    hx = jnp.asarray(x.transpose(0, 2, 3, 1))
    for b, stride in enumerate((2, 1)):
        sub = {k: v[f'layer1_{b}'] for k, v in converted.items()}
        hx = Bottleneck(planes=planes, stride=stride,
                        downsample=b == 0).apply(sub, hx, train=False)
    lat = nn.Conv(8, (1, 1)).apply(
        {'params': converted['params']['lateral_0']}, hx)
    got = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)]).apply(
        {'params': converted['params']['fpn_conv_0']}, lat)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want,
                               atol=1e-4, rtol=1e-4)


def test_sparse_basicblock_chain_vs_torch_dense3d(rng):
    """Two chained SparseBasicBlocks on a fully-active grid == the torch
    dense-conv3d transcription (submanifold conv on a full grid IS dense).
    Reference: mmdet3d/ops/sparse_block.py:9-74 chains in
    sparse_encoder.py."""
    from msmdfusion_tpu.models.sparse_blocks import SparseBasicBlock
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor
    c, (z, y, x) = 6, (3, 5, 6)

    class TorchSparseBasicBlock(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = torch.nn.Conv3d(c, c, 3, padding=1, bias=False)
            self.bn1 = torch.nn.BatchNorm3d(c, eps=1e-3, momentum=0.01)
            self.conv2 = torch.nn.Conv3d(c, c, 3, padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm3d(c, eps=1e-3, momentum=0.01)

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + x)

    tb1, tb2 = TorchSparseBasicBlock(c), TorchSparseBasicBlock(c)
    for m in (tb1.bn1, tb1.bn2, tb2.bn1, tb2.bn2):
        with torch.no_grad():
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(c).astype(np.float32) * 0.2))
            m.running_var.copy_(torch.from_numpy(
                np.abs(rng.randn(c)).astype(np.float32) + 0.5))
    tb1.eval()
    tb2.eval()
    vol = rng.randn(1, c, z, y, x).astype(np.float32)
    with torch.no_grad():
        want = _np(tb2(tb1(torch.from_numpy(vol))))[0]   # [c, z, y, x]

    coords = np.stack(np.meshgrid(np.arange(z), np.arange(y), np.arange(x),
                                  indexing='ij'), -1).reshape(-1, 3)
    coords = np.concatenate(
        [np.zeros((coords.shape[0], 1), np.int64), coords], 1)
    feats = vol[0].transpose(1, 2, 3, 0).reshape(-1, c)
    st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(coords),
                            jnp.ones((coords.shape[0],), bool), (z, y, x), 1)

    def block_vars(tb):
        def w3d(conv):
            return t_spconv(_np(conv.weight).transpose(0, 2, 3, 4, 1))
        return {
            'params': {
                'SubMConv3d_0': {'kernel': jnp.asarray(w3d(tb.conv1))},
                'SubMConv3d_1': {'kernel': jnp.asarray(w3d(tb.conv2))},
                'MaskedBatchNorm_0': {'scale': _np(tb.bn1.weight),
                                      'bias': _np(tb.bn1.bias)},
                'MaskedBatchNorm_1': {'scale': _np(tb.bn2.weight),
                                      'bias': _np(tb.bn2.bias)},
            },
            'batch_stats': {
                'MaskedBatchNorm_0': {'mean': _np(tb.bn1.running_mean),
                                      'var': _np(tb.bn1.running_var)},
                'MaskedBatchNorm_1': {'mean': _np(tb.bn2.running_mean),
                                      'var': _np(tb.bn2.running_var)},
            },
        }

    cache = {}
    out = st
    for tb in (tb1, tb2):
        blk = SparseBasicBlock(c, indice_key='chain')
        out, cache = blk.apply(block_vars(tb), out, cache, train=False)
    dense = np.zeros((z, y, x, c), np.float32)
    cc = np.asarray(out.coords)
    v = np.asarray(out.valid)
    dense[cc[v, 1], cc[v, 2], cc[v, 3]] = np.asarray(out.features)[v]
    np.testing.assert_allclose(dense.transpose(3, 0, 1, 2), want,
                               atol=1e-4, rtol=1e-4)


def test_bn_running_stats_multi_step_parity(rng):
    """BN momentum semantics across SEVERAL train steps through a composite
    module (PositionEmbeddingLearned, bn momentum 0.1 — the reference's
    init_bn_momentum, transfusion_head.py:716-720), then eval parity."""
    from msmdfusion_tpu.models.heads.transfusion_head import \
        PositionEmbeddingLearned
    d = 8
    tm = _TorchPosEmbed(2, d)
    r = ConverterRules()
    r.linear('pe.position_embedding_head.0', 'pe/Dense_0')
    r.bn('pe.position_embedding_head.1', 'pe/MaskedBatchNorm_0')
    r.linear('pe.position_embedding_head.3', 'pe/Dense_1')
    sd = {'pe.' + k: _np(v) for k, v in tm.state_dict().items()
          if 'num_batches' not in k}
    converted, unused = r.apply(sd)
    assert not unused
    fl = PositionEmbeddingLearned(d)
    variables = {k: dict(v['pe']) for k, v in converted.items()}

    tm.train()
    xs = [rng.randn(2, 7, 2).astype(np.float32) for _ in range(3)]
    for xnp in xs:
        with torch.no_grad():
            tm(torch.from_numpy(xnp))
        _, upd = fl.apply(variables, jnp.asarray(xnp), train=True,
                          mutable=['batch_stats'])
        variables = {'params': variables['params'],
                     'batch_stats': upd['batch_stats']}
    bn = tm.position_embedding_head[1]
    got_bs = variables['batch_stats']['MaskedBatchNorm_0']
    np.testing.assert_allclose(np.asarray(got_bs['mean']),
                               _np(bn.running_mean), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_bs['var']),
                               _np(bn.running_var), atol=1e-5, rtol=1e-5)
    tm.eval()
    xe = rng.randn(2, 7, 2).astype(np.float32)
    with torch.no_grad():
        want = _np(tm(torch.from_numpy(xe)))            # [B, C, P]
    got = fl.apply(variables, jnp.asarray(xe), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=1e-5, rtol=1e-5)
