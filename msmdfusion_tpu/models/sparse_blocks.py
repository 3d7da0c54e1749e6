"""Flax modules over the sparse-conv engine (SubM/Sparse conv blocks).

TPU-native equivalents of ``make_sparse_convmodule``/``SparseBasicBlock``
(reference mmdet3d/ops/sparse_block.py:9-191) and the spconv layer classes
registered by bug_fix/conv.py. The reference's implicit ``indice_key``
rulebook cache becomes an explicit ``cache`` dict threaded through calls:
submanifold convs sharing an indice_key reuse one neighbor table, strided
convs store their (in_keys -> out coords) pair for potential inverse convs.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.sparse.conv import downsample_out_coords, kernel_offsets
from ..ops.sparse.dense_tail import dense_sparse_conv, use_dense
from ..ops.sparse.matchconv import (DEFAULT_SLAB, ROWS_MIN_C,
                                    apply_epilogue_xla, apply_match_conv,
                                    attach_rows, build_downsample_plan,
                                    build_dual_down_plan, build_subm_plan,
                                    fuse_eval_bn, plan_rows,
                                    rows_gather_conv, use_pallas,
                                    use_vgather)
from ..ops.sparse.tensor import SparseTensor
from .layers import MaskedBatchNorm, get_activation, torch_conv_init


def _num_taps(kernel_size) -> int:
    if isinstance(kernel_size, (tuple, list)):
        return int(np.prod(kernel_size))
    return int(kernel_size) ** 3


class SubMConv3d(nn.Module):
    """Submanifold sparse conv layer; output coords == input coords."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    indice_key: Optional[str] = None
    use_bias: bool = False
    # slab rows per (tile, tap-group) DMA in the match kernel. The default
    # (matchconv.DEFAULT_SLAB) is a ~3x margin over the p99 bracket span at
    # nuScenes densities; big-C convs may shrink it to halve slab DMA
    # (span overflow drops matches deterministically — validate with
    # plan_slab_spans before tightening).
    slab: Optional[int] = None
    # output rows per kernel tile and slab columns per MXU match pass. The
    # match work per output row is ~(tile + window) columns, so BIG-C convs
    # run fastest with a SMALL tile and a chunk wide enough to cover the
    # whole bracket in one pass (v5e scan: C=80 tile 256/cw 512 is ~1.5x
    # tile 512/cw 512); small-C convs are loop-overhead bound and prefer
    # the default 512/512.
    tile: Optional[int] = None
    cw: Optional[int] = None

    @nn.compact
    def __call__(self, st: SparseTensor, cache: Dict[str, Any],
                 scale=None, shift=None, relu: bool = False):
        t = _num_taps(self.kernel_size)
        w = self.param('kernel', torch_conv_init,
                       (t, st.num_channels, self.out_channels))
        b = self.param('bias', nn.initializers.zeros,
                       (self.out_channels,)) if self.use_bias else None
        epi = scale is not None or shift is not None or relu
        if use_dense(st, self.kernel_size):
            # coarse stages: dense-grid conv beats the match kernel and
            # needs no plan at all
            kz, ky, kx = ((self.kernel_size,) * 3 if isinstance(
                self.kernel_size, int) else tuple(self.kernel_size))
            out = dense_sparse_conv(
                st, w, st.coords, st.valid, st.keys, st.spatial_shape,
                self.kernel_size, 1, (kz // 2, ky // 2, kx // 2), bias=b)
            if epi:
                out = out.replace_features(apply_epilogue_xla(
                    out.features, out.valid, scale, shift, relu))
            return out, cache
        key = ('subm', self.indice_key or f'auto_{self.name}')
        plan = cache.get(key)
        if plan is None:
            with jax.named_scope('plan_build'):
                plan = build_subm_plan(st, self.kernel_size,
                                       **({'tile': self.tile} if self.tile
                                          else {}))
            if use_vgather() and use_pallas():
                # rulebook rows once per indice_key: every conv on this
                # coordinate set then skips the one-hot match entirely
                plan = attach_rows(st.keys, plan,
                                   slab=self.slab or DEFAULT_SLAB,
                                   cw=self.cw, site=key[1])
            cache[key] = plan
        if st.num_channels >= ROWS_MIN_C > 0:
            # wide channels: extract the rulebook rows once per indice_key
            # (C-independent kernel) and run the conv as a differentiable
            # hi/lo gather-GEMM — the one-hot match GEMM costs
            # (tile + window) * 2C MACs per output row, the gather one
            # descriptor per (tap, row)
            rkey = ('rows',) + key
            rows = cache.get(rkey)
            if rows is None:
                rows = plan_rows(st.keys, plan,
                                 slab=self.slab or DEFAULT_SLAB,
                                 cw=self.cw)
                cache[rkey] = rows
            out = rows_gather_conv(st.features, rows, w)[:plan.k_out]
            if b is not None:
                out = out + b
            if epi:
                out = apply_epilogue_xla(out, st.valid, scale, shift, relu)
            else:
                out = jnp.where(st.valid[:, None], out, 0)
            return SparseTensor(
                features=out, coords=st.coords, valid=st.valid,
                keys=st.keys, spatial_shape=st.spatial_shape,
                batch_size=st.batch_size), cache
        opts = {k: v for k, v in (('slab', self.slab), ('cw', self.cw))
                if v}
        out = apply_match_conv(st, plan, w, st.coords, st.valid, st.keys,
                               st.spatial_shape, bias=b, scale=scale,
                               shift=shift, relu=relu, **opts)
        return out, cache


class SparseConv3d(nn.Module):
    """Regular (strided) sparse conv; generates a new active coord set."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    out_capacity: Optional[int] = None  # default: same as input capacity
    indice_key: Optional[str] = None
    use_bias: bool = False
    slab: Optional[int] = None          # see SubMConv3d.slab
    tile: Optional[int] = None          # see SubMConv3d.tile
    cw: Optional[int] = None
    # training: also build the transpose ("dual") plan so the backward
    # runs the same Pallas kernel instead of the XLA scatter fallback
    # (subm convs are their own transpose and need no dual)
    with_dual: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, cache: Dict[str, Any],
                 scale=None, shift=None, relu: bool = False):
        t = _num_taps(self.kernel_size)
        w = self.param('kernel', torch_conv_init,
                       (t, st.num_channels, self.out_channels))
        b = self.param('bias', nn.initializers.zeros,
                       (self.out_channels,)) if self.use_bias else None
        epi = scale is not None or shift is not None or relu
        cap = self.out_capacity or st.capacity
        key = ('spconv', self.indice_key or f'auto_{self.name}')
        dense = use_dense(st, self.kernel_size)
        entry = cache.get(key)
        if entry is None:
            with jax.named_scope('out_coords'):
                out_keys, out_coords, out_valid, out_shape = \
                    downsample_out_coords(
                        st, self.kernel_size, self.stride, self.padding,
                        cap, site=key[1])
            with jax.named_scope('plan_build'):
                plan = None if dense else build_downsample_plan(
                    st, out_coords, out_valid, self.kernel_size,
                    self.stride, self.padding,
                    **({'tile': self.tile} if self.tile else {}))
            if plan is not None and use_vgather() and use_pallas():
                # stride-s output columns span ~s x the input rows of a
                # submanifold column; the kernel's per-column tail loop
                # (plan.col_nv) covers the excess exactly, so the fast
                # window stays at the default
                plan = attach_rows(st.keys, plan,
                                   slab=self.slab or DEFAULT_SLAB,
                                   cw=self.cw, site=key[1])
            if plan is not None and self.with_dual and use_pallas():
                dual = build_dual_down_plan(
                    st, out_keys, out_shape, self.kernel_size, self.stride,
                    self.padding,
                    **({'tile': self.tile} if self.tile else {}))
                if use_vgather():
                    dual = attach_rows(out_keys, dual,
                                       slab=self.slab or DEFAULT_SLAB,
                                       cw=self.cw, site=key[1] + '_dual')
                plan = dataclasses.replace(plan, dual=dual,
                                           dual_keys=out_keys)
            entry = (out_keys, out_coords, out_valid, out_shape, plan)
            cache[key] = entry
        out_keys, out_coords, out_valid, out_shape, plan = entry
        if dense and plan is None:
            out = dense_sparse_conv(
                st, w, out_coords, out_valid, out_keys, out_shape,
                self.kernel_size, self.stride, self.padding, bias=b)
            if epi:
                out = out.replace_features(apply_epilogue_xla(
                    out.features, out.valid, scale, shift, relu))
            return out, cache
        opts = {k: v for k, v in (('slab', self.slab), ('cw', self.cw))
                if v}
        out = apply_match_conv(st, plan, w, out_coords, out_valid, out_keys,
                               out_shape, bias=b, scale=scale, shift=shift,
                               relu=relu, **opts)
        return out, cache


class SparseConvBlock(nn.Module):
    """conv + norm + act in configurable order (make_sparse_convmodule).

    Reference: mmdet3d/ops/sparse_block.py:96-191.
    """
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    conv_type: str = 'SubMConv3d'
    indice_key: Optional[str] = None
    out_capacity: Optional[int] = None
    order: Tuple[str, ...] = ('conv', 'norm', 'act')
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01
    act: Optional[str] = 'relu'
    slab: Optional[int] = None          # see SubMConv3d.slab
    tile: Optional[int] = None          # see SubMConv3d.tile
    cw: Optional[int] = None

    @nn.compact
    def __call__(self, st: SparseTensor, cache: Dict[str, Any],
                 train: bool = False):
        norm = MaskedBatchNorm(momentum=self.norm_momentum, eps=self.norm_eps)
        act_fn = get_activation(self.act)
        tile = self.tile
        # inference: fold the eval-mode BN affine + ReLU into the conv's
        # fused epilogue — the post-conv [K, C] elementwise pass (and its
        # HBM round trip) disappears (reference analog: the conv-BN fusion
        # of tools/misc/fuse_conv_bn.py, extended with the activation)
        if (not train and fuse_eval_bn()
                and tuple(self.order) == ('conv', 'norm', 'act')
                and self.act == 'relu'):
            s, b = norm(jnp.zeros((1, self.out_channels), jnp.float32),
                        fold=True)
            kw = dict(scale=s, shift=b, relu=True)
            if self.conv_type == 'SubMConv3d':
                return SubMConv3d(
                    self.out_channels, self.kernel_size,
                    indice_key=self.indice_key, slab=self.slab,
                    tile=tile, cw=self.cw)(st, cache, **kw)
            if self.conv_type == 'SparseConv3d':
                return SparseConv3d(
                    self.out_channels, self.kernel_size, self.stride,
                    self.padding, out_capacity=self.out_capacity,
                    indice_key=self.indice_key, slab=self.slab,
                    tile=tile, cw=self.cw)(st, cache, **kw)
            raise ValueError(self.conv_type)
        for step in self.order:
            if step == 'conv':
                if self.conv_type == 'SubMConv3d':
                    st, cache = SubMConv3d(
                        self.out_channels, self.kernel_size,
                        indice_key=self.indice_key, slab=self.slab,
                        tile=tile, cw=self.cw)(st, cache)
                elif self.conv_type == 'SparseConv3d':
                    st, cache = SparseConv3d(
                        self.out_channels, self.kernel_size, self.stride,
                        self.padding, out_capacity=self.out_capacity,
                        indice_key=self.indice_key, slab=self.slab,
                        tile=tile, cw=self.cw, with_dual=train)(st, cache)
                else:
                    raise ValueError(self.conv_type)
            elif step == 'norm':
                st = st.replace_features(
                    norm(st.features, mask=st.valid, train=train))
            elif step == 'act' and act_fn is not None:
                st = st.replace_features(
                    jnp.where(st.valid[:, None], act_fn(st.features), 0))
        return st, cache


class SparseBasicBlock(nn.Module):
    """ResNet BasicBlock on sparse voxels (two 3x3x3 SubM convs + skip).

    Reference: mmdet3d/ops/sparse_block.py:9-74.
    """
    channels: int
    indice_key: Optional[str] = None
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01
    slab: Optional[int] = None          # see SubMConv3d.slab
    tile: Optional[int] = None          # see SubMConv3d.tile
    cw: Optional[int] = None

    @nn.compact
    def __call__(self, st: SparseTensor, cache: Dict[str, Any],
                 train: bool = False):
        identity = st.features
        tile = self.tile
        norm1 = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps)
        norm2 = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps)
        fold = not train and fuse_eval_bn()
        if fold:
            # eval: both BNs fold into their conv's fused epilogue; only
            # the residual add+ReLU remains as an elementwise pass
            dummy = jnp.zeros((1, self.channels), jnp.float32)
            s1, b1 = norm1(dummy, fold=True)
            st, cache = SubMConv3d(
                self.channels, 3, indice_key=self.indice_key,
                slab=self.slab, tile=tile, cw=self.cw)(
                    st, cache, scale=s1, shift=b1, relu=True)
            s2, b2 = norm2(dummy, fold=True)
            st, cache = SubMConv3d(
                self.channels, 3, indice_key=self.indice_key,
                slab=self.slab, tile=tile, cw=self.cw)(
                    st, cache, scale=s2, shift=b2)
            out = jnp.maximum(st.features + identity, 0)
            st = st.replace_features(jnp.where(st.valid[:, None], out, 0))
            return st, cache
        st, cache = SubMConv3d(self.channels, 3, indice_key=self.indice_key,
                               slab=self.slab, tile=tile,
                               cw=self.cw)(st, cache)
        st = st.replace_features(
            norm1(st.features, mask=st.valid, train=train))
        st = st.replace_features(
            jnp.where(st.valid[:, None], jnp.maximum(st.features, 0), 0))
        st, cache = SubMConv3d(self.channels, 3, indice_key=self.indice_key,
                               slab=self.slab, tile=tile,
                               cw=self.cw)(st, cache)
        st = st.replace_features(
            norm2(st.features, mask=st.valid, train=train))
        out = jnp.maximum(st.features + identity, 0)
        st = st.replace_features(jnp.where(st.valid[:, None], out, 0))
        return st, cache
