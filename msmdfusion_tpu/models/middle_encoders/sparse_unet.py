"""Sparse encoder-decoder (U-Net) middle encoder for Part-A2.

TPU-native re-design of mmdet3d/models/middle_encoders/sparse_unet.py:16-292
(``SparseUNet``): SECOND-style sparse encoder stages, then a decoder that
upsamples with inverse sparse convs back through the stored per-stage coord
sets with lateral skip concatenation, emitting both the dense BEV map and
per-voxel "seg" features at full resolution.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse.conv import inverse_conv
from ...ops.sparse.tensor import SparseTensor, make_sparse_tensor, to_dense_bev
from ...registry import MIDDLE_ENCODERS
from ..layers import MaskedBatchNorm, torch_conv_init
from ..sparse_blocks import SparseConvBlock, SubMConv3d


class InverseConvBlock(nn.Module):
    """inverse conv + BN + ReLU onto a stored coordinate set."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01

    @nn.compact
    def __call__(self, st: SparseTensor, target: SparseTensor,
                 train: bool = False):
        t = 27 if self.kernel_size == 3 else self.kernel_size ** 3
        w = self.param('kernel', torch_conv_init,
                       (t, st.num_channels, self.out_channels))
        out = inverse_conv(st, w, target.keys, target.coords, target.valid,
                           target.spatial_shape, self.kernel_size,
                           self.stride, self.padding)
        feats = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps)(
            out.features, mask=out.valid, train=train)
        feats = jnp.where(out.valid[:, None], jnp.maximum(feats, 0), 0)
        return out.replace_features(feats)


@MIDDLE_ENCODERS.register('SparseUNet')
class SparseUNet(nn.Module):
    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence = ((1,), (1, 1, 1), (1, 1, 1),
                                  ((0, 1, 1), 1, 1))
    decoder_channels: Sequence[Sequence[int]] = (
        (64, 64, 64), (64, 64, 32), (32, 32, 16), (16, 16, 16))
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01
    stage_capacities: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, voxel_features, coors, valid, batch_size: int,
                 train: bool = False):
        st = make_sparse_tensor(voxel_features, coors, valid,
                                tuple(self.sparse_shape), batch_size)
        cache: dict = {}
        st, cache = SparseConvBlock(
            self.base_channels, 3, padding=1, conv_type='SubMConv3d',
            indice_key='subm1', norm_eps=self.norm_eps,
            norm_momentum=self.norm_momentum)(st, cache, train=train)

        stages = [st]
        caps = self.stage_capacities
        for i, blocks in enumerate(self.encoder_channels):
            for j, out_ch in enumerate(tuple(blocks)):
                padding = tuple(self.encoder_paddings[i])[j]
                if i != 0 and j == 0:
                    st, cache = SparseConvBlock(
                        out_ch, 3, stride=2, padding=padding,
                        conv_type='SparseConv3d', indice_key=f'spconv{i + 1}',
                        out_capacity=caps[i] if caps else None,
                        norm_eps=self.norm_eps,
                        norm_momentum=self.norm_momentum)(st, cache,
                                                          train=train)
                else:
                    st, cache = SparseConvBlock(
                        out_ch, 3, padding=padding, conv_type='SubMConv3d',
                        indice_key=f'subm{i + 1}', norm_eps=self.norm_eps,
                        norm_momentum=self.norm_momentum)(st, cache,
                                                          train=train)
            stages.append(st)

        # BEV output from the deepest stage (conv_out pattern)
        out, cache = SparseConvBlock(
            self.output_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=0, conv_type='SparseConv3d', indice_key='spconv_down2',
            norm_eps=self.norm_eps,
            norm_momentum=self.norm_momentum)(st, cache, train=train)
        bev = to_dense_bev(out)

        # decoder: upsample through stored stage coords with skip concat
        x = stages[-1]
        for i, dec in enumerate(self.decoder_channels):
            target = stages[len(stages) - 2 - i]
            if x.spatial_shape != target.spatial_shape:
                x = InverseConvBlock(
                    dec[0], norm_eps=self.norm_eps,
                    norm_momentum=self.norm_momentum,
                    name=f'up_{i}')(x, target, train=train)
            merged = jnp.concatenate([x.features, target.features], axis=-1)
            x = x.replace_features(merged)
            x, _ = SparseConvBlock(
                dec[-1], 3, padding=1, conv_type='SubMConv3d',
                indice_key=f'dec_subm{i}', norm_eps=self.norm_eps,
                norm_momentum=self.norm_momentum,
                name=f'dec_block_{i}')(x, {}, train=train)
        return bev, x  # (dense BEV, full-resolution per-voxel features)
