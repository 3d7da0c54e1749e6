"""SECOND-style sparse voxel encoder.

TPU-native re-design of mmdet3d/models/middle_encoders/sparse_encoder.py:10-209
(``SparseEncoder``): 4 stages of submanifold blocks with strided sparse-conv
downsamples, a final (3,1,1)/(2,1,1) conv_out, densified to a channels-last
BEV map. Returns the per-stage sparse tensors list consumed by the GMA
multimodal encoder exactly like the reference (sparse_encoder.py:117-133).

Capacity planning replaces dynamic voxel counts: each downsample writes into
a fixed-size output (``stage_capacities``), oversubscription drops the
highest-key voxels deterministically.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse.tensor import SparseTensor, make_sparse_tensor, to_dense_bev
from ...registry import MIDDLE_ENCODERS
from ..sparse_blocks import SparseBasicBlock, SparseConvBlock


@MIDDLE_ENCODERS.register('SparseEncoder')
class SparseEncoder(nn.Module):
    in_channels: int
    sparse_shape: Tuple[int, int, int]
    order: Tuple[str, ...] = ('conv', 'norm', 'act')
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence[Sequence] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    block_type: str = 'conv_module'
    # per-stage output capacity after each downsample; None = keep input cap
    stage_capacities: Optional[Sequence[int]] = None
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01
    return_stages: bool = True

    @nn.compact
    def __call__(self, voxel_features, coors, valid, batch_size: int,
                 train: bool = False, assume_sorted: bool = False,
                 return_cache: bool = False):
        """voxel_features [K, C], coors [K, 4] (b,z,y,x), valid [K].

        assume_sorted: rows already ascending in packed key (the fused
        voxelize_mean_batch emits this order) — skips a 120k-row sort.
        return_cache: also return the indice_key plan cache so consumers
        on the same coordinate sets (the GMA grouped convs) can reuse the
        rulebooks instead of re-matching (spconv's cross-module
        ``indice_key`` reuse, reference ops/sparse_block.py:159).
        """
        assert self.block_type in ('conv_module', 'basicblock')
        st = make_sparse_tensor(voxel_features, coors, valid,
                                tuple(self.sparse_shape), batch_size,
                                assume_sorted=assume_sorted)
        cache: dict = {}
        st, cache = SparseConvBlock(
            self.base_channels, 3, padding=1, conv_type='SubMConv3d',
            indice_key='subm1', order=self.order, norm_eps=self.norm_eps,
            norm_momentum=self.norm_momentum)(st, cache, train=train)

        encode_features = [st]
        num_stages = len(self.encoder_channels)
        caps = self.stage_capacities
        for i, blocks in enumerate(self.encoder_channels):
            for j, out_channels in enumerate(tuple(blocks)):
                padding = tuple(self.encoder_paddings[i])[j]
                out_cap = caps[i] if caps is not None else None
                is_down = False
                if i != 0 and j == 0 and self.block_type == 'conv_module':
                    is_down = True
                elif (self.block_type == 'basicblock' and
                      j == len(blocks) - 1 and i != num_stages - 1):
                    is_down = True
                if is_down:
                    st, cache = SparseConvBlock(
                        out_channels, 3, stride=2, padding=padding,
                        conv_type='SparseConv3d', indice_key=f'spconv{i + 1}',
                        out_capacity=out_cap, order=self.order,
                        norm_eps=self.norm_eps,
                        norm_momentum=self.norm_momentum)(st, cache,
                                                          train=train)
                elif self.block_type == 'basicblock':
                    st, cache = SparseBasicBlock(
                        out_channels, indice_key=f'subm{i + 1}',
                        norm_eps=self.norm_eps,
                        norm_momentum=self.norm_momentum)(st, cache,
                                                          train=train)
                else:
                    st, cache = SparseConvBlock(
                        out_channels, 3, padding=padding,
                        conv_type='SubMConv3d', indice_key=f'subm{i + 1}',
                        order=self.order, norm_eps=self.norm_eps,
                        norm_momentum=self.norm_momentum)(st, cache,
                                                          train=train)
            encode_features.append(st)

        out, cache = SparseConvBlock(
            self.output_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=0, conv_type='SparseConv3d', indice_key='spconv_down2',
            out_capacity=(caps[-1] if caps is not None else None),
            order=self.order, norm_eps=self.norm_eps,
            norm_momentum=self.norm_momentum)(st, cache, train=train)
        bev = to_dense_bev(out)  # [B, H, W, C*D]
        if self.return_stages:
            if return_cache:
                return bev, encode_features, cache
            return bev, encode_features
        return bev
