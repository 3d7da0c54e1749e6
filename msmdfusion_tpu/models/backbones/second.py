"""SECOND BEV backbone (channels-last).

TPU-native equivalent of mmdet3d/models/backbones/second.py:8-86: stacked
stride-1/2 3x3 conv-BN-ReLU blocks producing multi-scale BEV features.
"""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from ...registry import BACKBONES
from ..layers import ConvModule


@BACKBONES.register('SECOND')
class SECOND(nn.Module):
    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, C] -> tuple of per-stage [B, H_i, W_i, C_i]."""
        outs = []
        for i, num in enumerate(self.layer_nums):
            x = ConvModule(self.out_channels[i], 3,
                           strides=self.layer_strides[i], padding=1,
                           norm_eps=self.norm_eps,
                           norm_momentum=self.norm_momentum)(x, train=train)
            for _ in range(num):
                x = ConvModule(self.out_channels[i], 3, padding=1,
                               norm_eps=self.norm_eps,
                               norm_momentum=self.norm_momentum)(x,
                                                                 train=train)
            outs.append(x)
        return tuple(outs)
