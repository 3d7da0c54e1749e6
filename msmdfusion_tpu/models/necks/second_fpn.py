"""SECOND FPN neck: per-level (de)conv upsample + channel concat.

TPU-native equivalent of mmdet3d/models/necks/second_fpn.py:11-92.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..layers import ConvModule, MaskedBatchNorm, torch_conv_init


@NECKS.register('SECONDFPN')
class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    use_conv_for_no_stride: bool = False
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        """inputs: tuple of [B, H_i, W_i, C_i] -> [ [B, H, W, sum(C_out)] ]."""
        assert len(inputs) == len(self.in_channels)
        ups = []
        for i, x in enumerate(inputs):
            stride = self.upsample_strides[i]
            if stride > 1 or (stride == 1 and not self.use_conv_for_no_stride):
                x = nn.ConvTranspose(
                    self.out_channels[i], (stride, stride),
                    strides=(stride, stride), padding='VALID', use_bias=False,
                    kernel_init=torch_conv_init)(x)
            else:
                stride = int(round(1 / stride)) if stride < 1 else 1
                x = nn.Conv(self.out_channels[i], (stride, stride),
                            strides=(stride, stride), padding='VALID',
                            use_bias=False, kernel_init=torch_conv_init)(x)
            x = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps)(x, train=train)
            x = jnp.maximum(x, 0)
            ups.append(x)
        if len(ups) > 1:
            out = jnp.concatenate(ups, axis=-1)
        else:
            out = ups[0]
        return [out]
