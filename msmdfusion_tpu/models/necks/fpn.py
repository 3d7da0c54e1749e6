"""FPN neck (mmdet-compatible structure, NHWC).

TPU-native equivalent of the mmdet FPN the reference uses as img_neck
(configs/MSMDFusion_nusc_voxel_LC.py:159-163: in [256,512,1024,2048],
out 256, num_outs=5; extra level via stride-2 max-pool on the last output).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..layers import torch_conv_init


def _nearest_up2(x, target_shape):
    """2x nearest upsample via broadcast-reshape, cropped to target H/W."""
    b, h, w, c = x.shape
    th, tw = target_shape[1], target_shape[2]
    up = jnp.broadcast_to(x[:, :, None, :, None, :],
                          (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
    return up[:, :th, :tw]


@NECKS.register('FPN')
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    kernel_init=torch_conv_init, name=f'lateral_{i}')(x)
            for i, x in enumerate(inputs)
        ]
        # top-down pathway: nearest-neighbor upsample + add. Broadcast-
        # reshape instead of jax.image.resize (whose gather lowering cost
        # ~28ms for the whole FPN on v5e).
        for i in range(len(laterals) - 1, 0, -1):
            up = _nearest_up2(laterals[i], laterals[i - 1].shape)
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=True,
                    kernel_init=torch_conv_init, name=f'fpn_conv_{i}')(x)
            for i, x in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2),
                                    padding='VALID'))
        return tuple(outs)
