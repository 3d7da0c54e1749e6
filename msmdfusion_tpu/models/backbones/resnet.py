"""ResNet backbone (NHWC, torchvision-compatible structure).

TPU-native equivalent of the mmdet ResNet the reference registers via
mmdet3d/models/backbones/__init__.py:1 and configures as the frozen image
backbone (configs/MSMDFusion_nusc_voxel_LC.py:150-158: depth=50,
out_indices=(0,1,2,3), frozen_stages=1, norm_eval=True). Freezing is handled
functionally: the optimizer masks image-branch params and BN runs with
use_running_average=True (norm_eval) — see apis/train.py.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..layers import MaskedBatchNorm, kaiming_init


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_init, name='conv1')(x)
        out = MaskedBatchNorm(momentum=self.norm_momentum, name='bn1')(
            out, train=train)
        out = jnp.maximum(out, 0)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=kaiming_init,
                      name='conv2')(out)
        out = MaskedBatchNorm(momentum=self.norm_momentum, name='bn2')(
            out, train=train)
        out = jnp.maximum(out, 0)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      kernel_init=kaiming_init, name='conv3')(out)
        out = MaskedBatchNorm(momentum=self.norm_momentum, name='bn3')(
            out, train=train)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=kaiming_init,
                               name='downsample_conv')(x)
            identity = MaskedBatchNorm(momentum=self.norm_momentum,
                                       name='downsample_bn')(
                identity, train=train)
        return jnp.maximum(out + identity, 0)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=kaiming_init,
                      name='conv1')(x)
        out = MaskedBatchNorm(momentum=self.norm_momentum, name='bn1')(
            out, train=train)
        out = jnp.maximum(out, 0)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=kaiming_init, name='conv2')(out)
        out = MaskedBatchNorm(momentum=self.norm_momentum, name='bn2')(
            out, train=train)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=kaiming_init,
                               name='downsample_conv')(x)
            identity = MaskedBatchNorm(momentum=self.norm_momentum,
                                       name='downsample_bn')(
                identity, train=train)
        return jnp.maximum(out + identity, 0)


ARCH = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
        101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
BASIC_DEPTHS = (18, 34)


@BACKBONES.register('ResNet')
class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    style: str = 'pytorch'

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, H, W, 3] -> tuple of stage outputs (NHWC)."""
        # norm_eval freezes BN statistics even in train mode (reference
        # norm_cfg norm_eval=True)
        bn_train = train and not self.norm_eval
        blocks = ARCH[self.depth]
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=kaiming_init, name='conv1')(x)
        x = MaskedBatchNorm(name='bn1')(x, train=bn_train)
        x = jnp.maximum(x, 0)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')

        block_cls = BasicBlock if self.depth in BASIC_DEPTHS else Bottleneck
        outs = []
        planes = 64
        for stage_idx in range(self.num_stages):
            num_blocks = blocks[stage_idx]
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                expands = (block_cls is Bottleneck or stage_idx > 0)
                x = block_cls(
                    planes, stride=stride if block_idx == 0 else 1,
                    downsample=(block_idx == 0 and expands),
                    name=f'layer{stage_idx + 1}_{block_idx}')(
                        x, train=bn_train)
            if stage_idx in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
