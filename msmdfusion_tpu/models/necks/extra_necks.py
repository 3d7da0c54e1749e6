"""Extra necks: FPNC (fused single-scale FPN) and SCConv (self-calibrated
BEV neck).

TPU-native flax re-implementations of the reference's registered-but-
config-unused necks (mmdet3d/models/necks/fpnc.py:119, scconv.py:197),
channels-last. FPNC collapses the FPN pyramid to one map at
``final_dim / downsample`` via bilinear resize + concat + a 3x3 reduction
conv; SCConv runs segment stacks of self-calibrated blocks with strided
downsampling and transposed-conv re-upsampling, concatenating all segment
outputs.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from .fpn import FPN


def _resize_bilinear(x, size):
    """[.., h, w, C] -> [.., H, W, C] bilinear (align_corners=False-ish)."""
    return jax.image.resize(x, x.shape[:-3] + tuple(size) + x.shape[-1:],
                            method='bilinear')


@NECKS.register('FPNC')
class FPNC(nn.Module):
    """FPN collapsed to a single fused map (reference fpnc.py:44-119)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    final_dim: Tuple[int, int] = (900, 1600)
    downsample: int = 4
    use_adp: bool = False
    outC: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = FPN(in_channels=self.in_channels,
                   out_channels=self.out_channels,
                   num_outs=self.num_outs, name='fpn')(feats)
        target = (self.final_dim[0] // self.downsample,
                  self.final_dim[1] // self.downsample)
        if len(outs) == 1:
            return [outs[0]]
        resized = []
        for i, f in enumerate(outs):
            if self.use_adp:
                # adaptive variant adds a 1x1 conv+BN+ReLU after the resize
                f = _resize_bilinear(f, target)
                f = nn.Conv(self.out_channels, (1, 1), use_bias=False)(f)
                f = nn.BatchNorm(use_running_average=not train)(f)
                f = nn.relu(f)
            elif f.shape[-3:-1] != target:
                f = _resize_bilinear(f, target)
            resized.append(f)
        out = jnp.concatenate(resized, axis=-1)
        out = nn.Conv(self.outC, (3, 3), padding=1, use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        return [out]


class _ConvBN(nn.Module):
    channels: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=1 if self.kernel == 3 else 0,
                    use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3)(x)


class SCBlock(nn.Module):
    """Self-calibrated block (reference scconv.py:28-85): a light 2-conv
    branch + a heavy branch gated by a pooled self-calibration map."""
    channels: int
    ds_padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.channels // 2
        l0 = nn.relu(_ConvBN(h, 1)(x, train))
        l1 = nn.relu(_ConvBN(h, 3)(l0, train))
        h0 = nn.relu(_ConvBN(h, 1)(x, train))
        h1 = _ConvBN(h, 3)(h0, train)
        # ds branch: avg-pool stride 4 -> conv -> resize back
        d = nn.avg_pool(h0, (4, 4), strides=(4, 4),
                        padding=((self.ds_padding, self.ds_padding),) * 2)
        d = _ConvBN(h, 3)(d, train)
        d = jax.image.resize(d, h0.shape, method='nearest') + h0
        h1 = jax.nn.sigmoid(d) * h1
        h2 = _ConvBN(h, 3)(h1, train)
        out = _ConvBN(self.channels, 3)(
            jnp.concatenate([h2, l1], axis=-1), train) + x
        return nn.relu(out)


@NECKS.register('SCConv')
class SCConv(nn.Module):
    """Segmented self-calibrated BEV neck (reference scconv.py:87-197)."""
    num_input_features: int = 256
    num_proj_features: int = 128
    chn_per_segment: Sequence[int] = (256, 256, 256)
    blocks_per_segment: Sequence[int] = (3, 3, 3)
    ds_rates: Sequence[int] = (1, 2, 2)
    us_rates: Sequence[int] = (1, 2, 4)
    ds_paddings: Sequence[int] = (0, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_seg = len(self.chn_per_segment)
        outs = []
        for i in range(num_seg):
            x = nn.relu(_ConvBN(self.chn_per_segment[i], 3,
                                stride=self.ds_rates[i])(x, train))
            for _ in range(self.blocks_per_segment[i]):
                x = SCBlock(self.chn_per_segment[i],
                            self.ds_paddings[i])(x, train)
            if i < num_seg - 1:
                if self.us_rates[i] > 1:
                    o = nn.ConvTranspose(
                        self.num_proj_features,
                        (self.us_rates[i], self.us_rates[i]),
                        strides=(self.us_rates[i], self.us_rates[i]),
                        use_bias=False)(x)
                else:
                    o = nn.Conv(self.num_proj_features, (1, 1),
                                use_bias=False)(x)
                o = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3)(o)
                outs.append(nn.relu(o))
            else:
                o = nn.ConvTranspose(
                    self.num_proj_features,
                    (self.us_rates[i], self.us_rates[i]),
                    strides=(self.us_rates[i], self.us_rates[i]),
                    use_bias=False)(x)
                o = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3)(o)
                outs.append(nn.relu(o))
        return jnp.concatenate(outs, axis=-1)
