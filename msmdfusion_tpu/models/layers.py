"""Shared flax building blocks (channels-last dense convs, masked BN).

TPU-native equivalents of the mmcv ConvModule / BN layers the reference
assembles via build_conv_layer/build_norm_layer. Dense tensors are NHWC
(XLA's preferred TPU conv layout) instead of torch NCHW; BatchNorm follows
the torch momentum convention (new = (1-m)*old + m*batch) so reference
configs (momentum=0.01) carry over unchanged. MaskedBatchNorm is the
BN1d-over-sparse-rows equivalent: moments are computed over valid rows only,
and under a data-parallel pjit mesh the global mean IS the cross-replica
sync (the reference needs an explicit all-gather NaiveSyncBatchNorm,
mmdet3d/ops/norm.py:10-133 — here XLA's GSPMD gives it for free).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv*/Linear default init: kaiming_uniform(a=sqrt(5)) ==
# uniform(+-sqrt(1/fan_in))
torch_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_in', 'uniform')
kaiming_init = nn.initializers.variance_scaling(2.0, 'fan_in', 'normal')


def get_activation(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    return {
        'relu': jax.nn.relu,
        'gelu': jax.nn.gelu,
        'silu': jax.nn.silu,
        'sigmoid': jax.nn.sigmoid,
    }[name.lower()]


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the leading axes with an optional row validity mask.

    Torch conventions: momentum is the update fraction of the batch moment;
    running var stores the unbiased estimate; normalization uses biased var.
    """
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 fold: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))

        if fold:
            # eval-mode affine, returned for fusion into a conv epilogue:
            # y = x*s + b with s = gamma*rsqrt(var+eps), b = beta - mean*s
            # (x is only consulted for the channel count)
            assert not train, 'fold is an inference-only transformation'
            s = scale * jax.lax.rsqrt(ra_var.value + self.eps)
            return s, bias - ra_mean.value * s

        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                count = jnp.prod(jnp.asarray(x.shape[:-1], jnp.float32))
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
            else:
                w = mask.astype(jnp.float32)[..., None]
                count = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xf * w, axis=reduce_axes) / count
                var = jnp.sum(((xf - mean) ** 2) * w, axis=reduce_axes) / count
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0)
        return y.astype(x.dtype)


class ConvModule(nn.Module):
    """Conv2d + (BN) + (act), NHWC. Mirrors mmcv ConvModule semantics."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = False
    norm: bool = True
    norm_eps: float = 1e-5
    norm_momentum: float = 0.1
    act: Optional[str] = 'relu'
    use_deconv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size
        ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
        st = self.strides
        st = (st, st) if isinstance(st, int) else tuple(st)
        dil = self.dilation
        dil = (dil, dil) if isinstance(dil, int) else tuple(dil)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad * dil[0], pad * dil[0]), (pad * dil[1], pad * dil[1])]
        elif isinstance(pad, (tuple, list)):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        if self.use_deconv:
            x = nn.ConvTranspose(
                self.features, ks, strides=st, padding='SAME',
                use_bias=self.use_bias, kernel_init=torch_conv_init)(x)
        else:
            x = nn.Conv(self.features, ks, strides=st, padding=pad,
                        kernel_dilation=dil, use_bias=self.use_bias,
                        kernel_init=torch_conv_init)(x)
        if self.norm:
            x = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps)(x, train=train)
        fn = get_activation(self.act)
        if fn is not None:
            x = fn(x)
        return x


class MLP(nn.Module):
    """Linear stack with optional activations (torch-default init)."""
    features: Sequence[int]
    act: Optional[str] = 'relu'
    final_act: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fn = get_activation(self.act)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias,
                         kernel_init=torch_conv_init)(x)
            if fn is not None and (i < len(self.features) - 1 or self.final_act):
                x = fn(x)
        return x
