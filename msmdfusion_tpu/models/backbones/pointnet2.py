"""PointNet++ set-abstraction backbone (SSG/MSG).

TPU-native equivalents of mmdet3d/models/backbones/pointnet2_sa_{ssg,msg}.py
and the SA/FP modules (mmdet3d/ops/pointnet_modules/point_sa_module.py:230,
point_fp_module.py:77): FPS sampling, (multi-radius) ball-query grouping,
per-group MLP + max pooling, and feature propagation via 3-NN interpolation —
all on fixed-capacity masked point sets.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sampling import (ball_query, furthest_point_sample, group_points,
                             three_interpolate, three_nn)
from ...registry import BACKBONES
from ..layers import MaskedBatchNorm, torch_conv_init


class PointSAModule(nn.Module):
    """Set abstraction: FPS -> ball query -> shared MLP -> max pool."""
    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]
    use_xyz: bool = True
    norm_eps: float = 1e-5
    norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, xyz, features, valid, train: bool = False,
                 new_xyz=None, new_valid=None):
        """xyz [N, 3], features [N, C] or None, valid [N].

        new_xyz/new_valid: aggregate around these query points instead of
        FPS-sampling them (3DSSD aggregates around shifted candidates).
        Returns (new_xyz [S, 3], new_features [S, C'], new_valid [S]).
        """
        if new_xyz is None:
            idx = furthest_point_sample(xyz, self.num_point, valid)
            new_xyz = jnp.take(xyz, idx, axis=0)
            new_valid = jnp.take(valid, idx)

        group_idx = ball_query(self.radius, self.num_sample, xyz, new_xyz,
                               xyz_valid=valid)            # [S, K]
        grouped_xyz = group_points(xyz, group_idx) - new_xyz[:, None, :]
        parts = [grouped_xyz]
        if features is not None:
            parts.append(group_points(features, group_idx))
        x = jnp.concatenate(parts, axis=-1)                 # [S, K, C_in]
        member = (group_idx >= 0)
        for i, c in enumerate(self.mlp_channels):
            x = nn.Dense(c, use_bias=False, kernel_init=torch_conv_init,
                         name=f'mlp_{i}')(x)
            x = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps, name=f'bn_{i}')(
                x, mask=member, train=train)
            x = jnp.maximum(x, 0)
        x = jnp.where(member[..., None], x, -jnp.inf)
        pooled = jnp.max(x, axis=1)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0)
        pooled = jnp.where(new_valid[:, None], pooled, 0)
        return new_xyz, pooled, new_valid


class PointFPModule(nn.Module):
    """Feature propagation: 3-NN interpolate + unary MLP."""
    mlp_channels: Sequence[int]
    norm_eps: float = 1e-5
    norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, target_xyz, target_feats, source_xyz, source_feats,
                 target_valid, source_valid, train: bool = False):
        d2, idx = three_nn(target_xyz, source_xyz, source_valid)
        interp = three_interpolate(source_feats, idx, d2)
        parts = [interp]
        if target_feats is not None:
            parts.append(target_feats)
        x = jnp.concatenate(parts, axis=-1)
        for i, c in enumerate(self.mlp_channels):
            x = nn.Dense(c, use_bias=False, kernel_init=torch_conv_init,
                         name=f'mlp_{i}')(x)
            x = MaskedBatchNorm(momentum=self.norm_momentum,
                                eps=self.norm_eps, name=f'bn_{i}')(
                x, mask=target_valid, train=train)
            x = jnp.maximum(x, 0)
        return jnp.where(target_valid[:, None], x, 0)


class PointSAModuleMSG(nn.Module):
    """Multi-scale grouping SA: several radii, concatenated pooled features.

    Reference: mmdet3d/ops/pointnet_modules/point_sa_module.py (MSG path)
    used by pointnet2_sa_msg.py:162 (3DSSD backbone).
    """
    num_point: int
    radii: Sequence[float]
    num_samples: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    norm_eps: float = 1e-5
    norm_momentum: float = 0.1

    @nn.compact
    def __call__(self, xyz, features, valid, train: bool = False):
        idx = furthest_point_sample(xyz, self.num_point, valid)
        new_xyz = jnp.take(xyz, idx, axis=0)
        new_valid = jnp.take(valid, idx)
        pooled_all = []
        for s, (radius, k, mlp) in enumerate(
                zip(self.radii, self.num_samples, self.mlp_channels)):
            group_idx = ball_query(radius, k, xyz, new_xyz, xyz_valid=valid)
            grouped_xyz = group_points(xyz, group_idx) - new_xyz[:, None, :]
            parts = [grouped_xyz]
            if features is not None:
                parts.append(group_points(features, group_idx))
            x = jnp.concatenate(parts, axis=-1)
            member = group_idx >= 0
            for i, c in enumerate(mlp):
                x = nn.Dense(c, use_bias=False, kernel_init=torch_conv_init,
                             name=f'mlp_{s}_{i}')(x)
                x = MaskedBatchNorm(momentum=self.norm_momentum,
                                    eps=self.norm_eps, name=f'bn_{s}_{i}')(
                    x, mask=member, train=train)
                x = jnp.maximum(x, 0)
            x = jnp.where(member[..., None], x, -jnp.inf)
            pooled = jnp.max(x, axis=1)
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0)
            pooled_all.append(pooled)
        out = jnp.concatenate(pooled_all, axis=-1)
        return new_xyz, jnp.where(new_valid[:, None], out, 0), new_valid


@BACKBONES.register('PointNet2SAMSG')
class PointNet2SAMSG(nn.Module):
    """Multi-scale-grouping PointNet++ (3DSSD backbone, no FP decoding).

    Reference: mmdet3d/models/backbones/pointnet2_sa_msg.py:162. Returns the
    last SA level as the head's working point set.
    """
    in_channels: int = 4
    num_points: Sequence[int] = (4096, 512, 256)
    radii: Sequence[Sequence[float]] = (
        (0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8))
    num_samples: Sequence[Sequence[int]] = (
        (32, 32, 64), (32, 32, 32), (32, 32, 32))
    sa_channels: Sequence[Sequence[Sequence[int]]] = (
        ((16, 16, 32), (16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
        ((128, 128, 256), (128, 192, 256), (128, 256, 256)))

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        sa_modules = [
            PointSAModuleMSG(self.num_points[i], self.radii[i],
                             self.num_samples[i], self.sa_channels[i],
                             name=f'sa_{i}')
            for i in range(len(self.num_points))]

        def single(pts, mask):
            xyz = pts[:, :3]
            feats = pts[:, 3:] if pts.shape[1] > 3 else None
            v = mask
            for mod in sa_modules:
                xyz, feats, v = mod(xyz, feats, v, train=train)
            return dict(fp_xyz=xyz, fp_features=feats, fp_valid=v)

        outs = [single(points[i], points_mask[i])
                for i in range(points.shape[0])]
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}


@BACKBONES.register('PointNet2SASSG')
class PointNet2SASSG(nn.Module):
    """Single-scale-grouping PointNet++ with FP decoding."""
    in_channels: int = 4
    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radius: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Sequence[Sequence[int]] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256), (128, 128, 256))
    fp_channels: Sequence[Sequence[int]] = ((256, 256), (256, 256))

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        """points [B, N, 3+f] -> dict of final fp xyz/features/valid."""
        sa_modules = [
            PointSAModule(self.num_points[i], self.radius[i],
                          self.num_samples[i], self.sa_channels[i],
                          name=f'sa_{i}')
            for i in range(len(self.num_points))]
        fp_modules = [PointFPModule(mlp, name=f'fp_{i}')
                      for i, mlp in enumerate(self.fp_channels)]

        def single(pts, mask):
            xyz = pts[:, :3]
            feats = pts[:, 3:] if pts.shape[1] > 3 else None
            sa_xyz, sa_feats, sa_valid = [xyz], [feats], [mask]
            for mod in sa_modules:
                nx, nf, nv = mod(sa_xyz[-1], sa_feats[-1], sa_valid[-1],
                                 train=train)
                sa_xyz.append(nx)
                sa_feats.append(nf)
                sa_valid.append(nv)
            cur_xyz, cur_feats, cur_valid = (sa_xyz[-1], sa_feats[-1],
                                             sa_valid[-1])
            for i, mod in enumerate(fp_modules):
                tgt = len(sa_xyz) - 2 - i
                cur_feats = mod(sa_xyz[tgt], sa_feats[tgt], cur_xyz,
                                cur_feats, sa_valid[tgt], cur_valid,
                                train=train)
                cur_xyz, cur_valid = sa_xyz[tgt], sa_valid[tgt]
            return dict(fp_xyz=cur_xyz, fp_features=cur_feats,
                        fp_valid=cur_valid)

        # per-sample python loop with shared modules (B is small; flax
        # modules can't cross jax.vmap without nn.vmap lifting)
        outs = [single(points[i], points_mask[i])
                for i in range(points.shape[0])]
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}
