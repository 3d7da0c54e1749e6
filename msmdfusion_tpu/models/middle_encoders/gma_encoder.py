"""Gated Modality-Aware multimodal sparse encoder (GMA-Conv).

TPU-native re-design of
mmdet3d/models/middle_encoders/sparse_multimodal_encoder_painting.py:99-459
(``SparseMultiModalEncoderPaint``). Per stage:

1. **Modality split** (reference voxel_modality_split, detectors/MSMDFusion.py
   :251-325 + numba type_assign :27-45): both voxel sets obey the sorted-key
   invariant, so the {3D-only, 2D-only, mixed} partition is two vectorized
   ``searchsorted`` membership tests — no CPU sync, no per-batch loop.
2. **2D-orphan gating** (reference fps_NN_fast :276-323): each 2D-only voxel
   inherits the cross-gate of a nearby 3D voxel. The reference approximates
   nearest-neighbor search with FPS(2048) representatives + ball-query
   clusters (two CUDA kernels + a python batch loop); here representatives
   are a deterministic strided subsample of the 2D-only voxels and both
   distance fields are MXU matmuls ([reps, K3] and [K2, reps]) — same
   approximation family, no sequential FPS loop.
3. **Gating**: mixed 2D features scaled by gate(3D feat); orphan 2D features
   scaled by cross_gate(NN 3D feat | dummy embedding) (:372-397).
4. **Grouped convs** (:411-415): 3D-only rows get a SubM conv; 2D-only rows
   are zero-padded left; both reference-declared 2D/mixed conv blocks exist
   but are unused on the mixed path (matching actual reference behavior).
5. **Union + aggregation** SparseBasicBlock, strided downscale, cross-stage
   ``sparse_add`` (:420-457).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse.conv import downsample_out_coords
from ...ops.nn_argmin import masked_nn
from ...ops.sparse.tensor import (INT_MAX, SparseTensor,
                                  lookup_sorted_pair, make_sparse_tensor,
                                  sparse_add)
from ...registry import MIDDLE_ENCODERS
from ..layers import MLP, torch_conv_init
from ..sparse_blocks import SparseBasicBlock, SparseConvBlock


def modality_split(voxel_3d: SparseTensor, voxel_2d: SparseTensor):
    """Partition two sorted coordinate sets into only/mixed groups.

    Returns dict with row masks ``only_3d``/``only_2d``/``mix_3d``/``mix_2d``
    and ``mix_2d_row_for_3d`` [K3] (row in the 2D tensor holding the same
    coord, -1 if not mixed).
    """
    # one merge-sort intersect replaces two dense hash tables (the 1440-grid
    # tables cost ~18ms + 340MB each to build; lookup_sorted_pair is ~2ms)
    row_in_2d, row_in_3d = lookup_sorted_pair(voxel_3d.keys, voxel_2d.keys)
    mix_3d = (row_in_2d >= 0) & voxel_3d.valid
    mix_2d = (row_in_3d >= 0) & voxel_2d.valid
    return {
        'only_3d': voxel_3d.valid & ~mix_3d,
        'only_2d': voxel_2d.valid & ~mix_2d,
        'mix_3d': mix_3d,
        'mix_2d': mix_2d,
        'mix_2d_row_for_3d': jnp.where(mix_3d, row_in_2d, -1),
        'mix_3d_row_for_2d': jnp.where(mix_2d, row_in_3d, -1),
    }


def approx_nn_3d(query_coords, query_valid, key_coords, key_valid,
                 num_reps: int, radius: float, dist_thresh: float):
    """Representative-based approximate NN from 2D-only voxels to 3D voxels.

    All distances in voxel-index space, matching the reference's use of
    integer coords (sparse_multimodal_encoder_painting.py:351-364). Batch
    separation is enforced by pushing cross-batch distances to +inf.

    Returns [K2] int32 row index into key rows, -1 where unassigned.
    """
    q = query_coords[:, 1:].astype(jnp.float32)          # [K2, 3] (z, y, x)
    k = key_coords[:, 1:].astype(jnp.float32)            # [K3, 3]
    qb = query_coords[:, 0]
    kb = key_coords[:, 0]
    k2 = q.shape[0]

    # deterministic strided subsample of valid queries as representatives
    order = jnp.argsort(~query_valid)                    # valid rows first
    stride = max(k2 // num_reps, 1)
    rep_rows = order[::stride][:num_reps]                # [R]
    reps = q[rep_rows]
    reps_b = qb[rep_rows]
    reps_valid = query_valid[rep_rows]

    # both directions run through the fused distance+argmin kernel — the
    # [A, B] fp32 distance matrices (~1.3GB each at full scale) never
    # materialize in HBM (ops/nn_argmin.py)
    nn_row, nn_d2 = masked_nn(reps, reps_b, k, kb, key_valid)
    rep_ok = reps_valid & (jnp.sqrt(nn_d2) < dist_thresh)

    # each query joins its nearest representative within `radius`
    best_rep, best_d2 = masked_nn(q, qb, reps, reps_b, reps_valid)
    safe_rep = jnp.maximum(best_rep, 0)
    assigned = (query_valid & (best_rep >= 0)
                & (jnp.sqrt(best_d2) <= radius) & rep_ok[safe_rep])
    return jnp.where(assigned, nn_row[safe_rep], -1)


def exact_nn_3d(query_coords, query_valid, key_coords, key_valid,
                dist_thresh: float):
    """Exact nearest-3D-voxel oracle (what the reference's FPS+ball-query
    pipeline approximates): the true NN key within ``dist_thresh``.

    Ablation/test path — selected with ``MSMD_GMA_NN=exact`` so the
    detection-level A/B (tests/test_gma_detection_ab.py) can measure the
    box-output delta of the approximation against the exact assignment.
    """
    q = query_coords[:, 1:].astype(jnp.float32)
    k = key_coords[:, 1:].astype(jnp.float32)
    nn_row, nn_d2 = masked_nn(q, query_coords[:, 0], k, key_coords[:, 0],
                              key_valid)
    ok = query_valid & (nn_row >= 0) & (jnp.sqrt(nn_d2) < dist_thresh)
    return jnp.where(ok, nn_row, -1)


@MIDDLE_ENCODERS.register('SparseMultiModalEncoderPaint')
class SparseMultiModalEncoderPaint(nn.Module):
    in_channels_3D: Sequence[int] = (16, 32, 64, 128)
    in_channels_2D: Sequence[int] = (64, 64, 64, 64)
    out_channels: Sequence[int] = (32, 64, 128, 128)
    padding: Sequence[Any] = (1, 1, (0, 1, 1), 0)
    down_kernel_size: Sequence[Any] = (3, 3, 3, (3, 1, 1))
    down_stride: Sequence[Any] = (2, 2, 2, (2, 1, 1))
    order: Tuple[str, ...] = ('conv', 'norm', 'act')
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01
    # per-stage output capacities of the downscale convs
    stage_capacities: Optional[Sequence[int]] = None
    # per-stage row budgets for the 3D/2D union fed to the aggregation
    # block. The naive union is v3.capacity + v2.capacity rows, but mixed
    # voxels occupy ONE union row while consuming one row of each input —
    # on realistic scenes (>30% of 2D voxels mixed) the union occupancy
    # sits well under the sum. Aggregation-conv cost scales linearly with
    # this capacity, so right-sizing it from the occupancy gauges
    # (occ.make[gma_union_*], bench MSMD_BENCH_GAUGES=1) directly buys
    # device time. Drops (only ever the largest-key valid rows) are
    # counted at sparse.make.capacity[gma_union_*].
    union_capacities: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, voxel_3d_list, voxel_2d_list, fps_num_list, radius_list,
                 max_cluster_samples_list, dist_thresh_list,
                 train: bool = False, shared_plans=None):
        """shared_plans: optional per-stage subm MatchPlans for the
        voxel_3d_list coordinate sets (the lidar encoder's rulebooks).
        When given, the grouped only-3D convs skip their own plan+rows
        build: features are zero outside the only-3D subset, so matched
        neighbors from the full set contribute exactly zero and the
        subset conv result is unchanged (spconv cross-module indice_key
        reuse, reference ops/sparse_block.py:159)."""
        stage_outs: List[SparseTensor] = []
        for i in range(len(voxel_2d_list)):
            v3, v2 = voxel_3d_list[i], voxel_2d_list[i]
            split = modality_split(v3, v2)
            c3 = self.in_channels_3D[i]
            c2 = self.in_channels_2D[i]

            # ---- orphan 2D gating via approximate NN 3D voxel ----
            # MSMD_GMA_NN=exact swaps in the exact-NN oracle (trace-time
            # switch; used by the detection-level A/B test)
            if os.environ.get('MSMD_GMA_NN', 'approx') == 'exact':
                nn_row = exact_nn_3d(v2.coords, split['only_2d'], v3.coords,
                                     v3.valid, dist_thresh_list[i])
            else:
                nn_row = approx_nn_3d(v2.coords, split['only_2d'], v3.coords,
                                      v3.valid, fps_num_list[i],
                                      radius_list[i], dist_thresh_list[i])
            cross_gate = MLP((c2,), final_act=True,
                             name=f'cross_gate_{i}')
            # dummy embedding row for unassigned orphans (reference uses a
            # fresh uniform sample each step, :372; a learned row is the
            # deterministic equivalent)
            dummy = self.param(f'dummy_embedding_{i}',
                               nn.initializers.uniform(1.0), (c3,))
            # MSMD_GMA_DUMMY=random:<seed> replaces the learned row with a
            # fresh uniform sample (the reference draws one per step,
            # sparse_multimodal_encoder_painting.py:372) — ablation knob
            # for the detection-level A/B; the param itself always exists
            # so checkpoints are unaffected.
            dummy_env = os.environ.get('MSMD_GMA_DUMMY', 'learned')
            if dummy_env.startswith('random'):
                seed = int(dummy_env.split(':')[1]) if ':' in dummy_env else 0
                dummy = jax.random.uniform(
                    jax.random.PRNGKey(seed * 8 + i), (c3,))
            nn_feat = jnp.where(
                (nn_row >= 0)[:, None],
                jnp.take(v3.features, jnp.maximum(nn_row, 0), axis=0),
                dummy[None, :])
            gated_2d = cross_gate(nn_feat) * v2.features
            feats_2d = jnp.where(split['only_2d'][:, None], gated_2d,
                                 v2.features)

            # ---- mixed gating: gate(3D feat) * 2D feat ----
            gate = MLP((c2,), final_act=True, name=f'gate_{i}')
            feat_3d_for_2d = jnp.take(
                v3.features, jnp.maximum(split['mix_3d_row_for_2d'], 0),
                axis=0)
            mixed_gated = gate(feat_3d_for_2d) * feats_2d
            feats_2d = jnp.where(split['mix_2d'][:, None], mixed_gated,
                                 feats_2d)

            # ---- grouped conv on only-3D rows ----
            # keys stay UNMASKED: the conv is linear, so matched neighbors
            # outside the only-3D subset contribute w @ 0 = 0 and the full
            # v3 rulebook (shared with the lidar encoder when available)
            # computes the identical subset conv
            only_3d_st = SparseTensor(
                features=jnp.where(split['only_3d'][:, None], v3.features, 0),
                coords=v3.coords,
                valid=split['only_3d'],
                keys=v3.keys,
                spatial_shape=v3.spatial_shape, batch_size=v3.batch_size)
            grouped_cache = {}
            if (shared_plans is not None and shared_plans[i] is not None
                    # the stage mapping (encode_features[i] <-> subm{i+1})
                    # holds for block_type='basicblock' encoders; a capacity
                    # mismatch means a different stage layout — skip sharing
                    and shared_plans[i].k_out == v3.capacity):
                grouped_cache[('subm', f'subm3D_{i + 1}')] = shared_plans[i]
            only_3d_st, _ = SparseConvBlock(
                c3, 3, padding=1, conv_type='SubMConv3d',
                indice_key=f'subm3D_{i + 1}', order=self.order,
                norm_eps=self.norm_eps, norm_momentum=self.norm_momentum,
                name=f'grouped_3d_{i}')(only_3d_st, grouped_cache,
                                        train=train)

            # ---- union: only-3D [f3|0], only-2D [0|f2], mixed [f3|g*f2] ----
            pad3 = jnp.zeros((v3.capacity, c2), v3.features.dtype)
            f3_rows = jnp.where(
                split['mix_3d'][:, None],
                jnp.concatenate([
                    v3.features,
                    jnp.take(feats_2d,
                             jnp.maximum(split['mix_2d_row_for_3d'], 0),
                             axis=0)], axis=-1),
                jnp.concatenate([only_3d_st.features, pad3], axis=-1))
            f3_valid = v3.valid
            pad2 = jnp.zeros((v2.capacity, c3), v2.features.dtype)
            f2_rows = jnp.concatenate([pad2, feats_2d], axis=-1)
            f2_valid = split['only_2d']  # mixed 2D rows already merged above

            union_feats = jnp.concatenate([f3_rows, f2_rows], axis=0)
            union_coords = jnp.concatenate([v3.coords, v2.coords], axis=0)
            union_valid = jnp.concatenate([f3_valid, f2_valid])
            union_cap = (self.union_capacities[i]
                         if self.union_capacities is not None else None)
            unified = make_sparse_tensor(
                union_feats, union_coords, union_valid, v3.spatial_shape,
                v3.batch_size, capacity=union_cap, site=f'gma_union_{i}')

            cache: Dict[str, Any] = {}
            unified, cache = SparseBasicBlock(
                c3 + c2, indice_key=f'agg_{i + 1}', norm_eps=self.norm_eps,
                norm_momentum=self.norm_momentum,
                name=f'aggregation_{i}')(unified, cache, train=train)

            if i > 0:
                # the cross-stage sum's key set is measured (gauges) to
                # coincide with the previous downscale OUTPUT set — the
                # strided-conv dilation of stage i-1's union covers stage
                # i's union keys — so the previous stage's capacity, not
                # the (smaller) union capacity, is the honest output size
                prev = stage_outs[i - 1]
                unified = sparse_add(unified, prev,
                                     capacity=max(unified.capacity,
                                                  prev.capacity))
                cache = {}
            out_cap = (self.stage_capacities[i]
                       if self.stage_capacities is not None else None)
            down, cache = SparseConvBlock(
                self.out_channels[i] + c2,
                kernel_size=self.down_kernel_size[i],
                stride=self.down_stride[i], padding=self.padding[i],
                conv_type='SparseConv3d', indice_key=f'spconv_ds_{i + 1}',
                out_capacity=out_cap, order=self.order,
                norm_eps=self.norm_eps, norm_momentum=self.norm_momentum,
                name=f'downscale_{i}')(unified, cache, train=train)
            stage_outs.append(down)
        return stage_outs
