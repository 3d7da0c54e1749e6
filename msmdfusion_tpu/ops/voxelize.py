"""Hard / dynamic voxelization with static shapes (sort + segment ops).

TPU-native equivalent of the reference CUDA voxelization
(mmdet3d/ops/voxel/src/voxelization_cuda.cu:25-150 ``hard_voxelize``,
``dynamic_voxelize``; Python wrapper mmdet3d/ops/voxel/voxelize.py:10-123) and
``DynamicScatter`` (mmdet3d/ops/voxel/scatter_points.py:10-107).

Instead of atomic hash-table insertion, points are bucketed by a stable sort
of linearized voxel keys; voxel slots are assigned in order of first point
occurrence, matching the reference's first-come-first-serve semantics
(voxelization_cuda.cu:106-150 ``point_to_voxelidx``), so truncation at
``max_voxels``/``max_points`` keeps the same points. Everything is fixed
capacity + validity mask, so it compiles once under jit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils import overflow

INT_MAX = jnp.iinfo(jnp.int32).max


class VoxelizationResult(NamedTuple):
    """Fixed-capacity voxelization output.

    voxels:     [V, P, F] per-voxel point buffers (zero padded).
    num_points: [V] valid point count per voxel (<= P).
    coors:      [V, 3] int32 (z, y, x); -1 rows for empty slots.
    valid:      [V] bool voxel mask.
    """
    voxels: jax.Array
    num_points: jax.Array
    coors: jax.Array
    valid: jax.Array


def compute_voxel_coords(points, voxel_size, point_cloud_range):
    """Per-point integer voxel coords (z, y, x) + in-range mask.

    Args:
        points: [N, F] with xyz in the first 3 columns.
    Returns:
        coords [N, 3] int32 (z, y, x), in_range [N] bool, grid (Z, Y, X).
    """
    voxel_size = jnp.asarray(voxel_size, dtype=points.dtype)
    pc_range = jnp.asarray(point_cloud_range, dtype=points.dtype)
    grid = jnp.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(jnp.int32)
    cxyz = jnp.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((cxyz >= 0) & (cxyz < grid), axis=-1)
    coords_zyx = cxyz[:, ::-1]
    return coords_zyx, in_range, grid


def _linearize(coords_zyx, grid_zyx):
    """Pack (z, y, x) into one int32 key. grid_zyx = (Z, Y, X) static ints."""
    z, y, x = coords_zyx[:, 0], coords_zyx[:, 1], coords_zyx[:, 2]
    return (z * grid_zyx[1] + y) * grid_zyx[2] + x


def hard_voxelize(points, point_mask, voxel_size, point_cloud_range,
                  max_points: int, max_voxels: int) -> VoxelizationResult:
    """Bucket points into fixed-capacity voxels.

    Args:
        points: [N, F] padded point cloud (xyz first).
        point_mask: [N] bool validity of padded rows.
        max_points: per-voxel point capacity (reference max_num_points).
        max_voxels: voxel capacity (reference max_voxels).
    """
    n = points.shape[0]
    coords, in_range, grid = compute_voxel_coords(
        points, voxel_size, point_cloud_range)
    # grid must be static for key packing: derive from python floats
    vs = tuple(float(v) for v in voxel_size)
    pcr = tuple(float(v) for v in point_cloud_range)
    gz = int(round((pcr[5] - pcr[2]) / vs[2]))
    gy = int(round((pcr[4] - pcr[1]) / vs[1]))
    gx = int(round((pcr[3] - pcr[0]) / vs[0]))
    valid_pt = in_range & point_mask

    key = jnp.where(valid_pt, _linearize(coords, (gz, gy, gx)), INT_MAX)
    order = jnp.argsort(key)                      # stable: keeps point order
    skey = key[order]
    sorted_valid = skey != INT_MAX

    head = jnp.concatenate(
        [sorted_valid[:1], (skey[1:] != skey[:-1]) & sorted_valid[1:]])
    group_id = jnp.cumsum(head.astype(jnp.int32)) - 1      # [N] sorted-order
    group_id = jnp.where(sorted_valid, group_id, n - 1)     # park invalid

    pos = jnp.arange(n, dtype=jnp.int32)
    # first original-index and first sorted-position of each group
    first_orig = jax.ops.segment_min(
        jnp.where(sorted_valid, order, INT_MAX), group_id, num_segments=n)
    start_pos = jax.ops.segment_min(
        jnp.where(sorted_valid, pos, INT_MAX), group_id, num_segments=n)

    # slot assignment in order of first point occurrence
    group_rank = jnp.argsort(jnp.argsort(first_orig))      # rank by first idx
    slot = group_rank[group_id]                             # [N]
    in_cap_voxel = slot < max_voxels

    # per-point rank inside its voxel (original arrival order preserved by
    # the stable sort)
    rank_in_voxel = pos - start_pos[group_id]
    keep = sorted_valid & in_cap_voxel & (rank_in_voxel < max_points)
    # both caps exist with identical semantics in the reference
    # (voxelization_cuda.cu max_voxels / max_points), so these drops match
    # reference behavior — counted for observability, not asserted zero
    overflow.record('voxelize.hard.point_truncation',
                    jnp.sum(sorted_valid & in_cap_voxel
                            & (rank_in_voxel >= max_points)))
    overflow.record('voxelize.hard.voxel_cap',
                    jnp.sum(head & ~in_cap_voxel))

    f = points.shape[1]
    flat_idx = slot * max_points + rank_in_voxel
    flat_idx = jnp.where(keep, flat_idx, max_voxels * max_points)  # spill row
    voxels = jnp.zeros((max_voxels * max_points + 1, f), points.dtype)
    voxels = voxels.at[flat_idx].set(points[order], mode='drop')
    voxels = voxels[:-1].reshape(max_voxels, max_points, f)

    num_points = jax.ops.segment_sum(
        keep.astype(jnp.int32), jnp.where(keep, slot, max_voxels),
        num_segments=max_voxels + 1)[:max_voxels]

    coor_slot = jnp.where(head & in_cap_voxel, slot, max_voxels)
    coors = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    coors = coors.at[coor_slot].set(coords[order], mode='drop')
    coors = coors[:-1]
    voxel_valid = num_points > 0
    coors = jnp.where(voxel_valid[:, None], coors, -1)
    return VoxelizationResult(voxels, num_points, coors, voxel_valid)


def dynamic_voxelize(points, point_mask, voxel_size, point_cloud_range):
    """Per-point voxel coords only; out-of-range/masked points get -1.

    Reference: dynamic_voxelize kernel (voxelization_cuda.cu:64).
    """
    coords, in_range, _ = compute_voxel_coords(
        points, voxel_size, point_cloud_range)
    valid = in_range & point_mask
    return jnp.where(valid[:, None], coords, -1), valid


def dynamic_scatter(feats, coords_zyx, valid, grid_zyx: Tuple[int, int, int],
                    max_voxels: int, mode: str = 'mean'):
    """Reduce per-point features into unique voxels (DynamicScatter).

    Args:
        feats: [N, C] point features.
        coords_zyx: [N, 3] int voxel coords.
        valid: [N] bool.
        grid_zyx: static (Z, Y, X).
        max_voxels: output capacity.
        mode: 'mean' or 'max'.
    Returns:
        (voxel_feats [V, C], voxel_coors [V, 3], voxel_valid [V],
         point2voxel [N] slot index or -1).
    """
    n = feats.shape[0]
    key = jnp.where(valid, _linearize(coords_zyx, grid_zyx), INT_MAX)
    order = jnp.argsort(key)
    skey = key[order]
    sorted_valid = skey != INT_MAX
    head = jnp.concatenate(
        [sorted_valid[:1], (skey[1:] != skey[:-1]) & sorted_valid[1:]])
    group_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    group_id = jnp.where(sorted_valid, group_id, n - 1)

    first_orig = jax.ops.segment_min(
        jnp.where(sorted_valid, order, INT_MAX), group_id, num_segments=n)
    group_rank = jnp.argsort(jnp.argsort(first_orig))
    slot = group_rank[group_id]
    keep = sorted_valid & (slot < max_voxels)
    # framework capacity (reference DynamicScatter has no voxel cap)
    overflow.record('voxelize.dynamic_scatter.voxel_cap',
                    jnp.sum(head) - jnp.minimum(jnp.sum(head), max_voxels))
    seg = jnp.where(keep, slot, max_voxels)

    sorted_feats = feats[order]
    if mode == 'mean':
        # counts ride the sums' scatter (scatter cost is per ROW)
        f = feats.shape[1]
        aug = jnp.concatenate(
            [jnp.where(keep[:, None], sorted_feats, 0),
             keep.astype(feats.dtype)[:, None]], axis=1)
        sums_counts = jax.ops.segment_sum(
            aug, seg, num_segments=max_voxels + 1)[:max_voxels]
        sums = sums_counts[:, :f]
        counts = sums_counts[:, f]
        voxel_feats = sums / jnp.maximum(counts[:, None], 1)
        voxel_valid = counts > 0
    elif mode == 'max':
        voxel_feats = jax.ops.segment_max(
            jnp.where(keep[:, None], sorted_feats, -jnp.inf), seg,
            num_segments=max_voxels + 1)[:max_voxels]
        counts = jax.ops.segment_sum(
            keep.astype(jnp.int32), seg, num_segments=max_voxels + 1)[:max_voxels]
        voxel_valid = counts > 0
        voxel_feats = jnp.where(voxel_valid[:, None], voxel_feats, 0)
    else:
        raise ValueError(mode)

    head_slot = jnp.where(head & (slot < max_voxels), slot, max_voxels)
    coors = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    coors = coors.at[head_slot].set(coords_zyx[order], mode='drop')
    coors = coors[:-1]
    coors = jnp.where(voxel_valid[:, None], coors, -1)

    # per-point voxel slot, scattered back to original order
    point_slot = jnp.full((n,), -1, jnp.int32)
    point_slot = point_slot.at[order].set(jnp.where(keep, slot, -1))
    return voxel_feats, coors, voxel_valid, point_slot


def voxelize_mean_batch(points, point_mask, voxel_size, point_cloud_range,
                        max_voxels_total: int):
    """Fused batched voxelize + mean-VFE with key-sorted voxel ordering.

    The fast path for HardSimpleVFE consumers: one stable argsort of packed
    (b, z, y, x) keys over the whole batch, segment-mean of features, no
    per-voxel point buffers and no arrival-order bookkeeping (the reference
    semantics' first-come ordering only matters under max_voxels overflow —
    here overflow drops the highest keys deterministically). Output rows are
    ascending in key, so the sparse encoder can skip its own sort
    (``assume_sorted=True``).

    Args:
        points: [B, N, F]; point_mask: [B, N].
        max_voxels_total: global voxel capacity (across the batch).
    Returns:
        feats [V, F], coors [V, 4] (b,z,y,x), valid [V].
    """
    b, n, f = points.shape
    flat = points.reshape(b * n, f)
    mask = point_mask.reshape(b * n)
    coords, in_range, _ = compute_voxel_coords(
        flat, voxel_size, point_cloud_range)
    vs = tuple(float(v) for v in voxel_size)
    pcr = tuple(float(v) for v in point_cloud_range)
    gz = int(round((pcr[5] - pcr[2]) / vs[2]))
    gy = int(round((pcr[4] - pcr[1]) / vs[1]))
    gx = int(round((pcr[3] - pcr[0]) / vs[0]))
    assert b * gz * gy * gx < 2 ** 31
    batch_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0).reshape(-1)
    valid_pt = in_range & mask
    key = (batch_ids * gz + coords[:, 0]) * gy * gx + \
        coords[:, 1] * gx + coords[:, 2]
    key = jnp.where(valid_pt, key, INT_MAX)

    # one sort yields both the sorted keys and the permutation (saves the
    # narrow skey = key[order] gather — one descriptor per element)
    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
    skey, order = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
    sorted_valid = skey != INT_MAX
    head = jnp.concatenate(
        [sorted_valid[:1], (skey[1:] != skey[:-1]) & sorted_valid[1:]])
    slot = jnp.cumsum(head.astype(jnp.int32)) - 1
    v = max_voxels_total
    # framework-global cap (reference caps per sample); overflow here drops
    # whole voxels the reference would have kept
    overflow.record('voxelize.mean_batch.voxel_cap',
                    jnp.maximum(jnp.sum(head) - v, 0))
    overflow.gauge('occ.voxelize_mean', jnp.sum(head))
    seg = jnp.where(sorted_valid & (slot < v), slot, v)

    sorted_feats = flat[order]
    # seg is non-decreasing (cumsum slots, INT_MAX/overflow parked at the
    # terminal v) -> sorted-segment fast paths. TPU scatter-adds retire at
    # a fixed ROW rate (~10 ns/row regardless of width), so the count
    # column rides the same scatter as the feature sums instead of paying
    # a second full row pass.
    keep_col = (seg < v).astype(flat.dtype)
    aug = jnp.concatenate(
        [jnp.where((seg < v)[:, None], sorted_feats, 0),
         keep_col[:, None]], axis=1)
    sums_counts = jax.ops.segment_sum(
        aug, seg, num_segments=v + 1, indices_are_sorted=True)[:v]
    sums = sums_counts[:, :f]
    counts = sums_counts[:, f]
    feats = sums / jnp.maximum(counts[:, None], 1)
    voxel_valid = counts > 0

    # compaction-by-sort: the j-th unique (head) key lands in slot j. An
    # i32 sort of b*n elements replaces the previous 1-wide scatter, which
    # retired ~1 element/cycle (~2.8 ms/frame across the 4 fg scales)
    out_keys = jax.lax.sort(jnp.where(head, skey, INT_MAX),
                            is_stable=False)
    if out_keys.shape[0] >= v:
        out_keys = out_keys[:v]
    else:  # capacity exceeds the point count: pad the invalid tail
        out_keys = jnp.concatenate(
            [out_keys,
             jnp.full((v - out_keys.shape[0],), INT_MAX, jnp.int32)])
    xc = out_keys % gx
    rest = out_keys // gx
    yc = rest % gy
    rest = rest // gy
    zc = rest % gz
    bc = rest // gz
    coors = jnp.stack([bc, zc, yc, xc], axis=-1)
    coors = jnp.where(voxel_valid[:, None], coors, -1)
    feats = jnp.where(voxel_valid[:, None], feats, 0)
    return feats, coors, voxel_valid


def voxelize_batch(points, point_mask, voxel_size, point_cloud_range,
                   max_points: int, max_voxels: int):
    """Voxelize a batch and emit concatenated (b, z, y, x) coords.

    Mirrors MVXTwoStageDetector.voxelize's per-sample loop + batch-id pad
    (mmdet3d/models/detectors/mvx_two_stage.py:248-273) as a single vmap.

    Args:
        points: [B, N, F], point_mask: [B, N].
    Returns:
        voxels [B*V, P, F], num_points [B*V], coors [B*V, 4] (b,z,y,x),
        valid [B*V].
    """
    fn = functools.partial(
        hard_voxelize, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range, max_points=max_points,
        max_voxels=max_voxels)
    res = jax.vmap(fn)(points, point_mask)
    b, v = res.voxels.shape[0], res.voxels.shape[1]
    batch_ids = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, v))
    coors = jnp.concatenate([batch_ids[..., None], res.coors], axis=-1)
    coors = jnp.where(res.valid[..., None], coors, -1)
    return (res.voxels.reshape(b * v, *res.voxels.shape[2:]),
            res.num_points.reshape(b * v),
            coors.reshape(b * v, 4),
            res.valid.reshape(b * v))
