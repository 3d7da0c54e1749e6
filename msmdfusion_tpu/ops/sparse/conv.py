"""Sparse 3D convolution as rulebook-free gather-GEMM on sorted voxel keys.

TPU-native equivalent of the reference's spconv stack: rulebook construction
(`get_indice_pairs`, mmdet3d/ops/spconv/ops.py:46-107;
include/spconv/indice.h:20-45) and gather-GEMM-scatter `indice_conv`
(ops/spconv/ops.py:108-128, functional.py:20-100).

Design (idiomatic XLA, no scatter needed):
- **Submanifold conv** (SubMConv3d): output coords == input coords; for each
  kernel tap the neighbor row is found by `searchsorted` on the sorted keys,
  producing a dense neighbor table [T, K]; the conv is an accumulation of
  `take(features)[K, Cin] @ W[t]` over taps — pure gather + MXU matmul.
- **Regular/strided conv** (SparseConv3d): active output coords are the
  sorted-unique of per-input candidates (only taps satisfying the stride
  divisibility generate candidates); the conv then *gathers from the input*
  hash at `out*stride - pad + tap`, so it is scatter-free too.
- Transposed/"inverse" conv reuses the stored output coords of the matching
  downsample (the reference's `indice_key` pairing) — see `inverse_conv`.

Weight layout: [T, Cin, Cout] with taps enumerated in z-major order
(`itertools.product(range(kz), range(ky), range(kx))`) to match spconv's
kernel enumeration for checkpoint-parity.
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tensor import (INT_MAX, SparseTensor, build_hash_table, lookup,
                     make_sparse_tensor, pack_keys, unpack_keys)


def _blocked_cumsum_i32(v: jax.Array) -> jax.Array:
    """Inclusive int32 prefix sum via MXU triangular matmuls.

    1-D cumsums over ~1M elements lower to multi-pass reductions on
    T(1024)-tiled data; two levels of [n, 512] x lower-triangular GEMMs
    (fp32 exact for sums < 2^24) ride the MXU instead. Falls back to
    jnp.cumsum off-TPU or when exactness could overflow fp32.
    """
    n = v.shape[0]
    B = 512
    if jax.default_backend() != 'tpu' or n < 4 * B or n >= (1 << 24):
        return jnp.cumsum(v)
    pad = (-n) % B
    f = jnp.pad(v, (0, pad)).reshape(-1, B).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((B, B), jnp.float32))
    within = jax.lax.dot_general(f, tri, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    block_tot = within[:, -1]
    nb = block_tot.shape[0]
    pad2 = (-nb) % B
    bt = jnp.pad(block_tot, (0, pad2)).reshape(-1, B)
    w2 = jax.lax.dot_general(bt, tri, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t2 = w2[:, -1]
    off2 = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                            jnp.cumsum(t2)[:-1]])
    offsets = (w2 + off2[:, None] - bt).reshape(-1)[:nb]   # exclusive
    out = (within + offsets[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (list, tuple)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def kernel_offsets(kernel_size) -> np.ndarray:
    """[T, 3] z-major tap offsets in input-coordinate deltas (tap - center)."""
    kz, ky, kx = _triple(kernel_size)
    taps = np.array(list(itertools.product(range(kz), range(ky), range(kx))),
                    dtype=np.int32)
    center = np.array([kz // 2, ky // 2, kx // 2], dtype=np.int32)
    return taps - center


def _gather_x_triples(table, base_cells):
    """Gather 3 consecutive table entries per base cell.

    The x-axis is the minor dim of the packed key, so the (dx=-1,0,+1) taps
    of one (dz, dy) group live at consecutive addresses in the 2D hash
    table: fetch the two 16-lane rows that can contain them with vectorized
    row gathers and select the 3 lanes with a one-hot VPU contraction.
    Scalar/narrow gathers run at the gather engine's per-element rate
    (~5 ns/element — 440ms/frame at full scale); 64-byte row gathers are
    ~2 orders of magnitude faster.

    base_cells: [K] int32 (cell of the dx=-1 tap, may be out of range).
    Returns [K, 3] entries (-1 where cell ``base + j`` is out of the grid).
    """
    lanes = table.shape[1]
    num_rows = table.shape[0]
    row = jnp.clip(base_cells // lanes, 0, num_rows - 2)
    # off may be NEGATIVE (base < 0 at the grid corner) or >= 2*lanes (base
    # past the end): the one-hot then matches nothing and the bounds mask
    # below returns -1. Clipping off instead (the old behavior) silently
    # MISALIGNED the triple: out voxels near cell 0 read lanes shifted by
    # |base|, poisoning taps whose own neighbor WAS in bounds.
    off = base_cells - row * lanes
    vals = jnp.concatenate(
        [jnp.take(table, row, axis=0), jnp.take(table, row + 1, axis=0)],
        axis=-1)                                          # [K, 2*lanes]
    idx3 = off[:, None] + jnp.arange(3, dtype=off.dtype)[None, :]  # [K, 3]
    onehot = (idx3[:, :, None] ==
              jnp.arange(2 * lanes, dtype=off.dtype)[None, None, :])
    got = jnp.sum(jnp.where(onehot, vals[:, None, :], 0), axis=-1)
    return jnp.where((idx3 >= 0) & (idx3 < 2 * lanes), got, -1)


def build_subm_neighbor_table(st: SparseTensor, kernel_size) -> jax.Array:
    """Neighbor row table for a submanifold conv: [T, K] int32 (-1 missing).

    This is the TPU analog of the spconv subm rulebook; reuse it across all
    SubM convs sharing an ``indice_key``.
    """
    kz, ky, kx = _triple(kernel_size)
    offsets = kernel_offsets(kernel_size)        # [T, 3]
    coords = st.coords                           # [K, 4]
    z, y, x = st.spatial_shape
    table = build_hash_table(st)

    if table is not None and kx == 3:
        # group taps by (dz, dy); fetch the x-triple with one sliced gather
        zy_offsets = offsets.reshape(kz * ky, kx, 3)[:, 0, :2]  # [G, 2]
        bounds = jnp.array([z, y, x])
        rows_all = []
        for g in range(zy_offsets.shape[0]):
            dz, dy = int(zy_offsets[g, 0]), int(zy_offsets[g, 1])
            nb_zy = coords[:, 1:3] + jnp.array([dz, dy])
            zy_ok = st.valid & jnp.all(
                (nb_zy >= 0) & (nb_zy < bounds[:2]), axis=-1)
            base = st.keys + (dz * y + dy) * x - 1
            triple = _gather_x_triples(table, base)          # [K, 3]
            for j, dx in enumerate((-1, 0, 1)):
                xs = coords[:, 3] + dx
                ok = zy_ok & (xs >= 0) & (xs < x)
                rows_all.append(jnp.where(ok, triple[:, j], -1))
        return jnp.stack(rows_all)                           # [T, K]

    def one_tap(off):
        nb = jnp.concatenate(
            [coords[:, :1], coords[:, 1:] + off[None, :]], axis=-1)
        in_bounds = jnp.all(
            (nb[:, 1:] >= 0) & (nb[:, 1:] < jnp.array([z, y, x])), axis=-1)
        ok = st.valid & in_bounds
        keys = pack_keys(nb, st.spatial_shape, st.batch_size, ok)
        return lookup(st.keys, keys, table)

    return jax.vmap(one_tap, in_axes=0)(jnp.asarray(offsets))


# cap on the [taps_chunk, K, C] gather buffer (bytes) — keeps peak HBM use
# of a conv under control while still batching taps for parallelism
_GATHER_CHUNK_BYTES = 256 * 1024 * 1024


def _tap_chunk(num_taps: int, k: int, cin: int, dtype_bytes: int = 4) -> int:
    per_tap = k * cin * dtype_bytes
    chunk = max(1, _GATHER_CHUNK_BYTES // max(per_tap, 1))
    return min(num_taps, chunk)


def gather_gemm(feats: jax.Array, rows: jax.Array, weights: jax.Array,
                out_valid: jax.Array) -> jax.Array:
    """sum_t take(feats, rows[t]) @ weights[t] with tap batching.

    The taps are gathered in one shot (chunked to bound memory) and
    contracted as a batched einsum so XLA schedules them in parallel — a
    lax.scan over taps serializes into 27 tiny dispatches (~35ms vs ~2ms
    measured on v5e at K=60k).

    Args:
        feats: [K_in, Cin]; rows: [T, K_out] (-1 = missing);
        weights: [T, Cin, Cout].
    Returns: [K_out, Cout].
    """
    t, k_out = rows.shape
    k_in = feats.shape[0]
    cin, cout = weights.shape[1], weights.shape[2]
    chunk = _tap_chunk(t, k_out, cin)
    # zero-row trick: missing neighbors (-1) index a zero row instead of a
    # [T, K, C] where-mask (saved ~35ms/iter at full scale)
    feats_z = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    rows = jnp.where(rows < 0, k_in, rows)
    out = jnp.zeros((k_out, cout), jnp.float32)
    for start in range(0, t, chunk):
        gathered = jnp.take(feats_z, rows[start:start + chunk], axis=0)
        out = out + jnp.einsum(
            'tkc,tcd->kd', gathered, weights[start:start + chunk],
            preferred_element_type=jnp.float32)
    out = out.astype(feats.dtype)
    return jnp.where(out_valid[:, None], out, 0)


def gather_gemm_x3(feats: jax.Array, rows: jax.Array, weights: jax.Array,
                   out_valid: jax.Array) -> jax.Array:
    """gather_gemm exploiting consecutive rows of x-adjacent actives.

    By the sorted-key invariant, the feature rows of the active cells among
    an x-triple (z, y, x-1..x+1) are CONSECUTIVE (no key fits between
    key-1, key, key+1). So per (dz, dy) group one 3-row slice fetch covers
    all three taps — 9 feature-gather descriptors per voxel instead of 27
    (the gather engine is descriptor-rate-bound at ~250M/s).

    Args:
        feats: [K_in, Cin]; rows: [T, K] with T = 9*3 grouped x-major
            (taps g*3+j are the dx=-1,0,+1 of group g); weights [T,Cin,Cout].
    """
    t, k_out = rows.shape
    assert t % 3 == 0
    groups = t // 3
    k_in, cin = feats.shape
    cout = weights.shape[-1]
    feats_z = jnp.concatenate([feats, jnp.zeros((3, cin), feats.dtype)],
                              axis=0)
    out = jnp.zeros((k_out, cout), jnp.float32)
    for g in range(groups):
        tri = rows[g * 3:(g + 1) * 3]                   # [3, K]
        present = tri >= 0                              # [3, K]
        # slice start = row of the first present cell; rows of present
        # cells are start, start+1, ... in presence order
        big = jnp.int32(k_in)
        start = jnp.min(jnp.where(present, tri, big), axis=0)  # [K]
        start = jnp.clip(start, 0, k_in)                # k_in -> zero rows

        def slice3(s):
            return jax.lax.dynamic_slice(feats_z, (s, 0), (3, cin))

        sl = jax.vmap(slice3)(start)                    # [K, 3, Cin]
        # slot of tap j = number of present taps before j
        pres_i = present.astype(jnp.int32)
        slot = jnp.cumsum(pres_i, axis=0) - pres_i      # [3, K]
        sel = (slot[:, :, None] ==
               jnp.arange(3, dtype=jnp.int32)[None, None, :])
        sel = sel & present[:, :, None]                 # [3, K, 3]
        picked = jnp.einsum('jks,ksc->jkc', sel.astype(feats.dtype), sl,
                            preferred_element_type=jnp.float32)
        out = out + jnp.einsum('jkc,jcd->kd',
                               picked, weights[g * 3:(g + 1) * 3],
                               preferred_element_type=jnp.float32)
    out = out.astype(feats.dtype)
    return jnp.where(out_valid[:, None], out, 0)


def subm_conv(st: SparseTensor, weights: jax.Array,
              neighbor_table: jax.Array, bias=None,
              x_triples: bool = False) -> SparseTensor:
    """Submanifold sparse conv.

    Args:
        st: input with sorted-key invariant.
        weights: [T, Cin, Cout].
        neighbor_table: [T, K] from build_subm_neighbor_table.
        x_triples: taps are (dz, dy)-grouped x-triples (kx == 3 with
            x-fastest enumeration) — enables the consecutive-row fast path.
    """
    # NOTE: gather_gemm_x3 (consecutive-row 3-slice fetches) measured 40x
    # SLOWER end-to-end: vmapped (3, C) dynamic_slices lower to a gather
    # whose descriptors cost far more than plain row gathers. Kept for
    # reference; plain gather_gemm is the fast path.
    del x_triples
    out = gather_gemm(st.features, neighbor_table, weights, st.valid)
    if bias is not None:
        out = jnp.where(st.valid[:, None], out + bias, 0)
    return SparseTensor(features=out, coords=st.coords, valid=st.valid,
                        keys=st.keys, spatial_shape=st.spatial_shape,
                        batch_size=st.batch_size)


def downsample_out_coords(st: SparseTensor, kernel_size, stride, padding,
                          capacity: int, site: str = ''):
    """Active output coordinate set of a strided sparse conv.

    Output position o (per axis) receives input i iff
    ``o*stride - pad + tap == i`` for some tap in [0, kernel); candidates are
    generated per input using only the taps that satisfy the stride
    divisibility (ceil(kernel/stride) per axis instead of kernel), then
    sorted-uniqued into a fixed-capacity coord set. Returns
    (out_keys [capacity], out_coords [capacity, 4], out_valid [capacity],
    out_spatial_shape).
    """
    kz, ky, kx = _triple(kernel_size)
    sz, sy, sx = _triple(stride)
    pz, py, px = _triple(padding)
    z, y, x = st.spatial_shape
    out_shape = (
        (z + 2 * pz - kz) // sz + 1,
        (y + 2 * py - ky) // sy + 1,
        (x + 2 * px - kx) // sx + 1,
    )
    oz, oy, ox = out_shape

    def axis_candidates(i, kdim, s, p, odim):
        """All valid output coords per axis: [K_in, C_ax] values + mask."""
        c_ax = -(-kdim // s)  # ceil
        shifted = i + p
        k0 = shifted % s     # smallest tap with divisibility
        taps = k0[:, None] + s * jnp.arange(c_ax, dtype=jnp.int32)[None, :]
        o = (shifted[:, None] - taps) // s
        ok = (taps < kdim) & (o >= 0) & (o < odim)
        return o, ok

    vz, mz = axis_candidates(st.coords[:, 1], kz, sz, pz, oz)
    vy, my = axis_candidates(st.coords[:, 2], ky, sy, py, oy)
    vx, mx = axis_candidates(st.coords[:, 3], kx, sx, px, ox)

    cz, cy, cx = vz.shape[1], vy.shape[1], vx.shape[1]
    k_in = st.capacity
    b = st.coords[:, 0]
    # cartesian product of axis candidates, built TAPS-MAJOR as [T, K_in]:
    # the key is computed ARITHMETICALLY from the axis parts (a [K*t, 4]
    # coord array + pack_keys cost ~40ms/iter at full scale), and the tap
    # dimension lives on SUBLANES with K_in on lanes — the previous
    # [K, cz, cy, cx] layout tiled T(2,128), wasting 64x of the fusion's
    # HBM writes on lane padding (~1-2 ms per instance, 7 instances/iter)
    rows = []
    for t in range(cz * cy * cx):
        iz, rem = divmod(t, cy * cx)
        iy, ix = divmod(rem, cx)
        okr = mz[:, iz] & my[:, iy] & mx[:, ix] & st.valid
        keyr = ((b * oz + vz[:, iz]) * oy + vy[:, iy]) * ox + vx[:, ix]
        rows.append(jnp.where(okr, keyr, INT_MAX))
    cand_keys = jnp.stack(rows).reshape(-1).astype(jnp.int32)

    # jnp.sort defaults to stable=True, which lowers to a 2-operand
    # (key, iota) sort on TPU — the iota payload doubles the sort traffic
    # for nothing here, so sort unstable with a single operand
    skey = jax.lax.sort(cand_keys, is_stable=False)
    head = jnp.concatenate(
        [(skey[:1] != INT_MAX),
         (skey[1:] != skey[:-1]) & (skey[1:] != INT_MAX)])
    # compaction-by-sort: park duplicates at INT_MAX and re-sort, so the
    # unique keys land ascending in the first slots. Even though this sorts
    # the full candidate set a second time, it beats the previous
    # rank-cumsum + fixed-slot scatter: TPU scatters retire ~1 element per
    # cycle (~6-7ms at 1M candidates, the top XLA fusion in the full-scale
    # flagship trace) while an i32 sort of the same width is ~2ms
    # framework-only cap (spconv output coords are dynamically sized)
    from ...utils import overflow
    tag = f'[{site}]' if site else ''
    overflow.record(f'sparse.downsample.out_cap{tag}',
                    jnp.maximum(jnp.sum(head) - capacity, 0))
    overflow.gauge(f'occ.downsample_out{tag}', jnp.sum(head))
    out_keys = jax.lax.sort(jnp.where(head, skey, INT_MAX),
                            is_stable=False)[:capacity]
    out_valid = out_keys != INT_MAX
    out_coords = jnp.where(out_valid[:, None],
                           unpack_keys(out_keys, out_shape), -1)
    return out_keys, out_coords, out_valid, out_shape


def sparse_conv(st: SparseTensor, weights: jax.Array, out_keys, out_coords,
                out_valid, out_spatial_shape, kernel_size, stride, padding,
                bias=None) -> SparseTensor:
    """Regular (possibly strided) sparse conv onto a precomputed output set.

    Gathers from the input hash at ``out*stride - pad + tap`` per tap — the
    scatter-free dual of spconv's gather-GEMM-scatter.
    """
    rows = build_conv_neighbor_table(st, out_coords, out_valid, kernel_size,
                                     stride, padding)
    out = gather_gemm(st.features, rows, weights, out_valid)
    if bias is not None:
        out = jnp.where(out_valid[:, None], out + bias, 0)
    return SparseTensor(features=out, coords=out_coords, valid=out_valid,
                        keys=out_keys, spatial_shape=tuple(out_spatial_shape),
                        batch_size=st.batch_size)


def build_conv_neighbor_table(st: SparseTensor, out_coords, out_valid,
                              kernel_size, stride, padding) -> jax.Array:
    """Input-row table [T, K_out] for a strided conv: one vectorized
    searchsorted over all taps instead of a per-tap loop."""
    kz, ky, kx = _triple(kernel_size)
    sz, sy, sx = _triple(stride)
    pz, py, px = _triple(padding)
    taps = jnp.asarray(list(itertools.product(range(kz), range(ky),
                                              range(kx))), dtype=jnp.int32)
    stride_a = jnp.array([sz, sy, sx], jnp.int32)
    pad_a = jnp.array([pz, py, px], jnp.int32)
    z, y, x = st.spatial_shape
    bound = jnp.array([z, y, x], jnp.int32)

    base = out_coords[:, 1:] * stride_a[None, :] - pad_a[None, :]  # [K, 3]
    table = build_hash_table(st)

    if table is not None and kx == 3:
        # x-taps are consecutive input cells: fetch them as 3-wide slices
        base_key = pack_keys(
            jnp.concatenate([out_coords[:, :1], base], axis=-1),
            st.spatial_shape, st.batch_size)
        rows_all = []
        for dz in range(kz):
            for dy in range(ky):
                zy = base[:, :2] + jnp.array([dz, dy])
                zy_ok = out_valid & jnp.all(
                    (zy >= 0) & (zy < bound[:2]), axis=-1)
                start = base_key + (dz * y + dy) * x
                triple = _gather_x_triples(table, start)
                for dx in range(kx):
                    xs = base[:, 2] + dx
                    ok = zy_ok & (xs >= 0) & (xs < x)
                    rows_all.append(jnp.where(ok, triple[:, dx], -1))
        return jnp.stack(rows_all)

    in_zyx = base[None, :, :] + taps[:, None, :]                   # [T, K, 3]
    ok = out_valid[None, :] & jnp.all(
        (in_zyx >= 0) & (in_zyx < bound), axis=-1)
    t, k_out = ok.shape
    b = jnp.broadcast_to(out_coords[None, :, :1], (t, k_out, 1))
    qcoords = jnp.concatenate([b, in_zyx], axis=-1).reshape(t * k_out, 4)
    qkeys = pack_keys(qcoords, st.spatial_shape, st.batch_size,
                      ok.reshape(-1))
    return lookup(st.keys, qkeys, table).reshape(t, k_out)


def sparse_maxpool(st: SparseTensor, kernel_size, stride, padding,
                   capacity: int) -> SparseTensor:
    """Sparse max-pool (reference ops/spconv maxpool.cc semantics)."""
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, kernel_size, stride, padding, capacity)
    kz, ky, kx = _triple(kernel_size)
    sz, sy, sx = _triple(stride)
    pz, py, px = _triple(padding)
    taps = np.array(list(itertools.product(range(kz), range(ky), range(kx))),
                    dtype=np.int32)
    stride_a = jnp.array([sz, sy, sx], jnp.int32)
    pad_a = jnp.array([pz, py, px], jnp.int32)
    z, y, x = st.spatial_shape
    bound = jnp.array([z, y, x], jnp.int32)
    base = out_coords[:, 1:] * stride_a[None, :] - pad_a[None, :]
    neg = jnp.full((out_coords.shape[0], st.num_channels), -jnp.inf,
                   st.features.dtype)

    def body(acc, tap):
        in_zyx = base + tap[None, :]
        ok = out_valid & jnp.all((in_zyx >= 0) & (in_zyx < bound), axis=-1)
        in_coords = jnp.concatenate([out_coords[:, :1], in_zyx], axis=-1)
        qkeys = pack_keys(in_coords, st.spatial_shape, st.batch_size, ok)
        rows = lookup(st.keys, qkeys)
        gathered = jnp.where(
            (rows >= 0)[:, None],
            jnp.take(st.features, jnp.maximum(rows, 0), axis=0), -jnp.inf)
        return jnp.maximum(acc, gathered), None

    out, _ = jax.lax.scan(body, neg, jnp.asarray(taps))
    out = jnp.where(jnp.isfinite(out) & out_valid[:, None], out, 0)
    return SparseTensor(features=out, coords=out_coords, valid=out_valid,
                        keys=out_keys, spatial_shape=tuple(out_shape),
                        batch_size=st.batch_size)


def inverse_conv(st: SparseTensor, weights: jax.Array, orig_keys,
                 orig_coords, orig_valid,
                 orig_spatial_shape, kernel_size, stride, padding,
                 bias=None) -> SparseTensor:
    """Transposed ("inverse") sparse conv back onto a stored coord set.

    TPU-native equivalent of spconv's SparseInverseConv3d (used by
    SparseUNet, reference mmdet3d/models/middle_encoders/sparse_unet.py):
    the output coords are the *input* coords of the matching strided conv
    (the reference pairs them via indice_key; here the caller passes the
    stored coord set explicitly). Output row o at the fine resolution
    gathers input rows i at the coarse resolution where
    ``o = i*stride - pad + tap``.
    """
    kz, ky, kx = _triple(kernel_size)
    sz, sy, sx = _triple(stride)
    pz, py, px = _triple(padding)
    taps = jnp.asarray(list(itertools.product(range(kz), range(ky),
                                              range(kx))), dtype=jnp.int32)
    stride_a = jnp.array([sz, sy, sx], jnp.int32)
    pad_a = jnp.array([pz, py, px], jnp.int32)
    z, y, x = st.spatial_shape
    bound = jnp.array([z, y, x], jnp.int32)

    numer = orig_coords[:, 1:][None, :, :] + pad_a[None, None, :] - \
        taps[:, None, :]                                   # [T, K, 3]
    divisible = jnp.all(numer % stride_a[None, None, :] == 0, axis=-1)
    in_zyx = numer // stride_a[None, None, :]
    ok = orig_valid[None, :] & divisible & jnp.all(
        (in_zyx >= 0) & (in_zyx < bound), axis=-1)
    t, k_out = ok.shape
    b = jnp.broadcast_to(orig_coords[None, :, :1], (t, k_out, 1))
    qcoords = jnp.concatenate([b, in_zyx], axis=-1).reshape(t * k_out, 4)
    qkeys = pack_keys(qcoords, st.spatial_shape, st.batch_size,
                      ok.reshape(-1))
    rows = lookup(st.keys, qkeys, build_hash_table(st)).reshape(t, k_out)
    out = gather_gemm(st.features, rows, weights, orig_valid)
    if bias is not None:
        out = jnp.where(orig_valid[:, None], out + bias, 0)
    return SparseTensor(features=out, coords=orig_coords, valid=orig_valid,
                        keys=orig_keys, spatial_shape=tuple(orig_spatial_shape),
                        batch_size=st.batch_size)
