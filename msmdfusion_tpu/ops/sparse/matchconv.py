"""Sorted-merge match-matmul sparse convolution (the TPU-native hot path).

Replaces the hash-table + gather-engine sparse conv with a design that maps
onto the MXU. Reference semantics: spconv rulebook + gather-GEMM-scatter
(mmdet3d/ops/spconv/src/indice_cuda.cu, reordering_cuda.cu,
ops/spconv/ops.py:46-128).

Why: the TPU gather engine is descriptor-rate-bound (~250M desc/s measured
on v5e regardless of row width), so a rulebook-style conv costs
(#taps x #voxels) descriptors per conv for the table lookups plus the same
again for the feature gathers (~450ms/frame at full scale). This engine
issues ZERO gather descriptors on the hot path.

Key insight: under the sorted-key invariant (tensor.py), the neighbor query
keys of kernel tap t are ``keys + delta_t`` — a *monotone* sequence. Hence
all input rows matching one tile of T consecutive output rows live in ONE
contiguous slab ``[starts[t, i], starts[t, i+1])`` of the input, where
``starts`` needs only (n_tiles+1) binary searches per tap (a few thousand,
not millions). The Pallas kernel then, per (tile, tap-group):

    1. one DMA of the key slab + one of the feature slab (HBM -> VMEM),
    2. a VPU equality compare  M[T, 128] = (q[:, None] == key_chunk[None, :])
       per 128-wide chunk of the slab — M is the one-hot "rulebook",
    3. an MXU contraction  G_t += M @ feat_chunk  — the "gather",
    4. one MXU GEMM  out = concat_t(G_t) @ concat_t(W_t).

Out-of-range / masked taps keep their monotone query value (needed for the
slab bracketing) and are zeroed via a separate in-bounds mask applied to
G_t. Invalid rows query INT_MAX which only ever matches the INT_MAX
sentinel keys of other invalid rows — also masked.

The same kernel serves submanifold, strided ("regular"), and inverse convs:
they differ only in how the (queries, masks) plan is built. Plans depend
only on the coordinate sets, so they are built once per ``indice_key`` and
shared across convs (spconv's rulebook reuse, ops/sparse_block.py:159).

A pure-XLA fallback (searchsorted + gather) runs on CPU and under autodiff;
on TPU the forward uses the Pallas kernel with a custom VJP: the
submanifold backward is the SAME kernel with mirrored taps + transposed
weights (M_t^T == M_{mirror(t)} on a shared coordinate set).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tensor import INT_MAX, SparseTensor, pack_keys

# slab capacity (input rows per (tile, tap-group) bracket). Brackets are
# usually ~tile_rows wide; the 4x margin absorbs density skew across the
# shifted key windows. Overflow beyond the slab is dropped deterministically
# (fixed-capacity semantics, like every other cap in this framework);
# plan_slab_spans() reports the true max for capacity planning / tests.
DEFAULT_SLAB = int(os.environ.get('MSMD_CONV_SLAB', 2048))
# v5e scan (tile x cw, loop-in-jit): match work per output row is
# ~(tile + window) slab columns, so a small tile with a bracket-covering
# chunk wins: C=16 10.6 -> 8.3 ms, C=80 28.7 -> 19.7 ms for 512/512 ->
# 256/512. tile 1024 and cw 256 are strictly worse.
DEFAULT_TILE = int(os.environ.get('MSMD_CONV_TILE', 256))
DEFAULT_CW = int(os.environ.get('MSMD_CONV_CW', 512))


def _env_backend() -> str:
    return os.environ.get('MSMD_SPARSE_BACKEND', 'auto')


def use_pallas() -> bool:
    mode = _env_backend()
    if mode == 'pallas':
        return True
    if mode == 'xla':
        return False
    return jax.default_backend() == 'tpu'


def use_vgather() -> bool:
    """VMEM-gather conv backend (precomputed rulebook rows + butterfly
    gather) vs the one-hot match backend. Default on; MSMD_CONV_ALGO=onehot
    restores the round-2 engine."""
    return os.environ.get('MSMD_CONV_ALGO', 'vgather') == 'vgather'


def conv_dtype() -> str:
    """Feature dtype inside the VMEM-gather conv kernel.

    'float32' (default): exact fp32 gather + HIGHEST/x3 GEMM (~1e-7 vs the
    fp64 oracle). 'bfloat16': channel PAIRS are packed into one f32 lane,
    halving both the slab DMA bytes and the butterfly gather instruction
    count (the kernel is gather/select instruction bound); the unpacked
    bf16 feeds a single-pass MXU GEMM (~2^-8 relative — the same effective
    accuracy as the reference's default-precision einsum path, see PLAN.md
    round-2 precision finding). Opt-in via MSMD_CONV_DTYPE=bfloat16;
    bench.py uses it for the inference benchmark.
    """
    return os.environ.get('MSMD_CONV_DTYPE', 'float32')


def fuse_eval_bn() -> bool:
    """Fold eval-mode BatchNorm + ReLU into the conv kernels' epilogue.

    Inference-only (train keeps the real MaskedBatchNorm); removes one
    full [K, C] HBM elementwise pass per conv-block step (~19 ms/iter
    across the flagship at full scale). MSMD_FUSE_BN=0 restores the
    unfused path (useful to A/B the numerics: the folded affine is the
    same arithmetic re-associated, ~1e-7 relative difference)."""
    return os.environ.get('MSMD_FUSE_BN', '1') != '0'


def gemm_mode() -> str:
    """Weight-GEMM precision inside the conv kernels.

    'x3': bf16 hi/lo split of both operands, 3 MXU passes (hi.hi + hi.lo +
    lo.hi), ~2^-17 relative error — half the MXU work of 'highest' (6
    passes); the wide-channel GMA aggregation convs are MXU-bound at
    full scale so this is ~2x on their GEMM portion. 'highest' restores
    the 6-pass fp32-exactish contraction (MSMD_CONV_GEMM=highest).
    """
    return os.environ.get('MSMD_CONV_GEMM', 'x3')


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatchPlan:
    """Per-coordinate-set conv plan (the TPU analog of a spconv rulebook).

    ``qs`` is the group-stacked [n_tiles*kx*tile, G] query view the kernel
    consumes — materialized once here so the transpose is shared by every
    conv on the coordinate set. ``inb`` stays in [K_pad, Ta] layout: a
    stacked [kx*T, G] VMEM block pads its 3 lanes to 128 (+2.1MB scoped
    vmem double-buffered, enough to OOM the C=128 conv).
    """
    # queries/qs are LAZY for affine plans (query = okey + dkey[t]): the
    # [K, Ta] materialization plus its group-stacked transpose cost
    # ~3-5 ms/plan of lane-padded HBM traffic at full scale, and the
    # vgather+windowed-rows hot path never reads them — only the one-hot /
    # CPU fallbacks do, via _plan_queries/_plan_qs.
    queries: Optional[jax.Array]  # [K_out_pad, Ta] int32, monotone per col
    inb: jax.Array           # [K_out_pad, Ta] bool — tap in-bounds & valid
    starts: jax.Array        # [Ta, n_tiles + 1] int32 slab brackets
    qs: Optional[jax.Array]  # [n_tiles*kx*tile, G] int32 stacked queries
    inb32: jax.Array         # [K_out_pad, Ta] int32 (the kernel block)
    kx: int = dataclasses.field(metadata=dict(static=True))   # taps / group
    k_out: int = dataclasses.field(metadata=dict(static=True))  # un-padded
    tile: int = dataclasses.field(metadata=dict(static=True))
    # Optional precomputed rulebook (attach_rows): the fat lane-stacked
    # matched-row layout [n_tiles*8, Ta*tile] consumed by the VMEM-gather
    # kernel, plus per-tile live flags [n_tiles]. None = one-hot backend.
    # When col_base is set, rows_stack holds COLUMN-RELATIVE positions
    # (row - col_base of its 128-lane column; miss = COL_MISS) and the
    # kernel gathers from a static col_w window at each column's base
    # instead of butterflying over the whole chunk (2-4x fewer
    # gather/select instructions — the kernel is instruction bound).
    rows_stack: Optional[jax.Array] = None
    live32: Optional[jax.Array] = None
    col_base: Optional[jax.Array] = None  # [Ta*tile/128, n_tiles] i32
    col_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    # per-column NEEDED vreg count (ceil(span/128), slab-clamped): columns
    # wider than the static col_w fast window run a predicated tail loop in
    # the kernel up to this bound — realistic scenes have density skew that
    # makes a handful of columns span the whole slab while 99%+ fit col_w
    col_nv: Optional[jax.Array] = None    # [Ta*tile/128, n_tiles] i32
    # per-(tap-GROUP, tile) max of col_nv: bound of the group-hoisted tail
    # loop in the kernels (one data-dependent loop per group, not per
    # column — scalar branches cost ~75 cycles each even at 0 trips)
    col_nvt: Optional[jax.Array] = None   # [groups, n_tiles] i32
    # per-(tap, 128-row column) slab ranks from the SAME double-sort that
    # produces `starts`: rank of every 128th query among the input keys.
    # Lower-bounds the first matched row of each output column and (shifted
    # by one column) upper-bounds its last — so attach_rows derives the
    # col_base/col_nv gather windows ARITHMETICALLY instead of reducing
    # over the materialized rulebook rows, and the rows kernel can match
    # inside per-column windows instead of scanning the whole slab bracket
    starts128: Optional[jax.Array] = None  # [Ta, K_pad/128 + 1] i32
    # affine-plan form: query[r, t] = okeys[r] + dkey[t] for valid rows
    # (okeys INT_MAX-padded; wrapped INT_MAX+dkey queries never match a
    # real key and sentinel self-matches are masked by inb)
    okeys: Optional[jax.Array] = None      # [K_out_pad] i32
    dkey: Optional[Tuple[int, ...]] = dataclasses.field(
        default=None, metadata=dict(static=True))
    # raw rulebook rows [K_out_pad, Ta] (-1 = miss) kept by attach_rows.
    # Unused leaves are DCE'd by XLA at inference; the training backward
    # reads them for the weight-gradient fallback path.
    rows_raw: Optional[jax.Array] = None
    # transpose ("dual") plan for the Pallas training backward of strided
    # convs: gathers over the OUTPUT coordinate set back onto the input
    # rows, with dual tap u <-> forward tap Ta-1-u (build_dual_down_plan).
    # Submanifold plans need no dual — symmetric offsets make the plan its
    # own transpose. dual_keys is the dual's input key array (the forward
    # conv's output keys).
    dual: Optional['MatchPlan'] = None
    dual_keys: Optional[jax.Array] = None
    # plan flavor: 'subm' | 'down' | 'dual' | '' (inverse/custom). Drives
    # the backward dispatch only.
    kind: str = dataclasses.field(default='', metadata=dict(static=True))

    @property
    def num_taps(self) -> int:
        return self.inb.shape[1]

    @property
    def n_tiles(self) -> int:
        return self.inb.shape[0] // self.tile


def _plan_queries(plan: MatchPlan) -> jax.Array:
    """Dense [K_out_pad, Ta] queries (materialize the affine form)."""
    if plan.queries is not None:
        return plan.queries
    ok = plan.okeys != INT_MAX
    q = plan.okeys[:, None] + jnp.asarray(plan.dkey, jnp.int32)[None, :]
    return jnp.where(ok[:, None], q, INT_MAX)


def _plan_qs(plan: MatchPlan) -> jax.Array:
    """Group-stacked [n_tiles*kx*tile, G] queries for the one-hot kernels."""
    if plan.qs is not None:
        return plan.qs
    q = _plan_queries(plan)
    groups = plan.num_taps // plan.kx
    return q.reshape(plan.n_tiles, plan.tile, groups, plan.kx).transpose(
        0, 3, 1, 2).reshape(plan.n_tiles * plan.kx * plan.tile, groups)


def _plan_live(plan: MatchPlan) -> jax.Array:
    """[n_tiles] bool: tile has at least one valid output row."""
    if plan.okeys is not None:
        return plan.okeys[::plan.tile] != INT_MAX
    return plan.queries[::plan.tile, 0] != INT_MAX


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def build_plan(in_keys: jax.Array, query_keys: Optional[jax.Array],
               inb: jax.Array, kx: int, tile: int = DEFAULT_TILE,
               okeys: Optional[jax.Array] = None,
               dkey=None, kind: str = '') -> MatchPlan:
    """Assemble a MatchPlan from per-tap monotone query keys.

    Args:
        in_keys: [K_in] sorted packed keys (INT_MAX for invalid rows).
        query_keys: [K_out, Ta] int32; column t MUST be monotone
            non-decreasing (invalid rows hold INT_MAX). None for an AFFINE
            plan: queries are okeys + dkey[t] (never materialized — the
            vgather hot path reads okeys directly; fallbacks rebuild via
            _plan_queries).
        inb: [K_out, Ta] bool in-bounds-and-valid mask.
        kx: taps per x-group (consecutive taps whose queries differ by +1
            share one slab DMA); must divide Ta.
        okeys: [K_out] i32 per-row base key (INT_MAX for invalid rows);
            required when query_keys is None.
        dkey: [Ta] static int offsets for the affine form.
    """
    k_out, ta = inb.shape
    assert ta % kx == 0
    k_pad = _round_up(max(k_out, tile), tile)
    if k_pad != k_out:
        if query_keys is not None:
            query_keys = jnp.concatenate(
                [query_keys,
                 jnp.full((k_pad - k_out, ta), INT_MAX, jnp.int32)], axis=0)
        inb = jnp.concatenate(
            [inb, jnp.zeros((k_pad - k_out, ta), bool)], axis=0)
        if okeys is not None:
            okeys = jnp.concatenate(
                [okeys, jnp.full((k_pad - k_out,), INT_MAX, jnp.int32)])
    n_tiles = k_pad // tile
    assert tile % 128 == 0
    n128 = k_pad // 128
    # slab bracket starts: rank of each 128-row column's first query per
    # tap, plus a terminal K_in; tile-granular starts are the ::(tile/128)
    # subsample. The vmapped searchsorted lowered to a 22ms/iter while
    # loop at full scale; two stable sorts give the same side='left' ranks:
    # with queries placed BEFORE the keys, ties keep queries first, so
    # position-in-merged minus position-among-queries = #keys strictly < q.
    if query_keys is not None:
        firsts = query_keys[::128, :]                    # [n128, Ta]
    else:
        # affine: saturate INT_MAX firsts instead of letting INT_MAX+dkey
        # wrap — a wrapped-NEGATIVE first would rank 0 and zero out the
        # PREVIOUS column's rank_next window bound, dropping its matches
        ok_f = okeys[::128]
        firsts = jnp.where(ok_f[:, None] == INT_MAX, INT_MAX,
                           ok_f[:, None] + jnp.asarray(dkey, jnp.int32))
    q_flat = firsts.T.reshape(-1)                        # [Ta * n128]
    nq = q_flat.shape[0]
    q_order = jnp.argsort(q_flat, stable=True)
    q_sorted = q_flat[q_order]
    cat = jnp.concatenate([q_sorted, in_keys])
    iota = jnp.arange(cat.shape[0], dtype=jnp.int32)
    _, order = jax.lax.sort((cat, iota), num_keys=1, is_stable=True)
    # sorted positions of the nq queries, in q_sorted order (stable sort
    # keeps equal-key queries ahead of keys and in relative order). The
    # i-th query has exactly i queries before it, so rank-among-keys =
    # position - i. Compacting the positions with one single-operand i32
    # sort replaces the previous full-width inverse-permutation scatter
    # (~1.2 ms/plan: TPU scatters retire ~1 row/cycle, i32 sorts are ~3x
    # faster at this width).
    qpos = jax.lax.sort(jnp.where(order < nq, iota, INT_MAX),
                        is_stable=False)[:nq]
    rank = qpos - jnp.arange(nq, dtype=jnp.int32)
    starts_flat = jnp.zeros((nq,), jnp.int32).at[q_order].set(rank)
    term = jnp.full((ta, 1), in_keys.shape[0], jnp.int32)
    starts128 = jnp.concatenate(
        [starts_flat.reshape(ta, n128), term], axis=1)
    starts = jnp.concatenate(
        [starts128[:, :n128:tile // 128], term], axis=1)
    groups = ta // kx

    def stack(a):
        return a.reshape(n_tiles, tile, groups, kx).transpose(
            0, 3, 1, 2).reshape(n_tiles * kx * tile, groups)

    return MatchPlan(queries=query_keys, inb=inb, starts=starts,
                     qs=(None if query_keys is None else stack(query_keys)),
                     inb32=inb.astype(jnp.int32),
                     kx=kx, k_out=k_out, tile=tile, starts128=starts128,
                     okeys=okeys,
                     dkey=(None if dkey is None else tuple(dkey)),
                     kind=kind)


def _offsets_zyx(kernel_size) -> np.ndarray:
    """[Ta, 3] tap offsets, z-major x-fastest (spconv enumeration order)."""
    import itertools
    if isinstance(kernel_size, (tuple, list)):
        kz, ky, kx = (int(v) for v in kernel_size)
    else:
        kz = ky = kx = int(kernel_size)
    taps = np.array(
        list(itertools.product(range(kz), range(ky), range(kx))), np.int32)
    return taps - np.array([kz // 2, ky // 2, kx // 2], np.int32)


def _kx(kernel_size) -> int:
    if isinstance(kernel_size, (tuple, list)):
        return int(kernel_size[2])
    return int(kernel_size)


def _group_taps(kernel_size) -> int:
    """Taps per slab group: one group per dz plane (ky * kx taps)."""
    if isinstance(kernel_size, (tuple, list)):
        return int(kernel_size[1]) * int(kernel_size[2])
    return int(kernel_size) ** 2


def build_subm_plan(st: SparseTensor, kernel_size,
                    tile: int = DEFAULT_TILE) -> MatchPlan:
    """Plan for a submanifold conv (output coords == input coords)."""
    offs = _offsets_zyx(kernel_size)                     # [Ta, 3]
    kz, ky, kx_ = (kernel_size if isinstance(kernel_size, (tuple, list))
                   else (kernel_size,) * 3)
    z, y, x = st.spatial_shape
    dkey = offs[:, 0] * (y * x) + offs[:, 1] * x + offs[:, 2]
    # per-axis bounds then a broadcast combine: 3 tiny [K, k] checks
    # instead of materializing [K, Ta, 3] neighbor coords
    k = st.capacity

    def axis_ok(c, kdim, lim):
        d = jnp.arange(kdim, dtype=jnp.int32) - kdim // 2
        v = c[:, None] + d[None, :]
        return (v >= 0) & (v < lim)

    okz = axis_ok(st.coords[:, 1], int(kz), z)
    oky = axis_ok(st.coords[:, 2], int(ky), y)
    okx = axis_ok(st.coords[:, 3], int(kx_), x)
    inb = (okz[:, :, None, None] & oky[:, None, :, None]
           & okx[:, None, None, :]).reshape(k, -1) & st.valid[:, None]
    # one slab group per dz plane: the +-dy key shifts are one y-line
    # (~x keys) which holds only a handful of ROWS at lidar densities, so
    # the 9 (dy, dx) taps share a slab with a near-unchanged bracket span
    # while issuing 3x fewer DMAs. AFFINE plan: queries = keys + dkey[t],
    # never materialized (invalid rows' wrapped queries are inb-masked).
    return build_plan(st.keys, None, inb, _group_taps(kernel_size), tile,
                      okeys=st.keys, dkey=tuple(int(v) for v in dkey),
                      kind='subm')


def build_downsample_plan(st: SparseTensor, out_coords, out_valid,
                          kernel_size, stride, padding,
                          tile: int = DEFAULT_TILE) -> MatchPlan:
    """Plan for a strided conv onto a precomputed output coordinate set.

    Output o gathers input at ``o*stride - pad + tap`` (scatter-free dual
    of spconv's gather-GEMM-scatter).
    """
    offs = _offsets_zyx(kernel_size)
    kz, ky, kx = (kernel_size if isinstance(kernel_size, (tuple, list))
                  else (kernel_size,) * 3)
    ctr = np.array([kz // 2, ky // 2, kx // 2], np.int32)
    taps = offs + ctr                                    # raw 0-based taps
    s = np.broadcast_to(np.asarray(
        stride if isinstance(stride, (tuple, list)) else (stride,) * 3,
        np.int32), (3,))
    p = np.broadcast_to(np.asarray(
        padding if isinstance(padding, (tuple, list)) else (padding,) * 3,
        np.int32), (3,))
    z, y, x = st.spatial_shape
    base = out_coords[:, 1:] * jnp.asarray(s) - jnp.asarray(p)   # [K, 3]
    k = out_coords.shape[0]

    def axis_ok(c, kdim, lim):
        v = c[:, None] + jnp.arange(kdim, dtype=jnp.int32)[None, :]
        return (v >= 0) & (v < lim)

    okz = axis_ok(base[:, 0], int(kz), z)
    oky = axis_ok(base[:, 1], int(ky), y)
    okx = axis_ok(base[:, 2], int(kx), x)
    inb = (okz[:, :, None, None] & oky[:, None, :, None]
           & okx[:, None, None, :]).reshape(k, -1) & out_valid[:, None]
    base_key = (out_coords[:, 0] * z + base[:, 0]) * y * x + \
        base[:, 1] * x + base[:, 2]
    dkey = taps[:, 0] * (y * x) + taps[:, 1] * x + taps[:, 2]
    okeys = jnp.where(out_valid, base_key, INT_MAX).astype(jnp.int32)
    return build_plan(st.keys, None, inb, int(ky) * int(kx), tile,
                      okeys=okeys, dkey=tuple(int(v) for v in dkey),
                      kind='down')


def build_inverse_plan(st: SparseTensor, orig_coords, orig_valid,
                       kernel_size, stride, padding,
                       tile: int = DEFAULT_TILE) -> MatchPlan:
    """Plan for a transposed conv back onto a stored (fine) coord set.

    Fine output o gathers coarse input i where ``o = i*stride - pad + tap``
    i.e. ``i = (o + pad - tap) / stride`` when divisible.
    """
    kz, ky, kx = (kernel_size if isinstance(kernel_size, (tuple, list))
                  else (kernel_size,) * 3)
    offs = _offsets_zyx(kernel_size)
    ctr = np.array([kz // 2, ky // 2, kx // 2], np.int32)
    taps = offs + ctr
    s = np.broadcast_to(np.asarray(
        stride if isinstance(stride, (tuple, list)) else (stride,) * 3,
        np.int32), (3,))
    p = np.broadcast_to(np.asarray(
        padding if isinstance(padding, (tuple, list)) else (padding,) * 3,
        np.int32), (3,))
    z, y, x = st.spatial_shape
    numer = orig_coords[:, None, 1:] + jnp.asarray(p)[None, None, :] - \
        jnp.asarray(taps)[None, :, :]                     # [K, Ta, 3]
    ex = numer % jnp.asarray(s)[None, None, :] == 0
    in_zyx = numer // jnp.asarray(s)[None, None, :]
    inb = orig_valid[:, None] & jnp.all(ex, axis=-1) & jnp.all(
        (in_zyx >= 0) & (in_zyx < jnp.array([z, y, x])), axis=-1)
    # LEX-FLOOR surrogate on inexact rows (see _lex_floor_key): raw per-axis
    # floors are not lex-monotone, which silently broke the Pallas kernel's
    # slab brackets for inverse plans on non-divisible rows
    queries = _lex_floor_key(orig_coords[:, 0], in_zyx, ex, (z, y, x))
    queries = jnp.where(orig_valid[:, None], queries, INT_MAX)
    return build_plan(st.keys, queries.astype(jnp.int32), inb, 1, tile)


def build_dual_down_plan(st: SparseTensor, out_keys: jax.Array,
                         out_shape, kernel_size, stride, padding,
                         tile: int = DEFAULT_TILE) -> MatchPlan:
    """Transpose plan of a strided conv, for the Pallas training backward.

    The backward of ``out[o] += in[i] @ W[t]`` over pairs with
    ``i = o*stride - pad + tap_t`` is ``d_in[i] += g[o] @ W[t]^T`` over the
    same pairs — a conv over the OUTPUT (coarse) coordinate set evaluated
    at the input (fine) rows. Fine row i queries the coarse key at
    ``o = (i + pad - tap_t) / stride`` when divisible.

    Taps are enumerated REVERSED (dual tap u <-> forward tap Ta-1-u): the
    coarse coordinate per axis DECREASES as the forward tap increases, so
    the reversed order keeps per-group queries monotone ascending and the
    (ky*kx)-tap dz-plane groups can share one slab DMA exactly like the
    forward kernel. Same correspondence as the submanifold mirror, so the
    backward applies ``weights[::-1].swapaxes(1, 2)`` uniformly.

    Reference semantics: the transposed rulebook of spconv's indice_conv
    backward (mmdet3d/ops/spconv/functional.py:20-100).
    """
    kz, ky, kx = (kernel_size if isinstance(kernel_size, (tuple, list))
                  else (kernel_size,) * 3)
    offs = _offsets_zyx(kernel_size)
    ctr = np.array([kz // 2, ky // 2, kx // 2], np.int32)
    taps = (offs + ctr)[::-1]                            # REVERSED 0-based
    s = np.broadcast_to(np.asarray(
        stride if isinstance(stride, (tuple, list)) else (stride,) * 3,
        np.int32), (3,))
    p = np.broadcast_to(np.asarray(
        padding if isinstance(padding, (tuple, list)) else (padding,) * 3,
        np.int32), (3,))
    oz, oy, ox = (int(v) for v in out_shape)
    numer = st.coords[:, None, 1:] + jnp.asarray(p)[None, None, :] - \
        jnp.asarray(taps)[None, :, :]                    # [K, Ta, 3]
    ex = numer % jnp.asarray(s)[None, None, :] == 0      # axis divisible
    o_zyx = numer // jnp.asarray(s)[None, None, :]
    inb = st.valid[:, None] & jnp.all(ex, axis=-1) & jnp.all(
        (o_zyx >= 0) & (o_zyx < jnp.array([oz, oy, ox])), axis=-1)
    queries = _lex_floor_key(st.coords[:, 0], o_zyx, ex, (oz, oy, ox))
    queries = jnp.where(st.valid[:, None], queries, INT_MAX)
    return build_plan(out_keys, queries.astype(jnp.int32), inb,
                      int(ky) * int(kx), tile, kind='dual')


def _lex_floor_key(batch, o_zyx, ex, out_shape):
    """Monotone packed queries for stride-divided coordinate maps.

    On matchable rows (every axis exactly divisible AND in bounds) the
    packed key of ``o_zyx`` itself; elsewhere the LEX-FLOOR surrogate:
    walking z -> y -> x, the first non-clean axis decides —
      * inexact or above-bounds: clamp it and saturate lower axes HIGH
        (the tight upper envelope of all earlier lattice keys),
      * below-bounds: saturate lower axes LOW and subtract 1 (just under
        every in-bounds key of this (b, prefix)).

    Raw per-axis floors are NOT lex-monotone across axis boundaries
    (fine (z=2,y=9) -> (1,4) vs (z=3,y=0) -> floor (1,0)), and unclamped
    out-of-bounds values alias other cells' keys; either breaks the match
    kernel's slab brackets. The surrogate is the monotone envelope that
    still equals the true key wherever ``inb`` allows a match.

    Args: batch [K]; o_zyx [K, Ta, 3] floor-divided coords; ex [K, Ta, 3]
    per-axis divisibility; out_shape (oz, oy, ox) static.
    """
    dz, dy, dx = out_shape
    oz, oy, ox = o_zyx[..., 0], o_zyx[..., 1], o_zyx[..., 2]
    cz = ex[..., 0] & (oz >= 0) & (oz < dz)      # axis clean
    cy = ex[..., 1] & (oy >= 0) & (oy < dy)
    lz, ly, lx = oz < 0, oy < 0, ox < 0          # below-bounds
    oy_eff = jnp.where(cz, jnp.clip(oy, 0, dy - 1),
                       jnp.where(lz, 0, dy - 1))
    ox_eff = jnp.where(cz & cy, jnp.clip(ox, 0, dx - 1),
                       jnp.where(lz | (cz & ly), 0, dx - 1))
    minus1 = (lz | (cz & ly) | (cz & cy & lx)).astype(jnp.int32)
    return ((batch[:, None] * dz + jnp.clip(oz, 0, dz - 1)) * dy
            + oy_eff) * dx + ox_eff - minus1


def _record_slab_overflow(plan: MatchPlan, slab: int, site: str) -> None:
    """Count input rows beyond the slab bracket (framework-only cap: the
    reference rulebook is dynamically sized). Dropped rows never reach the
    match/gather, so matches there are silently lost — observability via
    utils.overflow (MSMD_OVERFLOW_CHECK=1)."""
    from ...utils import overflow
    if not overflow.enabled():
        return
    ta = plan.num_taps
    g0 = jnp.arange(0, ta, plan.kx)
    lo = plan.starts[g0, :-1]                       # [G, n_tiles]
    hi = plan.starts[g0 + plan.kx - 1, 1:]
    live = _plan_live(plan)                         # [n_tiles]
    over = jnp.maximum(hi - lo - slab, 0)
    overflow.record(site, jnp.sum(jnp.where(live[None, :], over, 0)))


def plan_slab_spans(plan: MatchPlan) -> jax.Array:
    """Max slab span per tap-group (capacity planning / overflow checks).

    Brackets of fully-invalid tiles (first query INT_MAX) are excluded:
    they legitimately cover the whole invalid input tail but the kernel
    skips those tiles outright, so they never consume slab capacity.
    """
    ta = plan.num_taps
    g0 = jnp.arange(0, ta, plan.kx)
    lo = plan.starts[g0, :-1]                      # [G, n_tiles]
    hi = plan.starts[g0 + plan.kx - 1, 1:]
    live = _plan_live(plan)                         # [n_tiles]
    return jnp.max(jnp.where(live[None, :], hi - lo, 0))


# ---------------------------------------------------------------------------
# XLA fallback (CPU path, and building block for the backward pass)
# ---------------------------------------------------------------------------

def _split_hi_lo(x32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact fp32 -> (hi, lo) bf16 split: hi + lo == x to ~2^-16 relative.

    The naive ``hi = bf16(x); lo = bf16(x - f32(hi))`` is UNSOUND under XLA:
    ``xla_allow_excess_precision`` (default on) elides the f32->bf16->f32
    round-trip, so the subtraction folds to exactly zero and the "split"
    silently degrades to a single bf16 pass (measured on v5e: lo == 0
    everywhere). ``lax.reduce_precision`` is the documented barrier XLA
    must honor.
    """
    hi32 = jax.lax.reduce_precision(x32, exponent_bits=8, mantissa_bits=7)
    return hi32.astype(jnp.bfloat16), (x32 - hi32).astype(jnp.bfloat16)


def _rows_from_plan(in_keys: jax.Array, plan: MatchPlan) -> jax.Array:
    """Exact match rows [Ta, K_out_pad] (-1 = missing) via searchsorted."""
    q = _plan_queries(plan)
    pos = jnp.searchsorted(in_keys, q.reshape(-1)).reshape(q.shape)
    pos = jnp.minimum(pos, in_keys.shape[0] - 1)
    hit = (in_keys[pos] == q) & plan.inb & (q != INT_MAX)
    return jnp.where(hit, pos, -1).T


def _fallback_conv(feats: jax.Array, in_keys: jax.Array, plan: MatchPlan,
                   weights: jax.Array) -> jax.Array:
    """Reference gather-GEMM path: [K_out_pad, Cout]."""
    from .conv import gather_gemm
    rows = _rows_from_plan(in_keys, plan)
    valid = jnp.any(plan.inb, axis=1)
    return gather_gemm(feats, rows, weights, valid)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _match_kernel(starts_ref, q_ref, inb_ref, ov_ref, keys_hbm, featsT_hbm,
                  w_ref, sb_ref, out_ref, kslab, fslab, gall, sem_k, sem_f, *,
                  taps: int, kx: int, cin: int, slab: int, tile: int,
                  parts: int, fuse_gall: bool, cw: int, stack_taps: bool,
                  fuse_affine: bool = False, relu: bool = False):
    """One output tile: double-buffered group slab DMAs, match, contract.

    featsT_hbm is the TRANSPOSED bf16 feature matrix [parts*Cin, K_pad]
    (parts=2 -> an exact hi/lo bf16 split of fp32 features, so the MXU runs
    at bf16 rate with ~2^-16 relative error instead of bf16's 2^-8) and
    keys_hbm a [1, K_pad] row; both slab slices run along the (128-aligned,
    hinted) lane dimension — Mosaic requires tile-aligned memref slices.
    (A row-major [K_pad, cp] variant was tried: Mosaic requires 128-aligned
    LANE extents to slice sublanes, and the resulting lane padding made
    small-C convs 34% slower and C=80 overflow VMEM — transposed wins.)

    The weight application is either ONE fused fp32 GEMM per tile over the
    stacked per-tap gathers (fuse_gall: gall [tile, taps*cin] @ w — 27x
    fewer MXU issues than per-tap GEMMs, HIGHEST precision is cheap), or,
    when that scratch would not fit VMEM, per-tap 3-pass hi/lo GEMMs.
    """
    i = pl.program_id(0)
    groups = taps // kx
    cp = cin * parts

    def epilogue(y32):
        """Fused inference tail: BN affine (or bias) + ReLU + valid mask.

        Replaces the post-conv XLA elementwise pass (~1.5-2.7 ms per block
        step at flagship scales) with VPU work on data already in VMEM.
        Invalid rows must return to EXACT zero (the framework invariant the
        epilogue-free kernels rely on), so the affine is masked by the true
        out_valid — not any(inb): shared-plan grouped convs (GMA) run with
        a broader plan validity than their output subset."""
        if fuse_affine:
            y32 = y32 * sb_ref[0:1, :] + sb_ref[1:2, :]
        if relu:
            y32 = jnp.maximum(y32, 0.0)
        if fuse_affine:
            y32 = jnp.where(ov_ref[:] > 0, y32, 0.0)
        return y32

    # rows are key-sorted with the invalid tail (key INT_MAX) last, so a
    # tile whose FIRST query is INT_MAX is entirely invalid: skip all DMAs
    # and matching (at coarse stages / loose union capacities the tail is
    # up to ~half the tiles) and just write zeros.
    live_tile = q_ref[0, 0] != jnp.int32(INT_MAX)

    @pl.when(jnp.logical_not(live_tile))
    def _zero_tile():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live_tile)
    def _run_tile():
        if not fuse_gall:
            gall[:] = jnp.zeros_like(gall)

        def slab_start(g):
            r0 = starts_ref[g * kx, i]
            return pl.multiple_of((r0 // 128) * 128, 128)

        def dma_pair(g, slot):
            r0a = slab_start(g)
            return (
                pltpu.make_async_copy(keys_hbm.at[:, pl.ds(r0a, slab)],
                                      kslab.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(featsT_hbm.at[:, pl.ds(r0a, slab)],
                                      fslab.at[slot], sem_f.at[slot]))

        for c in dma_pair(0, 0):
            c.start()
        for g in range(groups):
            slot = g % 2
            if g + 1 < groups:
                for c in dma_pair(g + 1, (g + 1) % 2):
                    c.start()
            for c in dma_pair(g, slot):
                c.wait()

            r0a = slab_start(g)
            r_end = starts_ref[g * kx + kx - 1, i + 1]
            nch = jnp.clip((r_end - r0a + cw - 1) // cw, 0, slab // cw)

            # all kx taps of the group share the slab: stack their match
            # matrices along sublanes and contract once per chunk (kx fewer
            # loop iterations + MXU issues — the kernel is loop-overhead
            # bound at small Cin). Whether the [kx*T, cp] stack fits is
            # decided by the caller's explicit VMEM estimate.
            eff_kx = kx if stack_taps else 1

            def run_group(j0, _slot=slot):
                # the group's queries arrive pre-stacked [kx*T, G] from the
                # host (j-major rows), so one column slice covers all
                # stacked taps — a per-chunk concatenate of compare planes
                # cost an extra [kx*T, cw] VPU copy every chunk, and Mosaic
                # cannot concat [T, 1] column slices at distinct lane
                # offsets at all
                if eff_kx > 1:
                    qstack = q_ref[:, g:g + 1]              # [kx*T, 1]
                else:
                    qstack = q_ref[pl.ds(j0 * tile, tile), g:g + 1]

                def chunk(c, g_acc):
                    krow = kslab[_slot, :, pl.ds(c * cw, cw)]     # [1, cw]
                    m = (qstack == krow).astype(jnp.bfloat16)  # [ekx*T, cw]
                    f = fslab[_slot, :, pl.ds(c * cw, cw)]        # [cp, cw]
                    return g_acc + jax.lax.dot_general(
                        m, f, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)

                return jax.lax.fori_loop(
                    0, nch, chunk,
                    jnp.zeros((eff_kx * tile, cp), jnp.float32))

            g_all = run_group(0) if stack_taps else None

            for j in range(kx):
                t = g * kx + j
                g_t = (g_all[j * tile:(j + 1) * tile] if stack_taps
                       else run_group(j))
                if parts == 2:
                    g_t = g_t[:, :cin] + g_t[:, cin:]
                g_t = g_t * inb_ref[:, t:t + 1].astype(jnp.float32)
                if fuse_gall:
                    gall[:, t * cin:(t + 1) * cin] = g_t
                else:
                    # 3-pass hi/lo fp32 GEMM (error ~2^-16): hi@hi + hi@lo
                    # + lo@hi — 2x fewer passes than Mosaic's 6-pass fp32
                    g_hi = g_t.astype(jnp.bfloat16)
                    g_lo = (g_t - g_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    w_hi = w_ref[0, t]
                    w_lo = w_ref[1, t]
                    nt = (((1,), (0,)), ((), ()))
                    gall[:] = (gall[:]
                               + jax.lax.dot_general(
                                   g_hi, w_hi, nt,
                                   preferred_element_type=jnp.float32)
                               + jax.lax.dot_general(
                                   g_hi, w_lo, nt,
                                   preferred_element_type=jnp.float32)
                               + jax.lax.dot_general(
                                   g_lo, w_hi, nt,
                                   preferred_element_type=jnp.float32))

        if fuse_gall:
            out_ref[:] = epilogue(jax.lax.dot_general(
                gall[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)).astype(out_ref.dtype)
        else:
            out_ref[:] = epilogue(gall[:]).astype(out_ref.dtype)


def _epilogue_args(plan: MatchPlan, cout: int, scale, shift, out_valid):
    """([2, cout] f32 scale/shift rows, [K_pad, 1] i32 valid) for kernels."""
    sb = jnp.stack([
        jnp.ones((cout,), jnp.float32) if scale is None
        else scale.astype(jnp.float32),
        jnp.zeros((cout,), jnp.float32) if shift is None
        else shift.astype(jnp.float32)])
    k_pad = plan.inb.shape[0]
    ov = jnp.zeros((k_pad, 1), jnp.int32)
    if out_valid is not None:
        ov = ov.at[:out_valid.shape[0], 0].set(out_valid.astype(jnp.int32))
    return sb, ov


def _pallas_conv(feats: jax.Array, in_keys: jax.Array, plan: MatchPlan,
                 weights: jax.Array, slab: int = DEFAULT_SLAB,
                 cw: Optional[int] = None,
                 interpret: bool = False, scale=None, shift=None,
                 relu: bool = False, out_valid=None) -> jax.Array:
    """[K_out_pad, Cout] via the match-matmul kernel."""
    _record_slab_overflow(plan, slab, 'matchconv.slab')
    k_in, cin = feats.shape
    ta, _, cout = weights.shape
    tile = plan.tile
    n_tiles = plan.n_tiles
    dtype = feats.dtype

    # pad inputs so slab DMAs can overrun harmlessly; transpose features so
    # the slab slice runs along (aligned) lanes. Cin is padded to the bf16
    # sublane tile (16) — Mosaic requires HBM slices tile-aligned in every
    # dimension. fp32 features are split hi/lo into two stacked bf16 blocks
    # (exact to ~2^-16 relative) so the match-GEMM runs at bf16 MXU rate.
    k_pad = _round_up(k_in + slab, 128)
    cin_pad = _round_up(cin, 16)
    parts = 1 if dtype == jnp.bfloat16 else 2
    feats_t = jnp.zeros((parts * cin_pad, k_pad), jnp.bfloat16)
    if parts == 1:
        feats_t = feats_t.at[:cin, :k_in].set(feats.T)
    else:
        hi, lo = _split_hi_lo(feats.astype(jnp.float32))
        feats_t = feats_t.at[:cin, :k_in].set(hi.T)
        feats_t = feats_t.at[cin_pad:cin_pad + cin, :k_in].set(lo.T)
    keys_p = jnp.concatenate(
        [in_keys, jnp.full((k_pad - k_in,), INT_MAX, jnp.int32)]
    ).reshape(1, k_pad)

    # pick the richest (fused epilogue, stacked taps) combo whose explicit
    # VMEM estimate fits: Mosaic's scoped limit is 16MB and the real usage
    # is fixed blocks (double-buffered by the pallas pipeline) + weights +
    # gall scratch + the kernel-stack m / g_acc temporaries. Ad-hoc
    # single-term thresholds kept missing combinations (the C=128->192
    # downscale compiled at tile 512 but blew VMEM at tile 256).
    cw = min(cw or DEFAULT_CW, slab)     # chunk width (lanes per MXU pass)
    assert slab % cw == 0
    cp = parts * cin_pad
    # Empirically-calibrated VMEM gates (Mosaic's scoped accounting reuses
    # stack buffers in ways a term-by-term estimate keeps mispredicting).
    # The fused-epilogue footprint tracks ta*cin*(tile + 2*cout): its
    # HIGHEST GEMM materializes bf16 hi/lo copies of weights AND gall.
    # Observed on v5e @ tile 256 / slab 2048: C=128->128 (7.1MB by this
    # metric) compiles, C=128->192 (8.9MB) and C=192->192 (13.3MB) OOM.
    fuse_gall = ta * cin_pad * (tile + 2 * cout) * 4 <= 8 * 1024 * 1024
    # stacking adds [kx*tile, cp] fp32 + [kx*tile, cw] bf16 on the stack;
    # safe alongside the fused epilogue up to ~2.6MB of accumulator
    stack_taps = (plan.kx > 1 and fuse_gall
                  and plan.kx * tile * cp * 4 <= 5 * 2048 * 256)
    groups = ta // plan.kx
    w32 = jnp.zeros((ta, cin_pad, cout), jnp.float32).at[:, :cin, :].set(
        weights.astype(jnp.float32))
    if fuse_gall:
        w_arg = w32.reshape(ta * cin_pad, cout)
        gall_shape = (tile, ta * cin_pad)
    else:
        w_hi, w_lo = _split_hi_lo(w32)
        w_arg = jnp.stack([w_hi, w_lo])                  # [2, Ta, cin, cout]
        gall_shape = (tile, cout)

    fuse_affine = scale is not None or shift is not None
    sb_arg, ov_arg = _epilogue_args(plan, cout, scale, shift, out_valid)
    kernel = functools.partial(
        _match_kernel, taps=ta, kx=plan.kx, cin=cin_pad, slab=slab,
        tile=tile, parts=parts, fuse_gall=fuse_gall, cw=cw,
        stack_taps=stack_taps, fuse_affine=fuse_affine, relu=relu)

    # pre-stack queries per tap-group: [n_tiles*kx*tile, G] with j-major
    # rows, so the kernel reads one column slice per group instead of
    # concatenating kx lane-offset column slices (which costs a VPU copy
    # per chunk and is unsupported by Mosaic's concat anyway)
    kx = plan.kx
    q_stacked = _plan_qs(plan)
    inb_arg = plan.inb32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((kx * tile, groups), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),        # stacked queries
            pl.BlockSpec((tile, ta), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),        # inb
            pl.BlockSpec((tile, 1), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),        # out_valid rows
            pl.BlockSpec(memory_space=pltpu.HBM),         # keys
            pl.BlockSpec(memory_space=pltpu.HBM),         # featsT
            pl.BlockSpec(memory_space=pltpu.VMEM),        # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),        # scale/shift rows
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, slab), jnp.int32),          # key slabs (x2)
            pltpu.VMEM((2, parts * cin_pad, slab),
                       jnp.bfloat16),                     # feat slabs (x2)
            pltpu.VMEM(gall_shape, jnp.float32),          # G stack / acc
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops = 2 * n_tiles * ta * slab * tile * cin
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, cout), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n_tiles * 27 * slab * cin * 2,
            transcendentals=0),
        interpret=interpret,
    )(plan.starts, q_stacked, inb_arg, ov_arg, keys_p,
      feats_t, w_arg, sb_arg)
    return out


# ---------------------------------------------------------------------------
# VMEM-gather backend: precomputed rulebook rows + in-register butterfly
# gather. The one-hot match contraction costs tile*window*2C MACs per
# (group, chunk) REGARDLESS of how few rows actually match; once the rows
# are known (plan_rows — shared by every conv on the indice_key, spconv's
# rulebook reuse), the gather is a handful of tpu.dynamic_gather ops per
# 128-lane chunk: the feature slab still streams HBM->VMEM by bracket, but
# the MXU only runs the real weight GEMM. Measured (v5e sim, 9 taps,
# serialized DMA): C=80 8.8 ms vs 11.6 one-hot, C=16 6.0 vs 7.3 — and the
# compare/pos work is paid once per coordinate set instead of per conv.
#
# Mosaic constraints that shaped this kernel (probed on v5e):
# - tpu.dynamic_gather only gathers within ONE vreg of lanes, so slab
#   positions are decomposed as (chunk, vreg, lane) and selected per vreg.
# - gather indices must carry a concrete layout: broadcasting a [1, N] row
#   read from a ref yields a replicated layout Mosaic rejects ("Invalid
#   input layout" on vector.broadcast); pltpu.repeat of the full 8-sublane
#   block is the working (and faster) form — hence the 8x-duplicated
#   rows_stack layout.
# - value-level dynamic_slice is unsupported: all vreg pieces are static
#   slices inside a fori_loop over bracket chunks.
# ---------------------------------------------------------------------------

def _vgather_kernel(*refs, taps: int, kx: int,
                    cin: int, cout: int, slab: int, tile: int, cw: int,
                    col_w: int = 0, gemm: str = 'highest',
                    packed: bool = False, fuse_affine: bool = False,
                    relu: bool = False, tail: str = 'loop',
                    with_dw: bool = False):
    """One output tile: bracket slab DMAs, butterfly row gather, GEMM.

    packed=True: the slab holds bf16 channel PAIRS bitcast into f32 lanes
    ([cin//2, slab] f32); the gather runs on the packed f32 (half the
    instructions), then one pltpu.bitcast unpacks to [cin, 128] bf16 with
    channels interleaved (2c, 2c+1) — verified even-interleave semantics.
    Weights arrive pre-interleaved to match, so the GEMM is oblivious.

    col_w>0: rT_ref holds COLUMN-RELATIVE positions and cb_ref the
    per-column 128-aligned bases (attach_rows): each 128-lane column
    gathers from its own col_w-wide FAST window at the column base (the
    butterfly shrinks from cw//128 vregs x nch chunks to col_w//128 vregs,
    once), then a data-dependent fori_loop extends the window to nv_ref
    vregs for the rare columns whose matches span wider (density skew on
    realistic scenes) — exact up to the slab, zero iterations for the
    99%+ of columns that fit col_w.

    with_dw=True (training backward over a DUAL plan): an extra xs_ref
    block carries the forward input features at this tile's rows, and a
    second output dw_ref [taps*cin, cx] (constant block index — lives in
    VMEM across the whole sequential grid) accumulates the per-tap weight
    gradient ``dw[u] += g_stack_u^T-gather @ xs`` — the gathered rows are
    shared with the d_feats GEMM, so the weight gradient costs one extra
    MXU contraction per group and zero extra gathers.
    """
    if with_dw:
        (starts_ref, live_ref, cb_ref, nv_ref, rT_ref, ov_ref, xs_ref,
         feats_hbm, w_ref, sb_ref, o_ref, dw_ref, fslab, sem_f) = refs
    else:
        (starts_ref, live_ref, cb_ref, nv_ref, rT_ref, ov_ref,
         feats_hbm, w_ref, sb_ref, o_ref, fslab, sem_f) = refs
        xs_ref = dw_ref = None
    i = pl.program_id(0)
    groups = taps // kx
    crows = cin // 2 if packed else cin   # slab/gather channel rows
    rep = crows // 8
    gdtype = jnp.bfloat16 if packed else jnp.float32

    if with_dw:
        @pl.when(i == 0)
        def _init_dw():
            dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(live_ref[i] == 0)
    def _zero_tile():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(live_ref[i] != 0)
    def _run_tile():
        def slab_start(g):
            r0 = starts_ref[g * kx, i]
            return pl.multiple_of((r0 // 128) * 128, 128)

        def dma(g, slot):
            return pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(slab_start(g), slab)], fslab.at[slot],
                sem_f.at[slot])

        dma(0, 0).start()
        acc = jnp.zeros((tile, cout), jnp.float32)
        for g in range(groups):
            slot = g % 2
            if g + 1 < groups:
                dma(g + 1, (g + 1) % 2).start()
            dma(g, slot).wait()
            r0a = slab_start(g)
            span = kx * tile

            if col_w:
                # fast pass: every column gathers its static col_w window;
                # per-column (off, lane, vreg) retained for the tail pass
                cols = []
                infos = []
                for lc in range(span // 128):
                    c_ix = g * (span // 128) + lc
                    off = pl.multiple_of(cb_ref[c_ix, i] - r0a, 128)
                    fcol = fslab[slot, :, pl.ds(off, col_w)]  # [crows, colw]
                    rel_sl = pltpu.repeat(
                        rT_ref[:, g * span + lc * 128:
                               g * span + (lc + 1) * 128], rep, axis=0)
                    lane = rel_sl & 127
                    vreg = rel_sl >> 7                      # miss -> negative
                    colc = jnp.zeros((crows, 128), jnp.float32)
                    for v in range(col_w // 128):
                        piece = fcol[:, v * 128:(v + 1) * 128]
                        gg = jnp.take_along_axis(piece, lane, axis=1)
                        colc = jnp.where(vreg == v, gg, colc)
                    cols.append(colc)
                    infos.append((off, lane, vreg))
                g32 = jnp.concatenate(cols, axis=1)       # [crows, span] f32
                # tail: columns whose matches span past the fast window
                # (density skew). ONE data-dependent fori per GROUP, not per
                # column: a 0-trip per-column fori/cond still costs ~75
                # cycles of scalar branch latency x 54 columns/tile
                # (measured: per-column tail 5.7 ms vs none 3.1 ms at
                # stage-0 C16; a lax.cond guard saved nothing). The group
                # bound nvt is the max needed-vreg count over its columns;
                # clean tiles run zero trips. MSMD_CONV_TAILMODE: 'group'
                # (default), 'loop' (legacy per-column), 'off' (INEXACT —
                # perf probing only).
                if tail == 'loop':
                    parts_l = []
                    for lc in range(span // 128):
                        off, lane, vreg = infos[lc]
                        nv_c = nv_ref[g * (span // 128) + lc, i]

                        def vtail(v, acc, _slot=slot, _off=off, _lane=lane,
                                  _vreg=vreg):
                            p = fslab[_slot, :,
                                      pl.ds(pl.multiple_of(
                                          _off + v * 128, 128), 128)]
                            gg = jnp.take_along_axis(p, _lane, axis=1)
                            return jnp.where(_vreg == v, gg, acc)

                        parts_l.append(jax.lax.fori_loop(
                            col_w // 128, jnp.maximum(nv_c, col_w // 128),
                            vtail, cols[lc]))
                    g32 = jnp.concatenate(parts_l, axis=1)
                elif tail != 'off':
                    nvt_g = nv_ref[g, i]                  # per-group max

                    # carry the per-column pieces as a TUPLE (value-level
                    # dynamic_slice is unsupported by Mosaic — static
                    # python indexing into the carried tuple instead)
                    def ttrip(v, cols_, _slot=slot, _infos=infos):
                        out = []
                        for lc in range(span // 128):
                            off, lane, vreg = _infos[lc]
                            # slices beyond a narrow column's own span can
                            # never select (vreg==v unmatched there), but
                            # must stay inside the slab scratch
                            po = jnp.minimum(off + v * 128, slab - 128)
                            p = fslab[_slot, :,
                                      pl.ds(pl.multiple_of(po, 128), 128)]
                            gg = jnp.take_along_axis(p, lane, axis=1)
                            out.append(jnp.where(vreg == v, gg, cols_[lc]))
                        return tuple(out)

                    cols = jax.lax.fori_loop(
                        col_w // 128, jnp.maximum(nvt_g, col_w // 128),
                        ttrip, tuple(cols))
                    g32 = jnp.concatenate(cols, axis=1)
                g_here = pltpu.bitcast(g32, jnp.bfloat16) if packed else g32
            else:
                r_end = starts_ref[g * kx + kx - 1, i + 1]
                nch = jnp.clip((r_end - r0a + cw - 1) // cw, 0, slab // cw)
                # [8, kx*tile] rows of this group's taps (8 equal sublanes)
                rel8 = rT_ref[:, g * span:(g + 1) * span] - r0a

                def gchunk(cc, g_acc, _rel8=rel8, _slot=slot):
                    f = fslab[_slot, :, pl.ds(cc * cw, cw)]  # [crows, cw]
                    cols = []
                    for lc in range(span // 128):
                        rel_sl = pltpu.repeat(
                            _rel8[:, lc * 128:(lc + 1) * 128], rep, axis=0)
                        local = rel_sl - cc * cw            # [crows, 128]
                        lane = local & 127
                        vreg = local >> 7                   # miss -> negative
                        colc = jnp.zeros((crows, 128), jnp.float32)
                        for v in range(cw // 128):
                            piece = f[:, v * 128:(v + 1) * 128]
                            gg = jnp.take_along_axis(piece, lane, axis=1)
                            colc = jnp.where(vreg == v, gg, colc)
                        if packed:
                            # unpack the gathered bf16 pairs: [crows, 128]
                            # f32 -> [cin, 128] bf16 (even-interleave)
                            colc = pltpu.bitcast(colc, jnp.bfloat16)
                        cols.append(colc)
                    return g_acc + jnp.concatenate(cols, axis=1)

                g_here = jax.lax.fori_loop(
                    0, nch, gchunk, jnp.zeros((cin, span), gdtype))
            # [cin, kx*tile] -> [kx*cin, tile] sublane stack, one GEMM/group
            g_stack = jnp.concatenate(
                [g_here[:, j * tile:(j + 1) * tile] for j in range(kx)],
                axis=0)
            wg = w_ref[g * kx * cin:(g + 1) * kx * cin, :]
            dims = (((0,), (0,)), ((), ()))
            g_hi = g_lo = None
            if packed:
                # bf16 features: one MXU pass (feature quantization already
                # dominates; weights are bf16 too)
                acc = acc + jax.lax.dot_general(
                    g_stack, wg[:].astype(jnp.bfloat16), dims,
                    preferred_element_type=jnp.float32)
            elif gemm == 'x3':
                # bf16 hi/lo of BOTH operands, drop lo.lo: 3 MXU passes at
                # ~2^-17 relative error vs 6 for HIGHEST (in-kernel splits
                # are not folded away by Mosaic, unlike XLA's
                # xla_allow_excess_precision pitfall)
                g_hi = g_stack.astype(jnp.bfloat16)
                g_lo = (g_stack - g_hi.astype(jnp.float32)).astype(
                    jnp.bfloat16)
                w_hi = wg.astype(jnp.bfloat16)
                w_lo = (wg - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + (
                    jax.lax.dot_general(
                        g_hi, w_hi, dims,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        g_hi, w_lo, dims,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        g_lo, w_hi, dims,
                        preferred_element_type=jnp.float32))
            else:
                acc = acc + jax.lax.dot_general(
                    g_stack, wg, dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            if with_dw:
                # weight gradient: contract the SAME gathered stack with
                # this tile's forward-input features — [kx*cin, tile] @
                # [tile, cx] accumulated over the whole grid
                xs = xs_ref[:]
                r0 = g * kx * cin
                dwd = (((1,), (0,)), ((), ()))
                if packed:
                    dw_ref[r0:r0 + kx * cin, :] += jax.lax.dot_general(
                        g_stack, xs.astype(jnp.bfloat16), dwd,
                        preferred_element_type=jnp.float32)
                else:
                    if g_hi is None:
                        g_hi = g_stack.astype(jnp.bfloat16)
                        g_lo = (g_stack - g_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                    x_hi = xs.astype(jnp.bfloat16)
                    x_lo = (xs - x_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    dw_ref[r0:r0 + kx * cin, :] += (
                        jax.lax.dot_general(
                            g_hi, x_hi, dwd,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            g_hi, x_lo, dwd,
                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(
                            g_lo, x_hi, dwd,
                            preferred_element_type=jnp.float32))
        # fused inference epilogue (see _match_kernel.epilogue): BN affine
        # (or bias) + ReLU on the accumulator already in VMEM, masked by
        # the true out_valid so invalid rows stay exactly zero
        if fuse_affine:
            acc = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        if fuse_affine:
            acc = jnp.where(ov_ref[:] > 0, acc, 0.0)
        o_ref[:] = acc.astype(o_ref.dtype)


# miss sentinel for column-relative rows: large negative keeps both the
# lane (& 127) and the vreg (>> 7) derived in-kernel out of any valid range
COL_MISS = -(1 << 30)
DEFAULT_COL_W = int(os.environ.get('MSMD_CONV_COLW', 256))


def attach_rows(in_keys: jax.Array, plan: MatchPlan,
                slab: int = DEFAULT_SLAB, cw: Optional[int] = None,
                interpret: bool = False,
                col_w: Optional[int] = None,
                site: str = '') -> MatchPlan:
    """Precompute the rulebook for the VMEM-gather backend (once per
    indice_key; shared by every conv on the coordinate set).

    col_w: static gather window per 128-lane output column. Matched
    positions within one column are monotone and span ~(128 + local
    density skew) rows for submanifold plans (~2x that for stride-2
    plans — pass 512 there), so a small window at a per-column base
    replaces the whole-slab butterfly. col_w=0 keeps absolute rows (the
    round-3 chunked-butterfly kernel). Rows beyond the window are
    dropped deterministically and counted ('matchconv.col_w' overflow
    site) like every other fixed capacity in this framework.
    """
    _record_slab_overflow(plan, slab, 'matchconv.rows_slab')
    scope = jax.named_scope('attach_rows')
    scope.__enter__()
    if col_w is None:
        col_w = DEFAULT_COL_W
    col_w = min(col_w, slab)
    n_tiles, tile, ta, kx = plan.n_tiles, plan.tile, plan.num_taps, plan.kx
    groups = ta // kx
    ncol = ta * tile // 128
    tpc = tile // 128
    base = nv_col = None
    if col_w:
        # group slab start for each column (column c belongs to group
        # c // (kx * tile // 128)); starts is [Ta, n_tiles + 1]
        cpg = kx * tile // 128
        g0 = (jnp.arange(ncol, dtype=jnp.int32) // cpg) * kx
        r0a = (plan.starts[g0, :-1].T // 128) * 128       # [n_tiles, ncol]
        if plan.starts128 is not None:
            # window bounds ARITHMETICALLY from the fine slab ranks: the
            # rank of a column's first query lower-bounds its first matched
            # row; the next column's first-query rank upper-bounds its last
            # (a matched key for q < q_next has index < rank(q_next)). No
            # reductions over the materialized rows needed.
            n128 = plan.starts128.shape[1] - 1
            rank_first = plan.starts128[:, :n128].reshape(
                ta, n_tiles, tpc).transpose(1, 0, 2).reshape(n_tiles, ncol)
            rank_next = plan.starts128[:, 1:].reshape(
                ta, n_tiles, tpc).transpose(1, 0, 2).reshape(n_tiles, ncol)
            base = jnp.clip((rank_first // 128) * 128, r0a,
                            r0a + slab - col_w)           # [n_tiles, ncol]
            hi = jnp.minimum(rank_next, r0a + slab)
            nv_col = jnp.maximum((hi - base + 127) // 128, 0)
    if (base is not None and plan.okeys is not None
            and (use_pallas() or interpret) and tile % 128 == 0):
        # windowed rows kernel: each column matches inside its own window
        # instead of scanning the whole bracket (~5x less compare work)
        nvt_w = nv_col.reshape(n_tiles, groups, cpg).max(axis=2)
        rows = _win_plan_rows(in_keys, plan, base.T.astype(jnp.int32),
                              nvt_w.T.astype(jnp.int32), col_w, slab=slab,
                              interpret=interpret)
    else:
        rows = plan_rows(in_keys, plan, slab=slab, cw=cw,
                         interpret=interpret)             # [K_out_pad, Ta]
    rs = rows.reshape(n_tiles, tile, groups, kx)
    rs = rs.transpose(0, 2, 3, 1).reshape(n_tiles, ta * tile)
    cb = nv = None
    if col_w:
        rcol = rs.reshape(n_tiles, ncol, 128)
        hit = rcol >= 0
        from ...utils import overflow
        tag = f'[{site}]' if site else ''
        if base is None:
            # legacy: base = floor(min matched row / 128) * 128, clamped so
            # [base, base + col_w) stays inside the slab window
            mn = jnp.min(jnp.where(hit, rcol, np.int32(INT_MAX)), axis=2)
            base = jnp.clip((mn // 128) * 128, r0a, r0a + slab - col_w)
            mx = jnp.max(jnp.where(hit, rcol, jnp.int32(-1)), axis=2)
            span = jnp.where(mx >= 0, mx - base + 1, 0)   # [n_tiles, ncol]
            nv_col = (span + 127) // 128
        rel = rcol - base[:, :, None]
        # plan_rows only ever matches inside the slab window and nv_col
        # bounds every matched row (see above), so no drops are possible —
        # columns wider than col_w spill into the kernel's per-column tail
        # loop (col_nv). The counter proves the invariant at runtime.
        dropped = hit & ((rel < 0) | (rel >= nv_col[:, :, None] * 128))
        overflow.record(f'matchconv.col_w{tag}', jnp.sum(dropped))
        # distribution gauges (col_w tuning): live-column mean needed
        # vregs and the count spilling past the static window into the
        # kernel's per-column tail loop
        live_col = nv_col > 0
        overflow.gauge(f'need.col_w{tag}', jnp.max(nv_col) * 128)
        overflow.gauge(f'need.col_nv_sum{tag}',
                       jnp.sum(jnp.where(live_col, nv_col, 0)))
        overflow.gauge(f'need.col_live{tag}', jnp.sum(live_col))
        overflow.gauge(f'need.col_tail{tag}',
                       jnp.sum(nv_col > (col_w // 128)))
        nv = nv_col.T.astype(jnp.int32)                   # [ncol, n_tiles]
        nvt = nv_col.reshape(n_tiles, groups, cpg).max(axis=2)
        nvt = nvt.T.astype(jnp.int32)                     # [groups, n_tiles]
        rs = jnp.where(hit & ~dropped, rel,
                       np.int32(COL_MISS)).reshape(n_tiles, ta * tile)
        cb = base.T.astype(jnp.int32)                     # [ncol, n_tiles]
    # 8 duplicated sublanes: pltpu.repeat needs a full sublane block
    rs = jnp.broadcast_to(rs[:, None, :], (n_tiles, 8, ta * tile))
    rs = rs.reshape(n_tiles * 8, ta * tile)
    live = _plan_live(plan).astype(jnp.int32)
    # rows ([K_out_pad, Ta]) ride along for the training backward's weight
    # gradient; XLA DCE drops them from inference traces
    out = dataclasses.replace(plan, rows_stack=rs, live32=live,
                              col_base=cb, col_w=int(col_w), col_nv=nv,
                              col_nvt=(None if not col_w else nvt),
                              rows_raw=rows)
    scope.__exit__(None, None, None)
    return out


def _vgather_vmem_bytes(cin_pad: int, cout: int, ta: int, tile: int,
                        kx: int, slab: int, packed: bool = False,
                        cx: int = 0) -> int:
    fb = 2 if packed else 4                   # bf16 pairs pack 2B/channel
    dw = 0
    if cx:                                    # with_dw: dw acc + xs block
        dw = (ta * cin_pad * max(cx, 128) * 4
              + 2 * tile * max(cx, 128) * 4
              + kx * cin_pad * max(cx, 128) * 4)  # per-group dw temporary
    return (2 * cin_pad * slab * fb           # feature slabs (x2 slots)
            + 2 * 8 * ta * tile * 4           # rows block (pipelined x2)
            + 2 * tile * 128 * 4              # out_valid block (lane-padded)
            + ta * cin_pad * cout * 4         # weights
            + cin_pad * kx * tile * fb * 2    # g_here + gchunk temporaries
            + kx * cin_pad * tile * fb * 3    # g_stack + GEMM operand copies
            + tile * cout * 4 * 2             # acc + out
            + dw)


def _vgather_conv(feats: jax.Array, plan: MatchPlan, weights: jax.Array,
                  slab: int = DEFAULT_SLAB, cw: Optional[int] = None,
                  interpret: bool = False, scale=None, shift=None,
                  relu: bool = False, out_valid=None,
                  xs: Optional[jax.Array] = None):
    """[K_out_pad, Cout] via rows + VMEM butterfly gather; None = no fit.

    ``xs`` ([K_out_pad, Cx] forward-input features, training backward only)
    requests the fused weight-gradient accumulator: the return value
    becomes ``(out, dw)`` with dw [Ta*cin_pad, Cx].
    """
    k_in, cin = feats.shape
    ta, _, cout = weights.shape
    tile = plan.tile
    n_tiles = plan.n_tiles
    cw = min(cw or DEFAULT_CW, slab)
    packed = conv_dtype() == 'bfloat16'
    cin_pad = _round_up(cin, 16 if packed else 8)
    cx = 0 if xs is None else xs.shape[1]
    if (tile % 128) or (cw % 128):
        return None
    for try_slab in (slab, 1024):
        if _vgather_vmem_bytes(cin_pad, cout, ta, tile, plan.kx,
                               try_slab, packed, cx) <= 12 * 1024 * 1024:
            slab = try_slab
            break
    else:
        return None
    cw = min(cw, slab)

    k_pad = _round_up(k_in + slab, 128)
    if packed:
        # bf16 channel pairs packed into f32 lanes: channel 2c in the low
        # 16 bits, 2c+1 in the high — the in-kernel pltpu.bitcast unpacks
        # back to natural channel order (verified by probe).
        # Pack along C in ROW-MAJOR first (one narrow fused pass), then
        # transpose/pad the HALVED [K, cin/2] array: the old
        # zeros.at[...].set(feats.T) chain materialized ~4 full passes
        # over the [cin_pad, k_pad] layout (~4-5 ms per stage-0-scale
        # conv, the top glue cost in the round-4 trace)
        if cin % 2:
            feats = jnp.pad(feats, ((0, 0), (0, 1)))
        fb = feats.astype(jnp.bfloat16).reshape(k_in, -1, 2)
        u16 = jax.lax.bitcast_convert_type(fb, jnp.uint16)
        u32 = jax.lax.bitcast_convert_type(u16, jnp.uint32)   # [K, cin/2]
        half = jax.lax.bitcast_convert_type(u32, jnp.float32).T
        feats_t = jnp.pad(half, ((0, cin_pad // 2 - half.shape[0]),
                                 (0, k_pad - k_in)))
        slab_rows = cin_pad // 2
    else:
        feats_t = jnp.pad(feats.astype(jnp.float32).T,
                          ((0, cin_pad - cin), (0, k_pad - k_in)))
        slab_rows = cin_pad
    w32 = jnp.zeros((ta, cin_pad, cout), jnp.float32).at[:, :cin, :].set(
        weights.astype(jnp.float32))
    w_arg = w32.reshape(ta * cin_pad, cout)

    fuse_affine = scale is not None or shift is not None
    sb_arg, ov_arg = _epilogue_args(plan, cout, scale, shift, out_valid)
    col_w = plan.col_w if plan.col_base is not None else 0
    col_w = min(col_w, slab)
    cb_arg = (plan.col_base if col_w
              else jnp.zeros((1, n_tiles), jnp.int32))
    tail_mode = os.environ.get('MSMD_CONV_TAILMODE', 'group')
    if tail_mode == 'group' and (not col_w or plan.col_nvt is None):
        tail_mode = 'loop'
    # 'group' mode binds the per-GROUP max vreg count; 'loop' the
    # per-column counts (legacy)
    nv_arg = (plan.col_nvt if tail_mode == 'group' else plan.col_nv)
    if not col_w or nv_arg is None:
        nv_arg = jnp.zeros_like(cb_arg)
    kernel = functools.partial(
        _vgather_kernel, taps=ta, kx=plan.kx, cin=cin_pad, cout=cout,
        slab=slab, tile=tile, cw=cw, col_w=col_w, gemm=gemm_mode(),
        packed=packed, fuse_affine=fuse_affine, relu=relu,
        tail=tail_mode, with_dw=xs is not None)
    in_specs = [
        pl.BlockSpec((8, ta * tile), lambda i, *s: (i, 0),
                     memory_space=pltpu.VMEM),        # rows_stack
        pl.BlockSpec((tile, 1), lambda i, *s: (i, 0),
                     memory_space=pltpu.VMEM),        # out_valid rows
    ]
    if xs is not None:
        in_specs.append(pl.BlockSpec((tile, cx), lambda i, *s: (i, 0),
                                     memory_space=pltpu.VMEM))   # fwd feats
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.HBM),         # featsT
        pl.BlockSpec(memory_space=pltpu.VMEM),        # weights
        pl.BlockSpec(memory_space=pltpu.VMEM),        # scale/shift rows
    ]
    out_specs = pl.BlockSpec((tile, cout), lambda i, *s: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles * tile, cout), feats.dtype)
    if xs is not None:
        # the dw accumulator's block index is CONSTANT: it stays pinned in
        # VMEM across the (sequential) grid and is written back once
        out_specs = [out_specs,
                     pl.BlockSpec((ta * cin_pad, cx), lambda i, *s: (0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((ta * cin_pad, cx), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, slab), jnp.float32),  # feat slabs
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    args = [plan.starts, plan.live32, cb_arg, nv_arg, plan.rows_stack,
            ov_arg]
    if xs is not None:
        args.append(xs.astype(jnp.float32))
    args += [feats_t, w_arg, sb_arg]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * ta * cin * cout,
            bytes_accessed=n_tiles * (ta // plan.kx) * slab * cin * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def match_conv(feats, in_keys, plan_weights, slab, cw=None):
    plan, weights = plan_weights
    if use_pallas():
        if plan.rows_stack is not None:
            out = _vgather_conv(feats, plan, weights, slab=slab, cw=cw)
            if out is not None:
                return out
        return _pallas_conv(feats, in_keys, plan, weights, slab=slab, cw=cw)
    return _fallback_conv(feats, in_keys, plan, weights)


def _match_conv_fwd(feats, in_keys, plan_weights, slab, cw=None):
    out = match_conv(feats, in_keys, plan_weights, slab, cw)
    return out, (feats, in_keys, plan_weights)


def _dual_of(plan: MatchPlan):
    """(dual_plan, dual_in_keys) for the transpose conv, or (None, None).

    Submanifold plans with center-symmetric offsets are their OWN
    transpose (dual tap u <-> forward tap Ta-1-u since
    offsets[Ta-1-u] == -offsets[u]); strided plans carry an explicitly
    built dual (build_dual_down_plan) with the same correspondence.
    dual_in_keys None means "reuse the forward in_keys" (subm).
    """
    if plan.kind == 'subm' and plan.dkey is not None:
        ta = len(plan.dkey)
        if all(plan.dkey[t] == -plan.dkey[ta - 1 - t] for t in range(ta)):
            return plan, None
    if plan.dual is not None:
        return plan.dual, plan.dual_keys
    return None, None


def _dw_from_rows(feats, rows, g, weights):
    """d_w[t] = sum_o feats[rows[o, t]] (x) g[o] via gather + einsum.

    Fallback weight gradient when the fused dw kernel does not fit VMEM;
    rows [K_out_pad, Ta] come from the plan's cached rulebook."""
    ta, cin, cout = weights.shape
    k_in = feats.shape[0]
    k_out = rows.shape[0]
    g32 = g[:k_out].astype(jnp.float32)
    fz = jnp.concatenate(
        [feats.astype(jnp.float32), jnp.zeros((1, cin), jnp.float32)])
    safe = jnp.where(rows >= 0, rows, k_in).T              # [Ta, K_out]
    chunk = _rows_tap_chunk(ta, k_out, cin)
    parts = []
    for s0 in range(0, ta, chunk):
        gath = jnp.take(fz, safe[s0:s0 + chunk], axis=0)   # [t, K, Cin]
        parts.append(jnp.einsum(
            'tkc,kd->tcd', gath, g32,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate(parts, axis=0)


def _pallas_bwd(feats, in_keys, plan, weights, g, slab, cw,
                interpret: bool = False):
    """(d_feats, d_w) via the dual-plan Pallas kernels, or None.

    d_feats is the SAME conv kernel over the transpose plan with
    tap-flipped + transposed weights; d_w rides the same gathered rows as
    a fused accumulator (with_dw) when it fits VMEM, else falls back to a
    rows-gather einsum. This replaces the XLA searchsorted + [Ta, K, Cin]
    einsum + segment_sum backward that made training ~30x slower than the
    forward (TPU scatters retire ~1 row/cycle; searchsorted at 27*K
    queries is minutes-scale at full grid)."""
    dual, dkeys = _dual_of(plan)
    if dual is None:
        return None
    ta, cin, cout = weights.shape
    k_in = feats.shape[0]
    src_keys = in_keys if dkeys is None else dkeys
    gsrc = g[:src_keys.shape[0]]
    wb = jnp.swapaxes(weights[::-1], 1, 2)                 # [Ta, Cout, Cin]
    kp = dual.inb.shape[0]
    xs = jnp.zeros((kp, cin), jnp.float32).at[:k_in].set(
        feats.astype(jnp.float32))
    d_feats = d_w = None
    if dual.rows_stack is not None:
        r = _vgather_conv(gsrc, dual, wb, slab=slab, cw=cw, xs=xs,
                          interpret=interpret)
        if r is not None:
            d_feats, dwacc = r
            cgp = dwacc.shape[0] // ta                     # padded Cout
            d_w = jnp.transpose(
                dwacc.reshape(ta, cgp, cin)[::-1, :cout, :], (0, 2, 1))
        else:
            d_feats = _vgather_conv(gsrc, dual, wb, slab=slab, cw=cw,
                                    interpret=interpret)
    if d_feats is None:
        qs_ok = dual.queries is not None or dual.okeys is not None
        if not qs_ok:
            return None
        d_feats = _pallas_conv(gsrc, src_keys, dual, wb, slab=slab, cw=cw,
                               interpret=interpret)
    if d_w is None:
        if plan.rows_raw is not None:
            rows = plan.rows_raw
        elif use_pallas() or interpret:
            rows = plan_rows(in_keys, plan, slab=slab, cw=cw,
                             interpret=interpret)
        else:
            rows = _rows_from_plan(in_keys, plan).T
        d_w = _dw_from_rows(feats, rows, g, weights)
    return (d_feats[:k_in].astype(feats.dtype),
            d_w.astype(weights.dtype))


def _match_conv_bwd_xla(feats, in_keys, plan, weights, g):
    """Reference XLA backward (CPU path / unsupported plans): exact rows
    via searchsorted, d_feats by segment_sum, d_w by gathered einsum."""
    rows = _rows_from_plan(in_keys, plan)                  # [Ta, K_pad]
    ta, cin, cout = weights.shape
    k_in = feats.shape[0]
    hit = rows >= 0
    safe = jnp.where(hit, rows, k_in)
    gw = jnp.einsum('kd,tcd->tkc', g, weights,
                    preferred_element_type=jnp.float32)    # [Ta, K_pad, Cin]
    gw = jnp.where(hit[:, :, None], gw, 0)
    d_feats = jax.ops.segment_sum(
        gw.reshape(-1, cin), safe.reshape(-1),
        num_segments=k_in + 1)[:k_in].astype(feats.dtype)
    gathered = jnp.where(
        hit[:, :, None],
        jnp.take(feats, jnp.minimum(safe, k_in - 1), axis=0), 0)
    d_w = jnp.einsum('tkc,kd->tcd', gathered, g,
                     preferred_element_type=jnp.float32).astype(weights.dtype)
    return d_feats, d_w


def _match_conv_bwd(slab, cw, res, g):
    feats, in_keys, (plan, weights) = res
    if use_pallas():
        out = _pallas_bwd(feats, in_keys, plan, weights, g, slab, cw)
        if out is not None:
            d_feats, d_w = out
            return d_feats, None, (None, d_w)
    d_feats, d_w = _match_conv_bwd_xla(feats, in_keys, plan, weights, g)
    return d_feats, None, (None, d_w)


match_conv.defvjp(_match_conv_fwd, _match_conv_bwd)


def match_conv_fused(feats, in_keys, plan, weights, scale, shift, relu,
                     out_valid, slab, cw=None):
    """Inference-only conv with a fused affine+ReLU+mask epilogue.

    The epilogue runs inside the Pallas kernels (no extra HBM pass); NOT
    differentiable — training goes through ``match_conv`` + MaskedBatchNorm.
    Returns (out, fused): fused=False means the XLA fallback ran and the
    caller must apply the epilogue itself.
    """
    if use_pallas():
        if plan.rows_stack is not None:
            out = _vgather_conv(feats, plan, weights, slab=slab, cw=cw,
                                scale=scale, shift=shift, relu=relu,
                                out_valid=out_valid)
            if out is not None:
                return out, True
        return _pallas_conv(feats, in_keys, plan, weights, slab=slab, cw=cw,
                            scale=scale, shift=shift, relu=relu,
                            out_valid=out_valid), True
    return _fallback_conv(feats, in_keys, plan, weights), False


def apply_epilogue_xla(features, valid, scale=None, shift=None,
                       relu: bool = False):
    """One fused XLA elementwise pass: affine + ReLU + valid mask."""
    y = features.astype(jnp.float32)
    if scale is not None:
        y = y * scale
    if shift is not None:
        y = y + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.where(valid[:, None], y, 0).astype(features.dtype)


def apply_match_conv(st: SparseTensor, plan: MatchPlan, weights: jax.Array,
                     out_coords, out_valid, out_keys, out_spatial_shape,
                     bias=None, slab: int = DEFAULT_SLAB,
                     cw: Optional[int] = None, scale=None, shift=None,
                     relu: bool = False) -> SparseTensor:
    """Run a planned conv and wrap the result as a SparseTensor.

    ``scale``/``shift``/``relu`` request the fused inference epilogue
    (eval-mode BN affine folded by the conv blocks; NOT differentiable).
    ``bias`` alone stays on the differentiable ``match_conv`` path.
    """
    if scale is not None or shift is not None or relu:
        if bias is not None:
            # BN-after-biased-conv folds as (conv + bias)*scale + shift,
            # i.e. the bias enters the shift PRE-scaled (matches the
            # rows-gather path in sparse_blocks, which adds bias first)
            b_eff = bias * scale if scale is not None else bias
            shift = b_eff if shift is None else shift + b_eff
        out, fused = match_conv_fused(st.features, st.keys, plan, weights,
                                      scale, shift, relu, out_valid, slab,
                                      cw)
        out = out[:plan.k_out]
        if not fused:
            out = apply_epilogue_xla(out, out_valid, scale, shift, relu)
        return SparseTensor(features=out, coords=out_coords,
                            valid=out_valid, keys=out_keys,
                            spatial_shape=tuple(out_spatial_shape),
                            batch_size=st.batch_size)
    out = match_conv(st.features, st.keys, (plan, weights), slab, cw)
    out = out[:plan.k_out]
    # rows for invalid queries are exactly zero straight from the kernel
    # (inb carries the valid mask into every tap's contribution, and any
    # INT_MAX query matching the INT_MAX key tail gathers all-zero invalid
    # features), so the [K, C] valid-mask select — ~2 ms/conv at union
    # capacities, ~15 ms/iter across the flagship — is only needed to keep
    # a bias off the invalid rows
    if bias is not None:
        out = jnp.where(out_valid[:, None], out + bias, 0)
    return SparseTensor(features=out, coords=out_coords, valid=out_valid,
                        keys=out_keys,
                        spatial_shape=tuple(out_spatial_shape),
                        batch_size=st.batch_size)


# ---------------------------------------------------------------------------
# Rows + gather-GEMM path (big-C convs)
#
# For wide channels the one-hot match GEMM does (tile + window) * cp MACs
# per output row; a plain row gather costs one descriptor per (tap, row)
# instead. The kernel below extracts the matched ROW INDICES (the spconv
# rulebook itself) with the same slab/bracket machinery but no feature DMA
# and a trivial contraction, so it is ~C-independent; the conv then runs as
# jnp.take + einsum, natively differentiable, with the same exact-fp32 bf16
# hi/lo compensation. Rows depend only on the coordinate set, so they are
# computed ONCE per indice_key and shared by every conv on that set
# (spconv's rulebook reuse).
# ---------------------------------------------------------------------------

# MEASURED (v5e, agg1 = K160k/C80, 2-conv shared-rows block, loop-in-jit):
# rows+gather 68.5 ms vs match 39.1 ms — the gather engine's per-descriptor
# cost (27 taps x K rows x 2 convs) dwarfs the rows extraction savings, so
# this path is DISABLED by default (0). Kept as an opt-in alternative and
# as the differentiable big-C training path.
ROWS_MIN_C = int(os.environ.get('MSMD_ROWS_MIN_C', 0))


def _rows_kernel(starts_ref, q_ref, inb_ref, keys_hbm, out_ref, kslab,
                 sem_k, *, taps: int, kx: int, slab: int, tile: int,
                 cw: int):
    """Per tile: matched input row per (output row, tap); -1 = no match."""
    i = pl.program_id(0)
    groups = taps // kx
    live_tile = q_ref[0, 0] != jnp.int32(INT_MAX)

    @pl.when(jnp.logical_not(live_tile))
    def _zero_tile():
        out_ref[:] = jnp.full_like(out_ref, -1)

    @pl.when(live_tile)
    def _run_tile():
        def slab_start(g):
            r0 = starts_ref[g * kx, i]
            return pl.multiple_of((r0 // 128) * 128, 128)

        def dma(g, slot):
            return pltpu.make_async_copy(
                keys_hbm.at[:, pl.ds(slab_start(g), slab)],
                kslab.at[slot], sem_k.at[slot])

        dma(0, 0).start()
        for g in range(groups):
            slot = g % 2
            if g + 1 < groups:
                dma(g + 1, (g + 1) % 2).start()
            dma(g, slot).wait()
            r0a = slab_start(g)
            r_end = starts_ref[g * kx + kx - 1, i + 1]
            nch = jnp.clip((r_end - r0a + cw - 1) // cw, 0, slab // cw)
            qstack = q_ref[:, g:g + 1]                    # [kx*T, 1]

            def chunk(c, acc):
                # slab-relative match position via two exact hi/lo MXU
                # dots (see _win_rows_kernel.win_v: cross-lane
                # sum(where(m, iota)) reduces cost ~10x the compare)
                krow = kslab[slot, :, pl.ds(c * cw, cw)]  # [1, cw]
                m = (qstack == krow).astype(jnp.bfloat16)  # [kx*T, cw]
                # tpu.iota is integer-only: build i32, then convert
                posv = jax.lax.broadcasted_iota(
                    jnp.int32, (cw, 1), 0).astype(jnp.float32) \
                    + (c * cw + 1).astype(jnp.float32)    # +1: 0 = miss
                hi = posv.astype(jnp.bfloat16)
                lo = (posv - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                nt = (((1,), (0,)), ((), ()))
                return acc + (
                    jax.lax.dot_general(
                        m, hi, nt, preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        m, lo, nt, preferred_element_type=jnp.float32))

            acc = jax.lax.fori_loop(
                0, nch, chunk,
                jnp.zeros((kx * tile, 1), jnp.float32)).astype(jnp.int32)
            for j in range(kx):
                t = g * kx + j
                rj = acc[j * tile:(j + 1) * tile]         # [T, 1]
                ok = (inb_ref[:, t:t + 1] != 0) & (rj > 0)
                out_ref[:, t:t + 1] = jnp.where(ok, rj - 1 + r0a, -1)


def _win_rows_kernel(starts_ref, cb_ref, nvt_ref, ok_ref, inb_ref, keys_hbm,
                     out_ref, kslab, sem_k, *, taps: int, kx: int,
                     slab: int, tile: int, win: int, dkey):
    """Windowed rows: match each 128-row output column inside its own
    ~`win`-wide key window (cb/nv from the plan's fine slab ranks) instead
    of scanning the whole tile bracket — the bracket scan compared every
    query against ~(kx*tile + skew) keys, ~5x the work (the top single
    cost category of the round-3 flagship trace, ~57 ms/frame).

    The tail over wide columns is ONE data-dependent fori per tap GROUP
    (bound nvt = group max needed vregs): per-column dynamic control flow
    costs ~75 cycles even at zero trips (measured, see _vgather_kernel).
    Tail windows beyond a column's own span add exactly zero: keys past
    rank(next column's first query) exceed every query of this column.

    Queries are AFFINE: q = ok_ref (output base keys, [tile, 1] block) +
    static dkey[t] — the [K, Ta] query materialization and its stacked
    transpose (~3-5 ms/plan of lane-padded HBM traffic) never happen.
    Invalid rows hold INT_MAX: wrapped INT_MAX+dkey never equals a real
    key, and sentinel self-matches are masked by inb."""
    i = pl.program_id(0)
    groups = taps // kx
    tpc = tile // 128
    live_tile = ok_ref[0, 0] != jnp.int32(INT_MAX)

    @pl.when(jnp.logical_not(live_tile))
    def _zero_tile():
        out_ref[:] = jnp.full_like(out_ref, -1)

    @pl.when(live_tile)
    def _run_tile():
        def slab_start(g):
            r0 = starts_ref[g * kx, i]
            return pl.multiple_of((r0 // 128) * 128, 128)

        def dma(g, slot):
            return pltpu.make_async_copy(
                keys_hbm.at[:, pl.ds(slab_start(g), slab)],
                kslab.at[slot], sem_k.at[slot])

        dma(0, 0).start()
        for g in range(groups):
            slot = g % 2
            if g + 1 < groups:
                dma(g + 1, (g + 1) % 2).start()
            dma(g, slot).wait()
            r0a = slab_start(g)

            nt = (((1,), (0,)), ((), ()))
            # accumulators hold the COLUMN-WINDOW-RELATIVE position + 1
            # (epilogue adds cbr + r0a back). The match row is extracted
            # as MXU dots instead of a cross-lane sum(where(m, iota)):
            # the lane reduce cost ~10x the compare itself (log-tree
            # shuffles per vreg).

            # fast-window position vectors are static per step: build them
            # ONCE per group instead of per column (18 columns would each
            # re-materialize the iota+convert chain if Mosaic misses the
            # CSE)
            pos_fast = [
                (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                 .astype(jnp.float32)
                 + float(v * 128 + 1)).astype(jnp.bfloat16)
                for v in range(win // 128) if (v + 1) * 128 <= 256]

            def win_fast(v, acc, qcol, cbr, _slot=slot):
                # static fast-window step: relative positions are
                # v*128+1 .. v*128+128 <= win <= 256, every one EXACTLY
                # representable in bf16 (integers up to 2^8) -- ONE dot,
                # no hi/lo split. cb is clipped to r0a + slab - win at
                # build time, so the slice never leaves the slab.
                kw = kslab[_slot, :, pl.ds(cbr + v * 128, 128)]
                m = (qcol == kw).astype(jnp.bfloat16)     # [128, 128]
                return acc + jax.lax.dot_general(
                    m, pos_fast[v], nt,
                    preferred_element_type=jnp.float32)

            def win_v(v, acc, qcol, cbr, _slot=slot):
                # dynamic tail step: relative positions reach nv*128
                # (> 256), carried as an exact hi/lo bf16 pair
                po = jnp.minimum(cbr + v * 128, slab - 128)
                kw = kslab[_slot, :,
                           pl.ds(pl.multiple_of(po, 128), 128)]
                m = (qcol == kw).astype(jnp.bfloat16)     # [128, 128]
                # tpu.iota is integer-only: build i32, then convert
                posv = jax.lax.broadcasted_iota(
                    jnp.int32, (128, 1), 0).astype(jnp.float32) \
                    + (po - cbr + 1).astype(jnp.float32)
                hi = posv.astype(jnp.bfloat16)            # top 8 bits
                lo = (posv - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                contrib = (jax.lax.dot_general(
                    m, hi, nt, preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        m, lo, nt, preferred_element_type=jnp.float32))
                # a clamped slice would re-read already-counted keys:
                # contribute only within the slab window
                return acc + jnp.where(cbr + v * 128 <= slab - 128,
                                       contrib, 0.0)

            accs = []
            cols = []
            for j in range(kx):
                for lc in range(tpc):
                    t = g * kx + j
                    c_ix = t * tpc + lc
                    qcol = ok_ref[pl.ds(lc * 128, 128), 0:1] \
                        + jnp.int32(dkey[t])              # [128, 1]
                    cbr = pl.multiple_of(cb_ref[c_ix, i] - r0a, 128)
                    acc = jnp.zeros((128, 1), jnp.float32)
                    for v in range(win // 128):           # fast window
                        acc = (win_fast if (v + 1) * 128 <= 256
                               else win_v)(v, acc, qcol, cbr)
                    accs.append(acc)
                    cols.append((qcol, cbr))
            nvt_g = nvt_ref[g, i]

            # per-column accs carried as a TUPLE (value-level
            # dynamic_slice is unsupported by Mosaic)
            def ttrip(v, accs_, _cols=cols):
                return tuple(
                    win_v(v, acc, qcol, cbr)
                    for acc, (qcol, cbr) in zip(accs_, _cols))

            accs = jax.lax.fori_loop(
                win // 128, jnp.maximum(nvt_g, win // 128), ttrip,
                tuple(accs))
            for j in range(kx):
                for lc in range(tpc):
                    t = g * kx + j
                    _, cbr = cols[j * tpc + lc]
                    acc = accs[j * tpc + lc].astype(jnp.int32)
                    ok = (inb_ref[pl.ds(lc * 128, 128), t:t + 1] != 0) \
                        & (acc > 0)
                    out_ref[pl.ds(lc * 128, 128), t:t + 1] = jnp.where(
                        ok, acc - 1 + cbr + r0a, -1)


def _win_plan_rows(in_keys: jax.Array, plan: MatchPlan, cb: jax.Array,
                   nvt: jax.Array, win: int, slab: int = DEFAULT_SLAB,
                   interpret: bool = False) -> jax.Array:
    """[K_out_pad, Ta] matched rows via the windowed kernel."""
    k_in = in_keys.shape[0]
    tile, ta, kx = plan.tile, plan.num_taps, plan.kx
    n_tiles = plan.n_tiles
    k_pad = _round_up(k_in + slab, 128)
    keys_p = jnp.concatenate(
        [in_keys, jnp.full((k_pad - k_in,), INT_MAX, jnp.int32)]
    ).reshape(1, k_pad)
    kernel = functools.partial(_win_rows_kernel, taps=ta, kx=kx, slab=slab,
                               tile=tile, win=win, dkey=plan.dkey)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),        # output base keys
            pl.BlockSpec((tile, ta), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((tile, ta), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, slab), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, ta), jnp.int32),
        interpret=interpret,
    )(plan.starts, cb, nvt, plan.okeys.reshape(-1, 1), plan.inb32, keys_p)


def plan_rows(in_keys: jax.Array, plan: MatchPlan,
              slab: int = DEFAULT_SLAB, cw: Optional[int] = None,
              interpret: bool = False) -> jax.Array:
    """[K_out_pad, Ta] matched input rows (-1 = miss) for a plan."""
    if not use_pallas() and not interpret:
        return _rows_from_plan(in_keys, plan).T
    k_in = in_keys.shape[0]
    tile, ta, kx = plan.tile, plan.num_taps, plan.kx
    n_tiles = plan.n_tiles
    groups = ta // kx
    cw = min(cw or DEFAULT_CW, slab)
    k_pad = _round_up(k_in + slab, 128)
    keys_p = jnp.concatenate(
        [in_keys, jnp.full((k_pad - k_in,), INT_MAX, jnp.int32)]
    ).reshape(1, k_pad)
    q_stacked = _plan_qs(plan)
    kernel = functools.partial(_rows_kernel, taps=ta, kx=kx, slab=slab,
                               tile=tile, cw=cw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((kx * tile, groups), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, ta), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((tile, ta), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, slab), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, ta), jnp.int32),
        interpret=interpret,
    )(plan.starts, q_stacked, plan.inb32, keys_p)


def rows_gather_conv(feats: jax.Array, rows: jax.Array,
                     weights: jax.Array) -> jax.Array:
    """Exact-fp32 gather-GEMM conv from precomputed rows.

    feats [K_in, Cin] fp32/bf16; rows [K_out_pad, Ta]; weights
    [Ta, Cin, Cout]. Natively differentiable (gather + einsum only).
    The hi/lo features are INTERLEAVED into one [K, 2C] bf16 array so the
    gather issues one descriptor per (tap, row) — not two.
    """
    k_in, cin = feats.shape
    ta, _, cout = weights.shape
    k_out = rows.shape[0]
    if feats.dtype == jnp.bfloat16:
        f2 = feats
        w_parts = [weights.astype(jnp.bfloat16)]
    else:
        hi, lo = _split_hi_lo(feats.astype(jnp.float32))
        f2 = jnp.concatenate([hi, lo], axis=1)           # [K, 2C] bf16
        w_hi, w_lo = _split_hi_lo(weights.astype(jnp.float32))
        w_parts = None
    f2z = jnp.concatenate(
        [f2, jnp.zeros((1, f2.shape[1]), f2.dtype)], axis=0)
    safe = jnp.where(rows < 0, k_in, rows).T             # [Ta, K_out]
    out = jnp.zeros((k_out, cout), jnp.float32)
    chunk = _rows_tap_chunk(ta, k_out, f2.shape[1])
    for s in range(0, ta, chunk):
        g = jnp.take(f2z, safe[s:s + chunk], axis=0)     # [t, K, 2C] bf16
        if feats.dtype == jnp.bfloat16:
            out = out + jnp.einsum(
                'tkc,tcd->kd', g, w_parts[0][s:s + chunk],
                preferred_element_type=jnp.float32)
        else:
            wh = w_hi[s:s + chunk]
            # hi@w_hi + lo@w_hi via the stacked [2C] block, + hi@w_lo
            w_cat = jnp.concatenate([wh, wh], axis=1)    # [t, 2C, D]
            out = out + jnp.einsum(
                'tkc,tcd->kd', g, w_cat,
                preferred_element_type=jnp.float32)
            out = out + jnp.einsum(
                'tkc,tcd->kd', g[..., :cin], w_lo[s:s + chunk],
                preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def _rows_tap_chunk(ta: int, k: int, c2: int) -> int:
    per_tap = k * c2 * 2
    return max(1, min(ta, (256 * 1024 * 1024) // max(per_tap, 1)))
