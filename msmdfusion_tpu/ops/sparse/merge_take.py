"""MXU one-hot slab gather for two-run-monotone row indices.

TPU-native replacement for the XLA row gathers that assemble sparse-tensor
coordinate unions and ``sparse_add`` sums (reference semantics: spconv's
``Fsp.sparse_add`` and the GMA union construction,
mmdet3d/models/middle_encoders/sparse_multimodal_encoder_painting.py:430-460):

    out[r] = table[idx[r]]  (+ table[idx2[r]] where dup[r])

XLA's row gather retires ~1 row per ~10 ns regardless of row width (it is
descriptor-rate bound); at the flagship's union scales (26k-188k rows x
81-256 channels, 7 call sites/frame) that is ~11 ms of the trace. This
kernel exploits the *structure* of the indices instead: both streams are
TWO-RUN MONOTONE -- the subsequence of values below the split ``n_a`` is
non-decreasing and so is the subsequence at or above it. That is true of
the permutation a stable key-sort induces on the concatenation of two
key-sorted halves (each half's positions appear in increasing order), and
of any subsequence of such a permutation (sparse_add's ``order[hp]`` /
``order[hp+1]`` streams). Consecutive output rows therefore read from two
narrow sliding windows of the table, which the kernel double-buffer-DMAs
into VMEM and combines with one-hot MXU matmuls:

    out[128, C] = oh_a[128, S] @ win_a[S, C] + oh_b[128, S] @ win_b[S, C]

The one-hot mask carries BOTH streams' hot bits (a duplicate-key row
simply contributes two ones), so sparse_add's ``row0 + dup * row1`` costs
no extra pass, and features stay in natural ``[N, C]`` layout end to end
-- no transposes anywhere. fp32 accuracy: the table is split once outside
into bf16 hi/lo halves (``hi = bf16(x)``, ``lo = bf16(x - hi)``) and two
dots per half reconstruct the fp32 gather to ~2^-16 relative -- the same
contract as the packed-bf16 conv kernels (PLAN.md round-3 precision
finding).

Window invariants (why W = T + slack suffices): within one T-row output
tile, each table row is consumed by at most one (stream, row) slot, and
each half's consumed positions are ascending with no external gaps -- so
a half's index span per tile is <= T (+ the 8-row alignment of the DMA
base). Per 128-row block the span is <= 128 + alignment, so a static
S = 256 one-hot width covers it. Violations (impossible for the documented
callers, but counted anyway) zero the row deterministically and ride the
``merge_take.win[site]`` overflow counter like every other fixed capacity.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max

TILE = 512          # output rows per grid step
SPAN = 256          # one-hot width per 128-row block (per half)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(bases_ref, pab_ref, rel_ref, table_hi, table_lo, out_ref,
            win_hi, win_lo, sem_hi, sem_lo, *, n_streams: int, w: int,
            cp: int, tiles: int):
    """One grid step = TILE output rows.

    bases_ref [J, 2]: per-tile DMA row bases (a-half, b-half absolute row
    in the padded table). pab_ref [J, TILE//128, 2]: per-block one-hot
    bases RELATIVE to the tile window (multiples of 8, <= w - SPAN).
    rel_ref [TILE, 2 * n_streams]: per-row one-hot positions relative to
    the block base (column order a0, b0[, a1, b1]); SPAN = miss.
    """
    j = pl.program_id(0)

    def dma(tile_ix, slot):
        a0 = pl.multiple_of(bases_ref[tile_ix, 0], 8)
        b0 = pl.multiple_of(bases_ref[tile_ix, 1], 8)
        return (
            pltpu.make_async_copy(table_hi.at[pl.ds(a0, w)],
                                  win_hi.at[slot, pl.ds(0, w)],
                                  sem_hi.at[slot, 0]),
            pltpu.make_async_copy(table_hi.at[pl.ds(b0, w)],
                                  win_hi.at[slot, pl.ds(w, w)],
                                  sem_hi.at[slot, 1]),
            pltpu.make_async_copy(table_lo.at[pl.ds(a0, w)],
                                  win_lo.at[slot, pl.ds(0, w)],
                                  sem_lo.at[slot, 0]),
            pltpu.make_async_copy(table_lo.at[pl.ds(b0, w)],
                                  win_lo.at[slot, pl.ds(w, w)],
                                  sem_lo.at[slot, 1]),
        )

    @pl.when(j == 0)
    def _first():
        for c in dma(0, 0):
            c.start()

    @pl.when((j + 1 < tiles) & (j % 2 == 1))
    def _prefetch0():
        for c in dma(j + 1, 0):
            c.start()

    @pl.when((j + 1 < tiles) & (j % 2 == 0))
    def _prefetch1():
        for c in dma(j + 1, 1):
            c.start()

    def body(slot):
        for c in dma(j, slot):
            c.wait()
        nt = (((1,), (0,)), ((), ()))
        for lc in range(TILE // 128):
            pa = pl.multiple_of(pab_ref[j, 2 * lc], 8)
            pb = pl.multiple_of(pab_ref[j, 2 * lc + 1], 8)
            # one-hot masks: hot bits of every stream summed into one
            # mask per half (dup rows contribute weight 1 twice)
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)
            ma = jnp.zeros((128, SPAN), jnp.bfloat16)
            mb = jnp.zeros((128, SPAN), jnp.bfloat16)
            for s in range(n_streams):
                ra = rel_ref[pl.ds(lc * 128, 128), 2 * s:2 * s + 1]
                rb = rel_ref[pl.ds(lc * 128, 128), 2 * s + 1:2 * s + 2]
                ma = ma + (ra == iota).astype(jnp.bfloat16)
                mb = mb + (rb == iota).astype(jnp.bfloat16)
            wa_hi = win_hi[slot, pl.ds(pa, SPAN), :]
            wa_lo = win_lo[slot, pl.ds(pa, SPAN), :]
            wb_hi = win_hi[slot, pl.ds(w + pb, SPAN), :]
            wb_lo = win_lo[slot, pl.ds(w + pb, SPAN), :]
            acc = (jax.lax.dot_general(ma, wa_hi, nt,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       ma, wa_lo, nt, preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       mb, wb_hi, nt, preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       mb, wb_lo, nt, preferred_element_type=jnp.float32))
            out_ref[pl.ds(lc * 128, 128), :] = acc

    # the buffer read index must be static for Mosaic: instantiate the
    # body once per grid parity
    @pl.when(j % 2 == 0)
    def _even():
        body(0)

    @pl.when(j % 2 == 1)
    def _odd():
        body(1)


def _prep_stream(vals, n_a, base_a, base_b, tile_pa, tile_pb):
    """Per-row block-relative one-hot positions for one index stream.

    vals [Mp] (INT_MAX = inactive row for this stream). Returns
    (rel_a, rel_b) [Mp] with SPAN as the miss sentinel.
    """
    mp = vals.shape[0]
    j = jnp.arange(mp, dtype=jnp.int32) // TILE
    blk = (jnp.arange(mp, dtype=jnp.int32) % TILE) // 128
    is_a = vals < n_a
    a_rel = jnp.where(is_a, vals - base_a[j], INT_MAX)
    b_rel = jnp.where(is_a | (vals == INT_MAX), INT_MAX,
                      vals - n_a - base_b[j])
    ra = a_rel - tile_pa[j, blk]
    rb = b_rel - tile_pb[j, blk]
    ra_ok = (ra >= 0) & (ra < SPAN)
    rb_ok = (rb >= 0) & (rb < SPAN)
    dropped = (is_a & (vals != INT_MAX) & ~ra_ok) | \
        (~is_a & (vals != INT_MAX) & ~rb_ok)
    return (jnp.where(ra_ok, ra, SPAN).astype(jnp.int32),
            jnp.where(rb_ok, rb, SPAN).astype(jnp.int32), dropped)


def _block_min(vals, mp):
    """[J, TILE//128] per-128-block minimum (INT_MAX where empty)."""
    return vals.reshape(mp // TILE, TILE // 128, 128).min(axis=2)


def _prep(idx, n_a, n, idx2, dup):
    """Window bases + block-relative one-hot positions (pure XLA)."""
    m = idx.shape[0]
    n_b = n - n_a
    mp = _round_up(max(m, TILE), TILE)
    tiles = mp // TILE
    w = _round_up(TILE + SPAN, 256)

    # streams as absolute positions; INT_MAX marks rows inactive for a
    # stream (padding rows, or non-dup rows of stream 1)
    pad = mp - m
    s0 = jnp.pad(idx, (0, pad), mode='edge').astype(jnp.int32)
    streams = [s0]
    if idx2 is not None:
        s1 = jnp.where(dup, idx2, INT_MAX)
        streams.append(jnp.pad(s1, (0, pad),
                               constant_values=INT_MAX).astype(jnp.int32))

    # per-tile DMA bases (8-aligned) covering every stream's half-values
    a_abs = [jnp.where(s < n_a, s, INT_MAX) for s in streams]
    b_abs = [jnp.where((s >= n_a) & (s != INT_MAX), s - n_a, INT_MAX)
             for s in streams]
    a_min = functools.reduce(jnp.minimum,
                             [_block_min(v, mp).min(axis=1) for v in a_abs])
    b_min = functools.reduce(jnp.minimum,
                             [_block_min(v, mp).min(axis=1) for v in b_abs])
    # upper clamp aligned UP: the window end may over-read (at most 7
    # padded/other-half rows, never addressed by any in-range rel), but a
    # clamp below n - w would push tail rels past the scratch
    base_a = jnp.clip((a_min // 8) * 8, 0, max(0, (n_a - w + 7) // 8 * 8))
    base_b = jnp.clip((b_min // 8) * 8, 0, max(0, (n_b - w + 7) // 8 * 8))

    # per-block one-hot bases relative to the tile window
    j_ix = jnp.arange(mp, dtype=jnp.int32) // TILE
    a_rel = [jnp.where(v != INT_MAX, v - base_a[j_ix], INT_MAX)
             for v in a_abs]
    b_rel = [jnp.where(v != INT_MAX, v - base_b[j_ix], INT_MAX)
             for v in b_abs]
    pa = functools.reduce(jnp.minimum, [_block_min(v, mp) for v in a_rel])
    pb = functools.reduce(jnp.minimum, [_block_min(v, mp) for v in b_rel])
    tile_pa = jnp.clip((pa // 8) * 8, 0, w - SPAN)
    tile_pb = jnp.clip((pb // 8) * 8, 0, w - SPAN)

    rel_cols = []
    dropped = jnp.zeros((), jnp.int32)
    for s in streams:
        ra, rb, drop = _prep_stream(s, n_a, base_a, base_b, tile_pa,
                                    tile_pb)
        rel_cols += [ra, rb]
        live = jnp.arange(mp) < m
        dropped = dropped + jnp.sum(jnp.where(live, drop, False)
                                    .astype(jnp.int32))
    rel = jnp.stack(rel_cols, axis=1)                     # [Mp, 2*ns]
    bases = jnp.stack([base_a, base_b + n_a], axis=1).astype(jnp.int32)
    pab = jnp.stack([tile_pa, tile_pb],
                    axis=2).reshape(tiles, -1).astype(jnp.int32)
    return bases, pab, rel, dropped


def _run(table, bases, pab, rel, n_a, interpret):
    """Invoke the kernel (no overflow side effects -- custom_vjp safe)."""
    n, c = table.shape
    mp, cols = rel.shape
    tiles = mp // TILE
    n_streams = cols // 2
    w = _round_up(TILE + SPAN, 256)
    cp = _round_up(c, 128)
    # table split hi/lo ONCE (fp32 = hi + lo to ~2^-16 rel); rows padded
    # so both window DMAs stay in bounds
    n_pad = _round_up(max(n, n_a + w), 8) + w
    t32 = table.astype(jnp.float32)
    hi = t32.astype(jnp.bfloat16)
    lo = (t32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hi = jnp.pad(hi, ((0, n_pad - n), (0, cp - c)))
    lo = jnp.pad(lo, ((0, n_pad - n), (0, cp - c)))

    kernel = functools.partial(_kernel, n_streams=n_streams, w=w,
                               cp=cp, tiles=tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE, cols), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TILE, cp), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * w, cp), jnp.bfloat16),
            pltpu.VMEM((2, 2 * w, cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, cp), jnp.float32),
        interpret=interpret,
    )(bases, pab, rel, hi, lo)
    return out[:, :c].astype(table.dtype)


def _merge_take_fwd(table, idx, n_a, idx2, dup, site, interpret):
    """Prep + overflow record + kernel (direct/test entry, no custom vjp)."""
    bases, pab, rel, dropped = _prep(idx, n_a, table.shape[0], idx2, dup)
    from ...utils import overflow
    tag = f'[{site}]' if site else ''
    overflow.record(f'merge_take.win{tag}', dropped)
    return _run(table, bases, pab, rel, n_a, interpret)[:idx.shape[0]]


def _xla_take(table, idx, idx2, dup):
    out = jnp.take(table, idx, axis=0)
    if idx2 is not None:
        out = out + jnp.where(dup[:, None],
                              jnp.take(table, idx2, axis=0), 0)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _merge_take(table, prep, streams, m, n_a, interpret):
    bases, pab, rel = prep
    return _run(table, bases, pab, rel, n_a, interpret)[:m]


def _vjp_fwd(table, prep, streams, m, n_a, interpret):
    out = _merge_take(table, prep, streams, m, n_a, interpret)
    return out, (jnp.zeros_like(table, shape=(0,) + table.shape[1:]),
                 table.shape[0], prep, streams)


def _vjp_bwd(m, n_a, interpret, res, g):
    proto, n_rows, prep, streams = res
    idx, idx2, dup = streams
    # transpose of the (sub)permutation gather: plain XLA scatter-add --
    # train-path only, and each table row receives at most a few grads.
    # INT_MAX (inactive) indices drop; their cotangents are zero anyway.
    d = jnp.zeros((n_rows,) + proto.shape[1:], g.dtype)
    d = d.at[idx].add(g, mode='drop')
    if idx2 is not None:
        d = d.at[idx2].add(jnp.where(dup[:, None], g, 0), mode='drop')

    def f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (d.astype(proto.dtype),
            jax.tree_util.tree_map(f0, prep),
            jax.tree_util.tree_map(f0, streams))


_merge_take.defvjp(_vjp_fwd, _vjp_bwd)


def merge_take_available(table, idx, n_a) -> bool:
    from .matchconv import use_pallas
    # n_a must be 8-aligned: the b-half DMA starts at base_b + n_a and
    # the kernel promises Mosaic an 8-aligned sublane start. Every
    # production caller passes a capacity (multiple of 512); odd splits
    # take the exact XLA fallback instead of a misaligned DMA.
    return (use_pallas() and idx.shape[0] >= 4096
            and table.shape[1] >= 16 and n_a % 8 == 0)


def merge_take_rows(table: jax.Array, idx: jax.Array, n_a: int,
                    idx2: Optional[jax.Array] = None,
                    dup: Optional[jax.Array] = None,
                    site: str = '', interpret: bool = False) -> jax.Array:
    """``table[idx] (+ table[idx2] where dup)`` for two-run-monotone idx.

    Falls back to plain XLA gathers off-TPU or below the engagement size.
    ~2^-16 relative accuracy on the kernel path (bf16 hi/lo split); the
    fallback is exact.
    """
    if not (merge_take_available(table, idx, n_a)
            or (interpret and n_a % 8 == 0)):
        return _xla_take(table, idx, idx2, dup)
    bases, pab, rel, dropped = _prep(idx, n_a, table.shape[0], idx2, dup)
    from ...utils import overflow
    tag = f'[{site}]' if site else ''
    overflow.record(f'merge_take.win{tag}', dropped)
    return _merge_take(table, (bases, pab, rel), (idx, idx2, dup),
                       idx.shape[0], n_a, interpret)
