"""Static-shape sparse voxel tensor for TPU sparse convolution.

TPU-native re-design of ``spconv.SparseConvTensor`` (reference
mmdet3d/ops/spconv/structure.py and the external spconv-2.x used by
mmdet3d/models/middle_encoders/sparse_encoder.py:111). Instead of a
dynamically-sized (features, indices) pair plus a CUDA hash rulebook, a
``SparseTensor`` is a fixed-capacity pytree:

    features [K, C]   — zero rows for empty slots
    coords   [K, 4]   — int32 (b, z, y, x); -1 rows for empty slots
    valid    [K]      — bool row mask

with the *sorted-key invariant*: rows are ordered by ascending packed voxel
key ``((b*Z + z)*Y + y)*X + x`` with invalid rows (key = INT32_MAX) at the
end. The sorted key array IS the hash table — neighbor lookup is a
``searchsorted`` — so submanifold convs share it for free (the reference's
``indice_key`` rulebook reuse, ops/sparse_block.py:159) and coordinate set
ops (union for sparse_add, intersection for the GMA modality split) are
linear merges.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

INT_MAX = jnp.iinfo(jnp.int32).max


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseTensor:
    features: jax.Array      # [K, C]
    coords: jax.Array        # [K, 4] (b, z, y, x), -1 when invalid
    valid: jax.Array         # [K] bool
    keys: jax.Array          # [K] int32 packed keys, INT_MAX when invalid
    spatial_shape: Tuple[int, int, int] = dataclasses.field(
        metadata=dict(static=True))
    batch_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.features.shape[0]

    @property
    def num_channels(self) -> int:
        return self.features.shape[1]

    def replace_features(self, features) -> 'SparseTensor':
        return dataclasses.replace(self, features=features)


def pack_keys(coords, spatial_shape: Tuple[int, int, int], batch_size: int,
              valid=None):
    """Pack (b, z, y, x) coords into sortable int32 keys.

    The full flat index must fit in int31: batch_size * prod(spatial_shape)
    < 2**31 (true for the reference's largest grid 8 x 41 x 1440 x 1440).
    """
    z, y, x = spatial_shape
    assert batch_size * z * y * x < 2 ** 31, (
        f'key space too large for int32: {batch_size}x{z}x{y}x{x}')
    key = ((coords[:, 0] * z + coords[:, 1]) * y + coords[:, 2]) * x + \
        coords[:, 3]
    if valid is not None:
        key = jnp.where(valid, key, INT_MAX)
    return key.astype(jnp.int32)


def unpack_keys(keys, spatial_shape: Tuple[int, int, int]):
    """Inverse of pack_keys -> [K, 4] coords (garbage for INT_MAX rows)."""
    z, y, x = spatial_shape
    xc = keys % x
    rest = keys // x
    yc = rest % y
    rest = rest // y
    zc = rest % z
    bc = rest // z
    return jnp.stack([bc, zc, yc, xc], axis=-1)


def make_sparse_tensor(features, coords, valid,
                       spatial_shape: Tuple[int, int, int], batch_size: int,
                       assume_sorted: bool = False,
                       capacity: int = None,
                       site: str = '',
                       two_run_split: int = None) -> SparseTensor:
    """Build a SparseTensor, establishing the sorted-key invariant.

    ``capacity``: optional row budget smaller than the input row count —
    the sorted layout keeps the smallest keys, so truncation drops only
    the largest-key valid rows (counted at ``sparse.make.capacity[site]``
    when any are valid; size the cap from the occupancy gauges). Downstream
    conv cost scales with capacity, so tight caps directly buy time.

    ``two_run_split``: declare that rows ``[:two_run_split]`` and
    ``[two_run_split:]`` are each already key-sorted (a coordinate-union
    concat). The post-sort feature permutation is then two-run monotone
    and runs on the one-hot MXU slab kernel (merge_take) instead of a
    descriptor-rate XLA row gather.
    """
    keys = pack_keys(coords, spatial_shape, batch_size, valid)
    if not assume_sorted:
        # one sort carries the permutation; valid/coords are then derived
        # ARITHMETICALLY from the sorted keys instead of being gathered —
        # each narrow per-row gather costs one gather-engine descriptor per
        # element (~1 ms per 250k rows), and the old path paid three
        iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
        keys, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
        valid = keys != INT_MAX
        if site:
            from ...utils import overflow
            overflow.gauge(f'occ.make[{site}]', jnp.sum(valid))
        if capacity is not None and capacity < keys.shape[0]:
            from ...utils import overflow
            tag = f'[{site}]' if site else ''
            overflow.record(f'sparse.make.capacity{tag}',
                            jnp.sum(valid[capacity:]))
            # slice BEFORE the feature gather: the row gather is
            # descriptor-rate bound, so gathering only the kept rows saves
            # the whole overflow tail (unions gather concat-sized inputs)
            keys = keys[:capacity]
            order = order[:capacity]
            valid = valid[:capacity]
        if two_run_split is not None:
            from .merge_take import merge_take_rows
            features = merge_take_rows(features, order, two_run_split,
                                       site=site or 'make')
        else:
            features = features[order]
        coords = unpack_keys(jnp.where(valid, keys, 0), spatial_shape)
    features = jnp.where(valid[:, None], features, 0)
    coords = jnp.where(valid[:, None], coords, -1)
    return SparseTensor(features=features, coords=coords, valid=valid,
                        keys=keys, spatial_shape=tuple(spatial_shape),
                        batch_size=batch_size)


# above this cell count the direct-indexed table (int32 per grid cell) is
# considered too large and lookups fall back to binary search
DENSE_TABLE_MAX_CELLS = 256 * 1024 * 1024


def num_cells(spatial_shape: Tuple[int, int, int], batch_size: int) -> int:
    z, y, x = spatial_shape
    return batch_size * z * y * x


# int32 entries per hash-table row: scalar gathers from a 1D table run at
# the gather engine's per-element rate (~5ns/el, 440ms/frame at full scale);
# 64-byte row gathers hit the vectorized path, so the table is stored 2D
# and lookups fetch whole rows then select lanes on the VPU.
TABLE_LANES = 16


def build_hash_table(st: 'SparseTensor'):
    """Direct-indexed coord->row table, stored as [num_rows, 16] int32.

    The packed key IS the flat grid index, so the voxel hash is simply a
    scatter of row ids into a dense int32 grid. Entry for cell c lives at
    ``table[c // 16, c % 16]``; cells beyond the grid hold -1. This is
    dramatically faster on TPU than ``searchsorted`` (whose 17-round
    binary-search while-loop dominated the encoder profile), and the 2D
    layout makes each lookup a vectorized row gather instead of a scalar
    gather. Returns None when the grid is too large (callers fall back to
    binary search).
    """
    cells = num_cells(st.spatial_shape, st.batch_size)
    if cells > DENSE_TABLE_MAX_CELLS:
        return None
    k = st.capacity
    padded = ((cells + TABLE_LANES) // TABLE_LANES + 1) * TABLE_LANES
    idx = jnp.where(st.valid, st.keys, padded - 1)
    table = jnp.full((padded,), -1, jnp.int32)
    table = table.at[idx].set(jnp.arange(k, dtype=jnp.int32), mode='drop')
    # last row is a sacrificial parking row; it only ever holds the rows of
    # invalid entries, which no valid query can reference
    table = table.at[padded - 1].set(-1)
    return table.reshape(-1, TABLE_LANES)


def lookup(st_keys, query_keys, table=None):
    """Hash lookup: row index of each query key, or -1 if absent.

    With a dense 2D ``table`` (build_hash_table) this is one vectorized row
    gather + a VPU lane select; otherwise a binary search over the
    sorted-key invariant.
    """
    if table is not None:
        lanes = table.shape[1]
        padded = table.shape[0] * lanes
        safe = jnp.clip(query_keys, 0, padded - 1)
        row = safe // lanes
        lane = safe - row * lanes
        vals = jnp.take(table, row, axis=0)              # [Q, lanes]
        onehot = (lane[:, None] ==
                  jnp.arange(lanes, dtype=lane.dtype)[None, :])
        picked = jnp.sum(jnp.where(onehot, vals, 0), axis=-1)
        valid = (query_keys >= 0) & (query_keys < padded)
        return jnp.where(valid, picked, -1)
    pos = jnp.searchsorted(st_keys, query_keys, side='left')
    pos = jnp.minimum(pos, st_keys.shape[0] - 1)
    found = (st_keys[pos] == query_keys) & (query_keys != INT_MAX)
    return jnp.where(found, pos, -1)


def sparse_add(a: SparseTensor, b: SparseTensor, capacity: int) -> SparseTensor:
    """Coordinate-union elementwise add of two sparse tensors.

    TPU-native equivalent of spconv's ``Fsp.sparse_add`` (used by the GMA
    encoder, sparse_multimodal_encoder_painting.py:455). Channel counts must
    match; output has static ``capacity`` rows (overflow beyond capacity is
    dropped deterministically from the high-key end).

    Precondition: each input's VALID keys are unique (the sorted-key
    invariant every constructor in this module establishes); a violated
    invariant would silently drop the 3rd+ member of a key group here.
    """
    assert a.spatial_shape == b.spatial_shape
    assert a.num_channels == b.num_channels
    # the gather-form union below slices to exactly `capacity` rows, which
    # can only pad-with-invalid up to the concatenated input size
    assert capacity <= a.capacity + b.capacity, (
        f'sparse_add capacity {capacity} exceeds input row budget '
        f'{a.capacity}+{b.capacity}')
    keys = jnp.concatenate([a.keys, b.keys])
    feats = jnp.concatenate([a.features, b.features], axis=0)
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # sorted keys + permutation in one sort; validity is key != INT_MAX
    # (saves two narrow per-row gathers — see make_sparse_tensor)
    skey, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    svalid = skey != INT_MAX
    head = jnp.concatenate([svalid[:1], (skey[1:] != skey[:-1]) & svalid[1:]])
    from ...utils import overflow
    # framework-only cap: spconv's sparse_add output is dynamically sized
    overflow.record('sparse.sparse_add.union_cap',
                    jnp.maximum(jnp.sum(head) - capacity, 0))
    overflow.gauge('occ.sparse_add_union', jnp.sum(head))
    # gather-form union: each input's valid keys are unique (sorted-key
    # invariant), so every output group is 1 or 2 adjacent sorted rows.
    # The compaction sort carries (key|dup-bit, row, next-row) payloads so
    # NO narrow per-row gathers remain (each ~5 ns/element on the gather
    # engine), and the two member-feature rows come from the one-hot MXU
    # slab kernel (merge_take) instead of descriptor-rate XLA row gathers.
    # This replaced, in turn, the original segment-sum scatter-add union
    # (~16 ms/iter across the GMA stages: scatters retire ~1 row/cycle).
    head_pos = jnp.where(head, iota, INT_MAX)
    skey_next = jnp.concatenate([skey[1:],
                                 jnp.full((1,), INT_MAX, jnp.int32)])
    dup_here = (skey_next == skey) & (skey != INT_MAX)
    packed = skey.astype(jnp.uint32) * 2 + dup_here      # key < 2^31
    order_next = jnp.concatenate([order[1:], jnp.zeros((1,), jnp.int32)])
    hp, spacked, sorder, sorder_next = jax.lax.sort(
        (head_pos, packed, order, order_next), num_keys=1,
        is_stable=False)
    hp = hp[:capacity]
    spacked = spacked[:capacity]
    out_valid = hp < n
    out_keys = jnp.where(out_valid, (spacked >> 1).astype(jnp.int32),
                         INT_MAX)
    dup = (spacked & 1).astype(bool) & out_valid
    # invalid tail rows are INACTIVE for the slab kernel (INT_MAX): they
    # contribute zero, stay outside the window-base math, and are zeroed
    # again below
    idx0 = jnp.where(out_valid, sorder[:capacity], INT_MAX)
    idx1 = sorder_next[:capacity]
    from .merge_take import merge_take_rows
    merged = merge_take_rows(feats, idx0, a.capacity, idx1, dup,
                             site='sparse_add')
    out_feats = jnp.where(out_valid[:, None], merged, 0)
    coords = unpack_keys(out_keys, a.spatial_shape)
    coords = jnp.where(out_valid[:, None], coords, -1)
    return SparseTensor(
        features=out_feats, coords=coords,
        valid=out_valid, keys=out_keys, spatial_shape=a.spatial_shape,
        batch_size=max(a.batch_size, b.batch_size))


def to_dense_bev(st: SparseTensor):
    """Densify to a channels-last BEV map [B, H, W, C*D].

    Matches the reference's ``dense(); view(N, C*D, H, W)`` collapse
    (sparse_encoder.py:128-132) with channel index c*D + d, but in NHWC
    layout, which is the natural TPU conv layout.
    """
    d, h, w = st.spatial_shape
    b = st.batch_size
    c = st.num_channels
    flat = (st.coords[:, 0] * d + st.coords[:, 1]) * (h * w) + \
        st.coords[:, 2] * w + st.coords[:, 3]
    # invalid rows park at index b*d*h*w, which is OUT OF BOUNDS for the
    # size-b*d*h*w output: mode='drop' turns them into true non-writes, so
    # unique_indices=True is honest (valid keys are unique by invariant;
    # duplicate in-bounds writes would be XLA UB otherwise)
    flat = jnp.where(st.valid, flat, b * d * h * w)
    dense = jnp.zeros((b * d * h * w, c), st.features.dtype)
    # the sorted-key invariant orders flat ascending (same axis order as
    # the packed key) with invalid rows parked past the end
    dense = dense.at[flat].set(st.features, mode='drop',
                               indices_are_sorted=True, unique_indices=True)
    dense = dense.reshape(b, d, h, w, c)
    dense = jnp.transpose(dense, (0, 2, 3, 4, 1))  # [B, H, W, C, D]
    return dense.reshape(b, h, w, c * d)


def from_dense_bev():  # pragma: no cover - placeholder for symmetry
    raise NotImplementedError


def lookup_sorted_pair(a_keys, b_keys):
    """Mutual row lookup between two SORTED unique key arrays.

    Returns (row_in_b_for_a [Ka], row_in_a_for_b [Kb]) with -1 for misses.
    One 64-bit sort of the concatenation replaces two dense hash tables
    (the 2D-table variant costs ~18ms/set at a 1440-grid full scale and
    340MB of HBM; this is ~2ms). Equal keys sort (a, b)-adjacent via a tag
    bit, so each match is a neighbor pair in the sorted order.
    """
    ka = a_keys.shape[0]
    kb = b_keys.shape[0]
    keys = jnp.concatenate([a_keys, b_keys])
    tag = jnp.concatenate([jnp.zeros((ka,), jnp.uint32),
                           jnp.ones((kb,), jnp.uint32)])
    src = jnp.concatenate([jnp.arange(ka, dtype=jnp.int32),
                           jnp.arange(kb, dtype=jnp.int32)])
    # the tag bit is packed INTO the sort key (keys < 2^31, so key*2+tag
    # fits uint32): one unstable single-key sort replaces the stable
    # 3-operand argsort + three narrow permutation gathers, and (key, tag)
    # pairs are unique so the order is still deterministic
    tagged = keys.astype(jnp.uint32) * 2 + tag
    stagged, ssrc = jax.lax.sort((tagged, src), num_keys=1, is_stable=False)
    skey = (stagged >> 1).astype(jnp.int32)
    stag = (stagged & 1).astype(jnp.int32)
    n = ka + kb
    # an 'a' row at p matches the 'b' row at p+1 iff same key & tag flips
    nxt_same = jnp.concatenate(
        [(skey[1:] == skey[:-1]) & (stag[:-1] == 0) & (stag[1:] == 1)
         & (skey[1:] != INT_MAX),
         jnp.zeros((1,), bool)])
    prv_same = jnp.concatenate(
        [jnp.zeros((1,), bool),
         (skey[1:] == skey[:-1]) & (stag[:-1] == 0) & (stag[1:] == 1)
         & (skey[1:] != INT_MAX)])
    nxt_src = jnp.concatenate([ssrc[1:], jnp.zeros((1,), jnp.int32)])
    prv_src = jnp.concatenate([jnp.zeros((1,), jnp.int32), ssrc[:-1]])
    # un-sort by ONE more unstable sort instead of two narrow scatters:
    # TPU scatters retire ~1 row/cycle (~2x 0.4 ms/stage at full scale),
    # a 2-operand u32 sort of the same length is ~3x cheaper. orig is the
    # unique global input position (a rows then b rows), so sorting
    # (orig, match) returns every row's match in original order.
    match = jnp.where((stag == 0) & nxt_same, nxt_src,
                      jnp.where((stag == 1) & prv_same, prv_src, -1))
    orig = (ssrc.astype(jnp.uint32) + stag.astype(jnp.uint32)
            * jnp.uint32(ka))
    _, match_orig = jax.lax.sort((orig, match), num_keys=1,
                                 is_stable=False)
    return match_orig[:ka], match_orig[ka:]
