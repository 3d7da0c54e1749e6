"""Sparse conv engine vs dense lax.conv oracle on small grids."""
import numpy as np
import jax
import jax.numpy as jnp

from msmdfusion_tpu.ops.sparse.tensor import (make_sparse_tensor, sparse_add,
                                              to_dense_bev)
from msmdfusion_tpu.ops.sparse.conv import (build_subm_neighbor_table,
                                            downsample_out_coords,
                                            kernel_offsets, sparse_conv,
                                            sparse_maxpool, subm_conv)


def random_sparse(rng, batch=2, shape=(6, 6, 6), cin=4, density=0.2, cap=96):
    z, y, x = shape
    occ = rng.rand(batch, z, y, x) < density
    coords = np.argwhere(occ).astype(np.int32)  # [n, 4] (b, z, y, x)
    n = coords.shape[0]
    assert n <= cap
    feats = rng.randn(n, cin).astype(np.float32)
    pad = cap - n
    coords_p = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    st = make_sparse_tensor(jnp.asarray(feats_p), jnp.asarray(coords_p),
                            jnp.asarray(valid), shape, batch)
    dense = np.zeros((batch, z, y, x, cin), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]] = feats
    return st, dense


def dense_conv3d(dense, weights, kernel, stride=1, padding=1):
    """Oracle: lax 3D conv, weights [T, Cin, Cout] in z-major tap order."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    kz, ky, kx = kernel
    cin, cout = weights.shape[1], weights.shape[2]
    w = weights.reshape(kz, ky, kx, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w),
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return np.asarray(out)


def gather_dense(dense_out, coords, valid):
    coords = np.asarray(coords)
    valid = np.asarray(valid)
    out = np.zeros((coords.shape[0], dense_out.shape[-1]), np.float32)
    c = coords[valid]
    out[valid] = dense_out[c[:, 0], c[:, 1], c[:, 2], c[:, 3]]
    return out


def test_subm_conv_matches_dense(rng):
    st, dense = random_sparse(rng)
    w = rng.randn(27, 4, 8).astype(np.float32) * 0.1
    table = build_subm_neighbor_table(st, 3)
    out = subm_conv(st, jnp.asarray(w), table)
    ref = dense_conv3d(dense, w, 3)
    np.testing.assert_allclose(
        np.asarray(out.features), gather_dense(ref, st.coords, st.valid),
        rtol=1e-4, atol=1e-5)
    # subm: coords unchanged
    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(st.coords))


def test_subm_conv_nonsquare_kernel(rng):
    st, dense = random_sparse(rng, shape=(5, 6, 6))
    w = rng.randn(3, 4, 6).astype(np.float32) * 0.1  # kernel (3, 1, 1)
    table = build_subm_neighbor_table(st, (3, 1, 1))
    out = subm_conv(st, jnp.asarray(w), table)
    ref = dense_conv3d(dense, w, (3, 1, 1), padding=(1, 0, 0))
    np.testing.assert_allclose(
        np.asarray(out.features), gather_dense(ref, st.coords, st.valid),
        rtol=1e-4, atol=1e-5)


def test_strided_sparse_conv_matches_dense(rng):
    st, dense = random_sparse(rng, shape=(6, 6, 6), cap=96)
    w = rng.randn(27, 4, 8).astype(np.float32) * 0.1
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, 3, 2, 1, capacity=96)
    out = sparse_conv(st, jnp.asarray(w), out_keys, out_coords, out_valid,
                      out_shape, 3, 2, 1)
    assert out.spatial_shape == (3, 3, 3)
    ref = dense_conv3d(dense, w, 3, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(out.features),
        gather_dense(ref, out.coords, out.valid), rtol=1e-4, atol=1e-5)
    # every nonzero dense output must be covered by the active set
    active = set(map(tuple, np.asarray(out.coords)[np.asarray(out.valid)]))
    nz = np.argwhere(np.abs(ref).sum(-1) > 1e-6)
    for c in nz:
        assert tuple(c) in active


def test_strided_conv_311(rng):
    """The SparseEncoder conv_out pattern: kernel (3,1,1) stride (2,1,1)."""
    st, dense = random_sparse(rng, shape=(5, 6, 6))
    w = rng.randn(3, 4, 8).astype(np.float32) * 0.1
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, (3, 1, 1), (2, 1, 1), 0, capacity=96)
    out = sparse_conv(st, jnp.asarray(w), out_keys, out_coords, out_valid,
                      out_shape, (3, 1, 1), (2, 1, 1), 0)
    assert out.spatial_shape == (2, 6, 6)
    ref = dense_conv3d(dense, w, (3, 1, 1), stride=(2, 1, 1), padding=0)
    np.testing.assert_allclose(
        np.asarray(out.features),
        gather_dense(ref, out.coords, out.valid), rtol=1e-4, atol=1e-5)


def test_sparse_add_matches_dense(rng):
    st1, d1 = random_sparse(rng, cin=4)
    st2, d2 = random_sparse(np.random.RandomState(7), cin=4)
    out = sparse_add(st1, st2, capacity=192)
    z, y, x = st1.spatial_shape
    dsum = d1 + d2
    coords = np.asarray(out.coords)[np.asarray(out.valid)]
    feats = np.asarray(out.features)[np.asarray(out.valid)]
    np.testing.assert_allclose(
        feats, dsum[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]],
        rtol=1e-5)
    # active set is the union
    n_union = int((np.abs(d1).sum(-1) + np.abs(d2).sum(-1) > 0).sum())
    assert coords.shape[0] == n_union


def test_sparse_maxpool(rng):
    st, dense = random_sparse(rng)
    out = sparse_maxpool(st, 2, 2, 0, capacity=96)
    # dense maxpool oracle over occupied cells only
    ref = jax.lax.reduce_window(
        jnp.asarray(np.where(
            (np.abs(dense).sum(-1, keepdims=True) > 0), dense, -np.inf)),
        -np.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), 'VALID')
    ref = np.asarray(ref)
    got = gather_dense(np.where(np.isfinite(ref), ref, 0), out.coords,
                       out.valid)
    np.testing.assert_allclose(np.asarray(out.features), got, rtol=1e-5)


def test_to_dense_bev(rng):
    st, dense = random_sparse(rng, batch=2, shape=(2, 4, 4), cin=3, cap=64)
    bev = np.asarray(to_dense_bev(st))
    assert bev.shape == (2, 4, 4, 6)
    # channel index = c*D + d
    expected = np.transpose(dense, (0, 2, 3, 4, 1)).reshape(2, 4, 4, 6)
    np.testing.assert_allclose(bev, expected)


def test_lookup_sorted_pair_matches_table_lookup(rng):
    """Merge-based mutual lookup == hash-table lookup on sorted key sets
    (replaces modality_split's dense tables)."""
    import jax.numpy as jnp
    from msmdfusion_tpu.ops.sparse.tensor import (INT_MAX,
                                                  lookup_sorted_pair)
    a = np.unique(rng.randint(0, 5000, 300)).astype(np.int32)
    b = np.unique(rng.randint(0, 5000, 200)).astype(np.int32)
    # pad with INT_MAX invalid rows like real tensors
    a_full = np.concatenate([a, np.full(50, INT_MAX, np.int32)])
    b_full = np.concatenate([b, np.full(30, INT_MAX, np.int32)])
    rb, ra = lookup_sorted_pair(jnp.asarray(a_full), jnp.asarray(b_full))
    rb, ra = np.asarray(rb), np.asarray(ra)
    b_index = {int(k): i for i, k in enumerate(b)}
    a_index = {int(k): i for i, k in enumerate(a)}
    for i, k in enumerate(a):
        assert rb[i] == b_index.get(int(k), -1)
    for j, k in enumerate(b):
        assert ra[j] == a_index.get(int(k), -1)
    # padded rows never match
    assert (rb[len(a):] == -1).all() and (ra[len(b):] == -1).all()


def test_dense_tail_backend_matches_oracle(rng):
    """dense_tail.dense_sparse_conv == the dense-conv oracle for subm and
    strided convs (alternative backend, ops/sparse/dense_tail.py)."""
    from msmdfusion_tpu.ops.sparse.dense_tail import dense_sparse_conv
    st, dense = random_sparse(rng, batch=2, shape=(5, 8, 8), cin=6, cap=128)
    w = rng.randn(27, 6, 5).astype(np.float32) * 0.2
    # submanifold: same coord set, SAME padding k//2
    out = dense_sparse_conv(st, jnp.asarray(w), st.coords, st.valid,
                            st.keys, st.spatial_shape, 3, 1, 1)
    ref = dense_conv3d(dense, w, 3, 1, 1)
    got = np.asarray(out.features)
    coords = np.asarray(st.coords)
    valid = np.asarray(st.valid)
    for i in np.nonzero(valid)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(got[i], ref[b, z, y, x], atol=1e-4)
    # strided conv onto the active downsample coord set
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, 3, 2, 1, 64)
    out2 = dense_sparse_conv(st, jnp.asarray(w), out_coords, out_valid,
                             out_keys, out_shape, 3, 2, 1)
    ref2 = dense_conv3d(dense, w, 3, stride=2, padding=1)
    got2 = np.asarray(out2.features)
    oc = np.asarray(out_coords)
    for i in np.nonzero(np.asarray(out_valid))[0]:
        b, z, y, x = oc[i]
        np.testing.assert_allclose(got2[i], ref2[b, z, y, x], atol=1e-4)
