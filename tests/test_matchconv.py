"""Unit tests for the sorted-merge match-matmul conv engine.

The Pallas kernel itself only runs on TPU; on CPU these tests cover the
plan builders + XLA fallback against an exact numpy oracle, the hi/lo
bf16 split soundness (regression: XLA's excess-precision rule used to
fold ``lo`` to zero), and the custom-VJP backward vs autodiff of the
fallback. Reference semantics: spconv rulebook gather-GEMM-scatter
(mmdet3d/ops/spconv/ops.py:46-128).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmdfusion_tpu.ops.sparse import matchconv as mc
from msmdfusion_tpu.ops.sparse.tensor import INT_MAX, SparseTensor


def make_st(rng, k_cap, n_valid, shape, c):
    z, y, x = shape
    coords = np.stack([np.zeros(n_valid, np.int32),
                       rng.randint(0, z, n_valid),
                       rng.randint(0, y, n_valid),
                       rng.randint(0, x, n_valid)], 1).astype(np.int32)
    keys = ((coords[:, 0] * z + coords[:, 1]) * y + coords[:, 2]) * x \
        + coords[:, 3]
    _, idx = np.unique(keys, return_index=True)
    order = idx[np.argsort(keys[idx])]
    coords = coords[order]
    n = len(coords)
    pad = k_cap - n
    coords_full = np.concatenate([coords, np.zeros((pad, 4), np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    keys_full = np.concatenate(
        [np.sort(keys[idx]), np.full(pad, INT_MAX, np.int64)]
    ).astype(np.int32)
    feats = rng.randn(k_cap, c).astype(np.float32) * valid[:, None]
    return SparseTensor(features=jnp.asarray(feats),
                        coords=jnp.asarray(coords_full),
                        valid=jnp.asarray(valid), keys=jnp.asarray(keys_full),
                        spatial_shape=shape, batch_size=1)


def oracle_conv(st, plan, w):
    """Exact fp64 conv through the plan's match rows."""
    rows = np.asarray(mc._rows_from_plan(st.keys, plan))   # [Ta, K_pad]
    f = np.asarray(st.features, np.float64)
    out = np.zeros((rows.shape[1], w.shape[2]))
    for t in range(rows.shape[0]):
        hit = rows[t] >= 0
        out[hit] += f[rows[t][hit]] @ np.asarray(w[t], np.float64)
    return out


def dense_oracle(st, w, kernel_size=3):
    """Independent dense-conv oracle (does not trust the plan)."""
    z, y, x = st.spatial_shape
    c = st.features.shape[1]
    dense = np.zeros((z, y, x, c))
    coords = np.asarray(st.coords)
    valid = np.asarray(st.valid)
    feats = np.asarray(st.features, np.float64)
    for i in np.where(valid)[0]:
        dense[coords[i, 1], coords[i, 2], coords[i, 3]] = feats[i]
    offs = mc._offsets_zyx(kernel_size)
    w64 = np.asarray(w, np.float64)
    out = np.zeros((int(valid.sum()), w.shape[2]))
    for j, i in enumerate(np.where(valid)[0]):
        cz, cy, cx = coords[i, 1:]
        for t, (dz, dy, dx) in enumerate(offs):
            nz, ny, nx = cz + dz, cy + dy, cx + dx
            if 0 <= nz < z and 0 <= ny < y and 0 <= nx < x:
                out[j] += dense[nz, ny, nx] @ w64[t]
    return out


def test_split_hi_lo_not_elided():
    """Regression: XLA excess-precision folding used to zero the lo part."""
    x = jnp.asarray(np.random.RandomState(0).randn(64, 16).astype(np.float32))
    hi, lo = jax.jit(mc._split_hi_lo)(x)
    lo32 = np.asarray(lo.astype(jnp.float32))
    assert np.abs(lo32).max() > 0, 'lo part was elided to zero'
    rec = np.asarray(hi.astype(jnp.float32)) + lo32
    rel = np.abs(rec - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 2 ** -15


def test_subm_plan_fallback_matches_dense_oracle(rng):
    st = make_st(rng, 512, 400, (9, 24, 24), 16)
    plan = mc.build_subm_plan(st, 3, tile=128)
    w = (rng.randn(27, 16, 24) * 0.1).astype(np.float32)
    out = np.asarray(mc._fallback_conv(st.features, st.keys, plan,
                                       jnp.asarray(w)))
    ref = dense_oracle(st, w)
    n = ref.shape[0]
    np.testing.assert_allclose(out[:n], ref, rtol=1e-4, atol=1e-4)


def test_plan_oracle_matches_dense_oracle(rng):
    """The plan's match rows reproduce true neighbor structure."""
    st = make_st(rng, 256, 200, (5, 16, 16), 8)
    plan = mc.build_subm_plan(st, 3, tile=128)
    w = (rng.randn(27, 8, 8) * 0.1).astype(np.float32)
    n = int(np.asarray(st.valid).sum())
    np.testing.assert_allclose(
        oracle_conv(st, plan, w)[:n], dense_oracle(st, w), atol=1e-9)


def test_backward_matches_fallback_autodiff(rng):
    st = make_st(rng, 256, 200, (5, 16, 16), 8)
    plan = mc.build_subm_plan(st, 3, tile=128)
    w = jnp.asarray((rng.randn(27, 8, 8) * 0.1).astype(np.float32))

    def loss_custom(f, w_):
        out = mc.match_conv(f, st.keys, (plan, w_), 1024)
        return jnp.sum(out ** 2)

    def loss_ref(f, w_):
        out = mc._fallback_conv(f, st.keys, plan, w_)
        return jnp.sum(out ** 2)

    gf, gw = jax.grad(loss_custom, argnums=(0, 1))(st.features, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(st.features, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='Pallas kernel requires TPU')
def test_pallas_matches_oracle_precisely(rng):
    for c, cout in [(16, 16), (128, 128)]:   # fused + non-fused paths
        st = make_st(rng, 4096, 3200, (21, 180, 180), c)
        plan = mc.build_subm_plan(st, 3)
        w = (rng.randn(27, c, cout) * 0.1).astype(np.float32)
        out = np.asarray(jax.jit(
            lambda f, k: mc._pallas_conv(f, k, plan, jnp.asarray(w))
        )(st.features, st.keys))
        ref = oracle_conv(st, plan, w)
        ko = plan.k_out
        rel = np.abs(out[:ko] - ref[:ko]).max() / np.abs(ref).max()
        assert rel < 1e-4, f'C={c}: rel err {rel}'


def test_attach_rows_layout_matches_searchsorted(rng):
    """rows_stack is the fat lane-stacked view of the exact match rows.

    The VMEM-gather kernel (reference: spconv rulebook reuse across convs
    sharing an indice_key, mmdet3d/ops/spconv/ops.py:46-128) reads lane
    (g*kx + j)*tile + t of tile i as the matched input row of output
    i*tile + t under tap g*kx + j; all 8 sublanes are duplicates (Mosaic's
    pltpu.repeat needs a full sublane block).
    """
    st = make_st(rng, 512, 400, (9, 24, 24), 16)
    plan = mc.build_subm_plan(st, 3, tile=128)
    plan = mc.attach_rows(st.keys, plan, interpret=True)
    rows_ref = np.asarray(mc._rows_from_plan(st.keys, plan)).T  # [K_pad, Ta]
    rs = np.asarray(plan.rows_stack)
    n_tiles, tile, ta = plan.n_tiles, plan.tile, plan.num_taps
    assert rs.shape == (n_tiles * 8, ta * tile)
    got = rs.reshape(n_tiles, 8, ta, tile)
    np.testing.assert_array_equal(got[:, 0], got[:, 7])  # dup sublanes
    want = rows_ref.reshape(n_tiles, tile, ta).transpose(0, 2, 1)
    # rows are stored COLUMN-RELATIVE: absolute = rel + col_base of the
    # 128-lane column; misses hold the COL_MISS sentinel
    assert plan.col_w > 0 and plan.col_base is not None
    cb = np.asarray(plan.col_base)                       # [ncol, n_tiles]
    assert cb.shape == (ta * tile // 128, n_tiles)
    rel = got[:, 0].reshape(n_tiles, ta * tile // 128, 128)
    base = cb.T[:, :, None]
    hit = want.reshape(n_tiles, -1, 128) >= 0
    np.testing.assert_array_equal(
        np.where(hit, rel + base, -1), np.where(hit, want.reshape(
            n_tiles, -1, 128), -1))
    # hits may exceed the col_w FAST window (the kernel's tail loop covers
    # them) but never the per-column needed-vreg bound or the slab
    assert (rel[hit] >= 0).all() and (rel[hit] < mc.DEFAULT_SLAB).all()
    nv = np.asarray(plan.col_nv)                         # [ncol, n_tiles]
    nv_bound = np.broadcast_to(nv.T[:, :, None] * 128, rel.shape)
    assert (rel[hit] < nv_bound[hit]).all()
    assert (rel[~hit] == mc.COL_MISS).all()
    assert (cb % 128 == 0).all()
    live = np.asarray(plan.live32)
    q0 = np.asarray(mc._plan_queries(plan))[::tile, 0]
    np.testing.assert_array_equal(live, (q0 != INT_MAX).astype(np.int32))


def test_match_conv_dispatch_with_rows_on_cpu(rng):
    """A rows-attached plan still runs the XLA fallback off-TPU."""
    st = make_st(rng, 256, 200, (5, 16, 16), 8)
    plan = mc.build_subm_plan(st, 3, tile=128)
    plan = mc.attach_rows(st.keys, plan, interpret=True)
    w = jnp.asarray((rng.randn(27, 8, 8) * 0.1).astype(np.float32))
    out = mc.match_conv(st.features, st.keys, (plan, w), 1024)
    ref = mc._fallback_conv(st.features, st.keys, plan, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='Pallas kernel requires TPU')
def test_vgather_matches_oracle_precisely(rng, monkeypatch):
    """VMEM-gather backend vs the plan-rows fp64 oracle (subm + strided).

    Checks both GEMM modes: 'highest' (6-pass, fp32-exactish) and the
    default 'x3' (bf16 hi/lo, 3 passes, ~2^-17 relative).
    """
    for gemm, tol in [('highest', 1e-5), ('x3', 3e-4)]:
        monkeypatch.setenv('MSMD_CONV_GEMM', gemm)
        for c, cout in [(16, 16), (80, 96)]:
            st = make_st(rng, 4096, 3200, (21, 180, 180), c)
            plan = mc.attach_rows(st.keys, mc.build_subm_plan(st, 3))
            w = (rng.randn(27, c, cout) * 0.1).astype(np.float32)
            out = mc._vgather_conv(st.features, plan, jnp.asarray(w))
            assert out is not None
            out = np.asarray(out)
            ref = oracle_conv(st, plan, w)
            ko = plan.k_out
            rel = np.abs(out[:ko] - ref[:ko]).max() / np.abs(ref).max()
            assert rel < tol, f'gemm={gemm} C={c}: rel err {rel}'


def test_vgather_packed_bf16_interpret(rng, monkeypatch):
    """MSMD_CONV_DTYPE=bfloat16: channel pairs pack into f32 lanes (half
    the gather instructions + slab DMA); accuracy is bf16-level (~2^-8),
    the same effective precision as the reference's default einsum path
    (PLAN.md round-2 finding). Interpret mode verifies the pack/bitcast
    layout contract off-TPU."""
    monkeypatch.setenv('MSMD_CONV_DTYPE', 'bfloat16')
    st = make_st(rng, 512, 400, (9, 24, 24), 16)
    plan = mc.attach_rows(st.keys, mc.build_subm_plan(st, 3, tile=128),
                          interpret=True)
    w = jnp.asarray((rng.randn(27, 16, 16) * 0.1).astype(np.float32))
    out = mc._vgather_conv(st.features, plan, w, interpret=True)
    assert out is not None
    ref = mc._fallback_conv(st.features, st.keys, plan, w)
    o, r = np.asarray(out)[:512], np.asarray(ref)[:512]
    rel = np.abs(o - r).max() / (np.abs(r).max() + 1e-9)
    assert rel < 2e-2, rel
    # odd channel count exercises the pad-to-16 path
    st5 = make_st(rng, 256, 200, (5, 16, 16), 10)
    plan5 = mc.attach_rows(st5.keys, mc.build_subm_plan(st5, 3, tile=128),
                           interpret=True)
    w5 = jnp.asarray((rng.randn(27, 10, 8) * 0.1).astype(np.float32))
    out5 = mc._vgather_conv(st5.features, plan5, w5, interpret=True)
    ref5 = mc._fallback_conv(st5.features, st5.keys, plan5, w5)
    rel5 = (np.abs(np.asarray(out5)[:256] - np.asarray(ref5)[:256]).max()
            / (np.abs(np.asarray(ref5)).max() + 1e-9))
    assert rel5 < 2e-2, rel5


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='Pallas kernel requires TPU')
def test_vgather_packed_bf16_on_tpu(rng, monkeypatch):
    """Packed bf16 kernel vs the fp64 oracle on the real chip."""
    monkeypatch.setenv('MSMD_CONV_DTYPE', 'bfloat16')
    for c, cout in [(16, 16), (80, 96)]:
        st = make_st(rng, 4096, 3200, (21, 180, 180), c)
        plan = mc.attach_rows(st.keys, mc.build_subm_plan(st, 3))
        w = (rng.randn(27, c, cout) * 0.1).astype(np.float32)
        out = mc._vgather_conv(st.features, plan, jnp.asarray(w))
        assert out is not None
        out = np.asarray(out)
        ref = oracle_conv(st, plan, w)
        ko = plan.k_out
        rel = np.abs(out[:ko] - ref[:ko]).max() / np.abs(ref).max()
        assert rel < 2e-2, f'packed C={c}: rel err {rel}'


def test_apply_match_conv_invalid_rows_exactly_zero(rng):
    """apply_match_conv no longer masks its output when bias is None: the
    engine must emit EXACT zeros for invalid output rows (inb carries the
    valid mask; INT_MAX queries can only match zero-feature invalid rows).
    Guards the epilogue-where removal for every future backend."""
    st = make_st(rng, 512, 400, (9, 24, 24), 16)
    plan = mc.build_subm_plan(st, 3, tile=128)
    w = jnp.asarray((rng.randn(27, 16, 24) * 0.1).astype(np.float32))
    out = mc.apply_match_conv(st, plan, w, st.coords, st.valid, st.keys,
                              st.spatial_shape)
    inv = np.asarray(out.features)[~np.asarray(st.valid)]
    assert inv.size and np.abs(inv).max() == 0.0
    # with a bias the valid-mask select must still keep invalid rows zero
    bias = jnp.asarray(rng.randn(24).astype(np.float32))
    out_b = mc.apply_match_conv(st, plan, w, st.coords, st.valid, st.keys,
                                st.spatial_shape, bias=bias)
    inv_b = np.asarray(out_b.features)[~np.asarray(st.valid)]
    assert np.abs(inv_b).max() == 0.0


def make_skewed_st(rng, k_cap, shape, c):
    """Density-skewed coordinate set: one dense z-plane slab next to sparse
    planes, so a tap's shifted window covers wildly different row counts —
    the realistic-scene pattern that makes some 128-lane columns span far
    past the static col_w fast window."""
    z, y, x = shape
    dense_n = int(k_cap * 0.7)
    coords = [np.stack([np.zeros(dense_n, np.int32),
                        np.full(dense_n, z // 2, np.int32),
                        rng.randint(0, y, dense_n),
                        rng.randint(0, x, dense_n)], 1)]
    sparse_n = int(k_cap * 0.2)
    coords.append(np.stack([np.zeros(sparse_n, np.int32),
                            rng.randint(0, z, sparse_n),
                            rng.randint(0, y, sparse_n),
                            rng.randint(0, x, sparse_n)], 1))
    coords = np.concatenate(coords).astype(np.int32)
    keys = ((coords[:, 0] * z + coords[:, 1]) * y + coords[:, 2]) * x \
        + coords[:, 3]
    _, idx = np.unique(keys, return_index=True)
    order = idx[np.argsort(keys[idx])]
    coords = coords[order]
    n = len(coords)
    pad = k_cap - n
    coords_full = np.concatenate([coords, np.zeros((pad, 4), np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    keys_full = np.concatenate(
        [np.sort(keys[idx]), np.full(pad, INT_MAX, np.int64)]
    ).astype(np.int32)
    feats = rng.randn(k_cap, c).astype(np.float32) * valid[:, None]
    return SparseTensor(features=jnp.asarray(feats),
                        coords=jnp.asarray(coords_full),
                        valid=jnp.asarray(valid), keys=jnp.asarray(keys_full),
                        spatial_shape=shape, batch_size=1)


def test_vgather_tail_loop_covers_wide_columns_interpret(rng):
    """Columns spanning past the col_w fast window are gathered EXACTLY by
    the kernel's per-column tail loop (plan.col_nv) — zero dropped matches
    on density-skewed data (the round-3 kernel dropped them)."""
    st = make_skewed_st(rng, 2048, (9, 40, 44), 8)
    plan = mc.build_subm_plan(st, 3, tile=128)
    plan = mc.attach_rows(st.keys, plan, interpret=True, col_w=128)
    # precondition: the skew actually produces wide columns
    assert int(np.asarray(plan.col_nv).max()) > 1, \
        'test scene failed to produce columns wider than col_w'
    w = jnp.asarray((rng.randn(27, 8, 8) * 0.1).astype(np.float32))
    out = mc._vgather_conv(st.features, plan, w, interpret=True)
    assert out is not None
    ref = mc._fallback_conv(st.features, st.keys, plan, w)
    ko = plan.k_out
    np.testing.assert_allclose(np.asarray(out)[:ko], np.asarray(ref)[:ko],
                               rtol=2e-3, atol=2e-3)


def test_attach_rows_no_drops_on_skewed_data(rng):
    """attach_rows must never drop in-slab matches: every hit row of the
    exact searchsorted rulebook appears in rows_stack (column-relative,
    within its column's nv window)."""
    st = make_skewed_st(rng, 2048, (9, 40, 44), 8)
    plan = mc.build_subm_plan(st, 3, tile=128)
    plan = mc.attach_rows(st.keys, plan, interpret=True, col_w=128)
    rows_ref = np.asarray(mc._rows_from_plan(st.keys, plan)).T  # [K_pad, Ta]
    n_tiles, tile, ta = plan.n_tiles, plan.tile, plan.num_taps
    rs = np.asarray(plan.rows_stack).reshape(n_tiles, 8, ta, tile)[:, 0]
    want = rows_ref.reshape(n_tiles, tile, ta).transpose(0, 2, 1)
    cb = np.asarray(plan.col_base)                       # [ncol, n_tiles]
    rel = rs.reshape(n_tiles, ta * tile // 128, 128)
    hit = want.reshape(n_tiles, -1, 128) >= 0
    np.testing.assert_array_equal(
        np.where(hit, rel + cb.T[:, :, None], -1),
        np.where(hit, want.reshape(n_tiles, -1, 128), -1),
        err_msg='attach_rows dropped or mispositioned an in-slab match')


# ---------------------------------------------------------------------------
# Training backward: dual-plan Pallas kernels (round-5)
# ---------------------------------------------------------------------------

def test_lex_floor_key_monotone(rng):
    """_lex_floor_key yields per-tap monotone queries on sorted fine keys.

    Raw per-axis floors are not lex-monotone across axis boundaries (the
    bug the lex-floor fixes); this fuzzes the property the slab brackets
    of dual/inverse plans rely on."""
    st = make_st(rng, 512, 450, (8, 20, 20), 4)
    for stride, pad in [((2, 2, 2), 1), ((2, 1, 1), 0), ((1, 2, 2), (0, 1, 1))]:
        s = np.asarray(stride if isinstance(stride, tuple) else (stride,) * 3)
        p = np.broadcast_to(np.asarray(
            pad if isinstance(pad, tuple) else (pad,) * 3), (3,))
        taps = (mc._offsets_zyx(3) + 1)[::-1]
        out_shape = tuple((np.array(st.spatial_shape) + 2 * p - 3) // s + 1)
        numer = np.asarray(st.coords)[:, None, 1:] + p[None, None] - \
            taps[None, :, :]
        ex = jnp.asarray(numer % s[None, None] == 0)
        o_zyx = jnp.asarray(numer // s[None, None])
        q = np.asarray(mc._lex_floor_key(
            st.coords[:, 0], o_zyx, ex, out_shape))
        valid = np.asarray(st.valid)
        qv = q[valid]                       # rows sorted by fine key
        assert (np.diff(qv, axis=0) >= 0).all(), (stride, pad)


def _vjp_ref(st, plan, w, g):
    out, vjp = jax.vjp(
        lambda f, w_: mc._fallback_conv(f, st.keys, plan, w_),
        st.features, w)
    return vjp(g)


def test_pallas_bwd_subm_interpret(rng):
    """Dual-plan backward == autodiff of the searchsorted fallback (subm:
    the plan is its own transpose; d_w rides the fused dw accumulator)."""
    st = make_st(rng, 384, 300, (5, 16, 16), 8)
    plan = mc.build_subm_plan(st, 3, tile=128)
    plan = mc.attach_rows(st.keys, plan, interpret=True)
    w = jnp.asarray((rng.randn(27, 8, 12) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.randn(plan.inb.shape[0], 12).astype(np.float32))
    got = mc._pallas_bwd(st.features, st.keys, plan, w, g, 1024, None,
                         interpret=True)
    assert got is not None
    gf, gw = got
    gf_r, gw_r = _vjp_ref(st, plan, w, g)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=2e-4, atol=2e-4)


def test_pallas_bwd_strided_interpret(rng):
    """Dual-plan backward for a strided conv (reversed-tap inverse plan)."""
    from msmdfusion_tpu.ops.sparse.conv import downsample_out_coords
    import dataclasses as dc
    st = make_st(rng, 384, 300, (8, 20, 20), 8)
    for ks, stride, pad in [(3, 2, 1), ((3, 1, 1), (2, 1, 1), 0)]:
        out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
            st, ks, stride, pad, 256)
        plan = mc.build_downsample_plan(st, out_coords, out_valid, ks,
                                        stride, pad, tile=128)
        plan = mc.attach_rows(st.keys, plan, interpret=True)
        dual = mc.build_dual_down_plan(st, out_keys, out_shape, ks, stride,
                                       pad, tile=128)
        dual = mc.attach_rows(out_keys, dual, interpret=True)
        plan = dc.replace(plan, dual=dual, dual_keys=out_keys)
        ta = plan.num_taps
        w = jnp.asarray((rng.randn(ta, 8, 12) * 0.1).astype(np.float32))
        g = jnp.asarray(rng.randn(plan.inb.shape[0], 12).astype(np.float32))
        got = mc._pallas_bwd(st.features, st.keys, plan, w, g, 1024, None,
                             interpret=True)
        assert got is not None, (ks, stride)
        gf, gw = got
        gf_r, gw_r = _vjp_ref(st, plan, w, g)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                                   rtol=2e-4, atol=2e-4, err_msg=str(ks))
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                                   rtol=2e-4, atol=2e-4, err_msg=str(ks))


def test_dual_down_plan_rows_are_transpose(rng):
    """The dual plan's match rows are exactly the transposed rulebook."""
    from msmdfusion_tpu.ops.sparse.conv import downsample_out_coords
    st = make_st(rng, 384, 300, (8, 20, 20), 4)
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, 3, 2, 1, 256)
    plan = mc.build_downsample_plan(st, out_coords, out_valid, 3, 2, 1,
                                    tile=128)
    dual = mc.build_dual_down_plan(st, out_keys, out_shape, 3, 2, 1,
                                   tile=128)
    rows_f = np.asarray(mc._rows_from_plan(st.keys, plan))    # [Ta, Ko_pad]
    rows_d = np.asarray(mc._rows_from_plan(out_keys, dual))   # [Ta, Ki_pad]
    ta = rows_f.shape[0]
    pairs_f = {(t, o, i) for t in range(ta)
               for o, i in enumerate(rows_f[t]) if i >= 0}
    pairs_d = {(ta - 1 - u, o, i) for u in range(ta)
               for i, o in enumerate(rows_d[u]) if o >= 0}
    assert pairs_f == pairs_d


def test_inverse_plan_lex_floor_no_dropped_matches(rng):
    """Regression: inverse-plan queries on NON-divisible rows used raw
    per-axis floors, which are not monotone -> slab brackets could miss
    matches. The lex-floor surrogate keeps the plan_rows (bracket) result
    identical to the searchsorted oracle."""
    from msmdfusion_tpu.ops.sparse.conv import downsample_out_coords
    st = make_st(rng, 384, 300, (8, 20, 20), 4)
    out_keys, out_coords, out_valid, out_shape = downsample_out_coords(
        st, 3, 2, 1, 256)
    coarse = SparseTensor(
        features=jnp.zeros((out_keys.shape[0], 4), jnp.float32),
        coords=out_coords, valid=out_valid, keys=out_keys,
        spatial_shape=tuple(int(v) for v in out_shape), batch_size=1)
    inv = mc.build_inverse_plan(coarse, st.coords, st.valid, 3, 2, 1,
                                tile=128)
    got = np.asarray(mc.plan_rows(out_keys, inv, interpret=True))
    want = np.asarray(mc._rows_from_plan(out_keys, inv)).T
    np.testing.assert_array_equal(got, want)
    dual = mc.build_dual_down_plan(st, out_keys, out_shape, 3, 2, 1,
                                   tile=128)
    got_d = np.asarray(mc.plan_rows(out_keys, dual, interpret=True))
    want_d = np.asarray(mc._rows_from_plan(out_keys, dual)).T
    np.testing.assert_array_equal(got_d, want_d)
