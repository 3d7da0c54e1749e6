"""Fused masked nearest-neighbor argmin (distance matrix never hits HBM).

The GMA orphan-gating NN (models/middle_encoders/gma_encoder.py::
approx_nn_3d; reference fps_NN_fast,
sparse_multimodal_encoder_painting.py:276-323) needs, per stage, the
nearest valid same-batch point of B (up to 160k voxels) for every point of
A — twice. As plain XLA the [Na, Nb] fp32 distance matrix materializes
(~1.3GB per direction per stage at full scale). This kernel streams B in
lane chunks held in VMEM, fusing the 3-wide coordinate GEMM, the masking,
and a running (min, argmin) — HBM traffic drops to the inputs + two [Na]
vectors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float('inf')


def _nn_kernel(a_ref, ab_ref, bt_ref, bb_ref, b2_ref, idx_ref, d2_ref, *,
               nb_pad: int, cw: int, tile: int):
    a = a_ref[...]                                       # [tile, 3->lanes]
    a3 = a[:, :3]
    a2 = jnp.sum(a3 * a3, axis=1, keepdims=True)         # [tile, 1]
    ab = ab_ref[:, :1]                                   # [tile, 1] int32

    def chunk(c, carry):
        acc_min, acc_idx = carry
        bt = bt_ref[:, pl.ds(c * cw, cw)]                # [8, cw] (rows 0-2)
        # HIGHEST: coordinate products reach ~2e6 — a DEFAULT (single
        # bf16 pass) dot would corrupt distances by thousands
        prod = jax.lax.dot_general(
            a3, bt[:3], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [tile, cw]
        d = a2 + b2_ref[:, pl.ds(c * cw, cw)] - 2.0 * prod
        ok = ab == bb_ref[:, pl.ds(c * cw, cw)]          # batch + validity
        d = jnp.where(ok, jnp.maximum(d, 0.0), _INF)
        cmin = jnp.min(d, axis=1, keepdims=True)         # [tile, 1]
        # Mosaic iota must be integer-typed; convert after the offset
        iota = (jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
                + c * cw).astype(jnp.float32)
        cidx = jnp.min(jnp.where(d == cmin, iota, _INF), axis=1,
                       keepdims=True)
        upd = cmin < acc_min
        return (jnp.where(upd, cmin, acc_min),
                jnp.where(upd, cidx, acc_idx))

    acc_min, acc_idx = jax.lax.fori_loop(
        0, nb_pad // cw, chunk,
        (jnp.full((tile, 1), _INF), jnp.full((tile, 1), -1.0)))
    idx_ref[...] = jnp.where(jnp.isfinite(acc_min), acc_idx,
                             -1.0).astype(jnp.int32)
    d2_ref[...] = acc_min


def masked_nn(a, ab, b, bb, b_valid, tile: int = 256, cw: int = 2048,
              interpret: bool = False):
    """Nearest valid same-batch row of ``b`` for every row of ``a``.

    Args:
        a: [Na, 3] fp32; ab: [Na] int32 batch ids (invalid rows of A may
            carry any id — callers mask the result).
        b: [Nb, 3] fp32; bb: [Nb] int32; b_valid: [Nb] bool.
    Returns: (idx [Na] int32 (-1 = none), d2 [Na] fp32 squared distance).
    """
    na = a.shape[0]
    nb = b.shape[0]
    if (jax.default_backend() != 'tpu' and not interpret):
        prod = a @ b.T
        d = (jnp.sum(a * a, -1)[:, None] + jnp.sum(b * b, -1)[None, :]
             - 2.0 * prod)
        ok = (ab[:, None] == bb[None, :]) & b_valid[None, :]
        d = jnp.where(ok, jnp.maximum(d, 0.0), jnp.inf)
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        d2 = jnp.min(d, axis=1)
        return jnp.where(jnp.isfinite(d2), idx, -1), d2

    na_pad = -(-na // tile) * tile
    nb_pad = -(-nb // cw) * cw
    a_p = jnp.zeros((na_pad, 128), jnp.float32).at[:na, :3].set(a)
    ab_p = jnp.full((na_pad, 128), -1, jnp.int32).at[:na, 0].set(ab)
    # batch-id row doubles as the validity mask: invalid/padded B rows get
    # id -2 which never equals a real batch id
    bbv = jnp.where(b_valid, bb, -2)
    bt = jnp.zeros((8, nb_pad), jnp.float32).at[:3, :nb].set(b.T)
    bb_row = jnp.full((1, nb_pad), -2, jnp.int32).at[0, :nb].set(bbv)
    b2_row = jnp.zeros((1, nb_pad), jnp.float32).at[0, :nb].set(
        jnp.sum(b * b, axis=1))

    kernel = functools.partial(_nn_kernel, nb_pad=nb_pad, cw=cw, tile=tile)
    grid = (na_pad // tile,)
    idx, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # a
            pl.BlockSpec((tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # ab
            pl.BlockSpec((8, nb_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # bT
            pl.BlockSpec((1, nb_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # bb (+validity)
            pl.BlockSpec((1, nb_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # |b|^2
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((na_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(a_p, ab_p, bt, bb_row, b2_row)
    return idx[:na, 0], d2[:na, 0]
