"""Dense-grid execution path for sparse convs at coarse stages.

Alternative execution backend: scatter the voxels onto the dense grid,
run a plain dense conv, gather back the active rows. Submanifold semantics
are exact: the dense conv evaluated at the active sites IS the subm conv
(inactive inputs are zero rows), and a strided conv gathered at the active
output coordinate set IS the sparse strided conv. Reference semantics:
spconv SubMConv3d / SparseConv3d (mmdet3d/ops/spconv/conv.py:154-266).

MEASURED (v5e, loop-in-jit, stage-3 scale (11, 360, 360) C=128): XLA's
dense conv runs at ~15-20% MXU utilization whether lowered as a native
NDHWC 3D conv (48 ms) or kz-decomposed into batch-folded 2D convs (63 ms),
vs 15.4 ms for the match-matmul kernel — so this path is DISABLED by
default (MSMD_DENSE_CELLS=0). It remains valuable as (a) a natively
differentiable backend with no custom VJP, and (b) an independent
full-scale oracle for the match engine.

fp32 features go through the same exact bf16 hi/lo split as the match
kernel (matchconv._split_hi_lo): three bf16 conv passes reconstruct fp32
to ~2^-16 relative — XLA's DEFAULT precision would silently run a single
bf16 pass.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .matchconv import _split_hi_lo
from .tensor import SparseTensor, num_cells

# opt-in: use the dense path when batch * cells is at or below this
# (0 = never; see module docstring for why it lost to the match kernel)
DENSE_CELLS_MAX = int(os.environ.get('MSMD_DENSE_CELLS', 0))


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (list, tuple)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def use_dense(st: SparseTensor, kernel_size) -> bool:
    del kernel_size
    return num_cells(st.spatial_shape, st.batch_size) <= DENSE_CELLS_MAX


def scatter_dense(st: SparseTensor) -> jax.Array:
    """[B, Z, Y, X, C] dense grid (zero at inactive cells)."""
    z, y, x = st.spatial_shape
    b = st.batch_size
    c = st.num_channels
    flat = jnp.where(st.valid, st.keys, b * z * y * x)
    dense = jnp.zeros((b * z * y * x + 1, c), st.features.dtype)
    dense = dense.at[flat].set(st.features, mode='drop')
    return dense[:-1].reshape(b, z, y, x, c)


def conv3d_hilo(x: jax.Array, w: jax.Array, stride, padding) -> jax.Array:
    """Dense 3D conv with exact-fp32 bf16 hi/lo splits (3 bf16 passes).

    x: [B, Z, Y, X, C]; w: [kz, ky, kx, Cin, Cout]; padding: per-axis int
    triple (symmetric). Returns fp32 [B, Z', Y', X', Cout].

    The 3D conv is decomposed along kz into kz 2D convs with the Z planes
    folded into the batch dim: XLA/Mosaic lower TPU 2D convs at near-peak
    MXU rates but a direct NDHWC 3D conv ran at ~20% utilization on v5e.
    """
    sz, sy, sx = _triple(stride)
    pz, py, px = _triple(padding)
    kz, ky, kx = w.shape[:3]
    b, z, y, xdim, cin = x.shape
    cout = w.shape[-1]
    z_out = (z + 2 * pz - kz) // sz + 1
    dn = ('NHWC', 'HWIO', 'NHWC')

    def conv2d(a, b_):
        return jax.lax.conv_general_dilated(
            a, b_, window_strides=(sy, sx),
            padding=[(py, py), (px, px)], dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    if x.dtype == jnp.bfloat16:
        pairs = [(x, w.astype(jnp.bfloat16))]
    elif jax.default_backend() != 'tpu':
        # CPU/GPU fp32 convs are exact already; skip the split
        pairs = [(x, w)]
    else:
        xh, xl = _split_hi_lo(x)
        wh, wl = _split_hi_lo(w)
        pairs = [(xh, wh), (xh, wl), (xl, wh)]

    out = None
    for xs, ws in pairs:
        if pz:
            xs = jnp.pad(xs, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
        for dz in range(kz):
            xz = jax.lax.slice_in_dim(xs, dz, dz + sz * (z_out - 1) + 1, 1,
                                      axis=1)
            if sz > 1:
                xz = xz[:, ::sz]
            part = conv2d(xz.reshape(b * z_out, y, xdim, cin), ws[dz])
            out = part if out is None else out + part
    return out.reshape(b, z_out, out.shape[1], out.shape[2], cout)


def dense_sparse_conv(st: SparseTensor, weights: jax.Array, out_coords,
                      out_valid, out_keys, out_spatial_shape, kernel_size,
                      stride, padding, bias=None) -> SparseTensor:
    """Run a subm/strided sparse conv through the dense grid.

    weights: [T, Cin, Cout] in z-major x-fastest tap order (the match-engine
    layout) — reshapes directly to [kz, ky, kx, Cin, Cout].
    """
    kz, ky, kx = _triple(kernel_size)
    cin = st.num_channels
    cout = weights.shape[-1]
    w = weights.reshape(kz, ky, kx, cin, cout)
    dense = scatter_dense(st)
    out = conv3d_hilo(dense, w, stride, padding)
    oz, oy, ox = tuple(out_spatial_shape)
    assert out.shape[1:4] == (oz, oy, ox), (out.shape, out_spatial_shape)
    flat = out.reshape(st.batch_size * oz * oy * ox, cout)
    rows = jnp.take(flat, jnp.where(out_valid, out_keys, 0), axis=0)
    rows = rows.astype(st.features.dtype)
    if bias is not None:
        rows = rows + bias
    rows = jnp.where(out_valid[:, None], rows, 0)
    return SparseTensor(features=rows, coords=out_coords, valid=out_valid,
                        keys=out_keys,
                        spatial_shape=(oz, oy, ox),
                        batch_size=st.batch_size)
