"""Pallas (Mosaic TPU) kernel namespace.

The hot-path kernels live next to the ops they accelerate; this package
re-exports them so the TPU-native kernel tier (SURVEY §2.1 — the
replacement for the reference's CUDA extensions under
``mmdet3d/ops/*/src``) has one discoverable surface:

- ``match_conv`` / ``_pallas_conv``: the sorted-merge match-matmul sparse
  convolution engine (``ops/sparse/matchconv.py``) — replaces spconv's
  gather-GEMM-scatter CUDA path (reference
  ``mmdet3d/ops/spconv/src/indice_cuda.cu``, ``reordering_cuda.cu``).
  Slab-DMA double buffering, VPU one-hot key matching, fused MXU tap
  contraction with an fp32 hi/lo bf16 split.
- ``plan_rows`` / ``rows_gather_conv``: rulebook-row extraction kernel +
  differentiable gather-GEMM (the big-C training path).
- ``masked_nn``: fused masked nearest-neighbor argmin
  (``ops/nn_argmin.py``) — replaces the FPS+ball-query CUDA kernels used
  by GMA orphan gating (reference
  ``mmdet3d/ops/furthest_point_sample/src``, ``ops/ball_query/src``); the
  [A, B] distance matrix never leaves VMEM.

All kernels carry an XLA fallback selected via ``MSMD_CONV_BACKEND`` (see
``ops/sparse/matchconv.use_pallas``), so every model also runs on the CPU
interpreter path used by the test suite.
"""
from msmdfusion_tpu.ops.nn_argmin import masked_nn
from msmdfusion_tpu.ops.sparse.matchconv import (
    MatchPlan,
    apply_match_conv,
    attach_rows,
    build_downsample_plan,
    build_inverse_plan,
    build_plan,
    build_subm_plan,
    match_conv,
    plan_rows,
    rows_gather_conv,
    use_pallas,
    use_vgather,
)

__all__ = [
    'MatchPlan', 'apply_match_conv', 'attach_rows',
    'build_downsample_plan', 'build_inverse_plan', 'build_plan',
    'build_subm_plan', 'match_conv', 'masked_nn', 'plan_rows',
    'rows_gather_conv', 'use_pallas', 'use_vgather',
]
