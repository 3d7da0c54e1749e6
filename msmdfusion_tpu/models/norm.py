"""Cross-replica batch normalization.

The reference implements SyncBN by hand with all-gather autograd
(mmdet3d/ops/norm.py:10-133, NaiveSyncBatchNorm1d/2d registered as
naiveSyncBN1d/2d). On TPU under a GSPMD-partitioned jit, the MaskedBatchNorm
moments are computed with global jnp sums over the (batch-sharded) leading
axes, so XLA inserts the cross-replica reduction automatically — SyncBN is
the default behavior, not an opt-in layer. These aliases exist so configs
written against the reference names keep working.
"""
from .layers import MaskedBatchNorm

NaiveSyncBatchNorm1d = MaskedBatchNorm
NaiveSyncBatchNorm2d = MaskedBatchNorm

__all__ = ['MaskedBatchNorm', 'NaiveSyncBatchNorm1d', 'NaiveSyncBatchNorm2d']
