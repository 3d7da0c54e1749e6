"""Device-mesh / sharding utilities for data-parallel training.

TPU-native replacement of the reference's DDP+NCCL stack (SURVEY §2.7:
``MMDistributedDataParallel`` wrap, torch.distributed.launch, NaiveSyncBN):
a 1-axis ``Mesh`` over all devices, batch-sharded inputs, replicated
parameters. Under jit, XLA GSPMD inserts the gradient all-reduce (psum over
the data axis) automatically, and global-mean BatchNorm moments give
cross-replica SyncBN without explicit collectives. Multi-slice scaling only
changes the mesh construction (devices spanning DCN), not the model code.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None,
                       axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f'data_parallel_mesh: requested {n_devices} devices but only '
                f'{len(devices)} visible ({[d.platform for d in devices]}). '
                'For a virtual CPU mesh set JAX_PLATFORMS=cpu and '
                'XLA_FLAGS=--xla_force_host_platform_device_count=N before '
                'the first jax import.')
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = 'data'):
    """Shard every array leaf along its leading (batch) axis."""
    def spec_for(leaf):
        if hasattr(leaf, 'ndim') and leaf.ndim >= 1:
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, spec_for(leaf)), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), tree)


def batch_sharding(mesh: Mesh, axis_name: str = 'data'):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
