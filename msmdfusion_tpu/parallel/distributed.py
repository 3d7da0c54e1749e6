"""Multi-host initialization and cross-host result collection.

TPU-native equivalents of the reference's distributed launch/IO glue
(SURVEY §2.7):

- ``init_dist``: the ``torch.distributed.launch`` / ``init_dist(launcher,
  backend='nccl')`` analog (reference tools/train.py:132-140,
  tools/dist_train.sh:1-9). On a TPU pod slice this is
  ``jax.distributed.initialize()`` — coordinator discovery comes from the
  TPU runtime environment; for manual launchers the coordinator address,
  process count and process id can be passed explicitly (env
  ``MSMD_COORDINATOR`` / ``MSMD_NUM_PROCESSES`` / ``MSMD_PROCESS_ID``).
- ``global_mesh``: data-parallel mesh over ALL processes' devices (ICI
  within a slice, DCN across slices).
- ``local_batch_slice``: which slice of the global batch this host feeds
  (DistributedGroupSampler analog, rank-sharded dataset indices).
- ``collect_results``: multi-host detection gather — the
  ``collect_results_cpu`` analog (mmdet multi_gpu_test, invoked by
  reference tools/test.py:194-195) built on
  ``jax.experimental.multihost_utils.process_allgather``.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import numpy as np

from .mesh import data_parallel_mesh


def init_dist(launcher: str = 'tpu', **kwargs) -> bool:
    """Initialize multi-host JAX. Returns True if multi-process.

    launcher='tpu': pod-runtime auto discovery (jax.distributed.initialize
    with no args). launcher='manual': explicit coordinator/world info from
    kwargs or MSMD_* env vars. launcher='none': single process (no-op).
    """
    if launcher == 'none':
        return False
    if jax.process_count() > 1:
        return True  # already initialized by the runtime
    try:
        if launcher == 'manual' or os.environ.get('MSMD_COORDINATOR'):
            jax.distributed.initialize(
                coordinator_address=kwargs.get(
                    'coordinator_address',
                    os.environ.get('MSMD_COORDINATOR')),
                num_processes=int(kwargs.get(
                    'num_processes',
                    os.environ.get('MSMD_NUM_PROCESSES', 1))),
                process_id=int(kwargs.get(
                    'process_id', os.environ.get('MSMD_PROCESS_ID', 0))))
        elif launcher == 'tpu':
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environments (tests, one chip) are fine
        return False
    return jax.process_count() > 1


def global_mesh(axis_name: str = 'data'):
    """Data-parallel mesh spanning every process's devices."""
    return data_parallel_mesh(axis_name=axis_name)


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of the global batch."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def shard_indices(num_samples: int, rank: Optional[int] = None,
                  world: Optional[int] = None) -> np.ndarray:
    """Rank-sharded dataset indices (DistributedGroupSampler analog)."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    return np.arange(rank, num_samples, world)


def collect_results(local_results: List[Any]):
    """Gather per-host python detection lists on every host.

    The reference's collect_results_cpu pickles to a tmpdir; with a JAX
    pod the natural transport is process_allgather over the global mesh.
    Array leaves are gathered; the interleaved order of shard_indices is
    restored by the caller via the returned (rank, results) pairs.
    """
    if jax.process_count() == 1:
        return [(0, local_results)]
    from jax.experimental import multihost_utils
    import pickle

    payload = np.frombuffer(pickle.dumps(local_results), dtype=np.uint8)
    # pad to a common max length, exchange lengths first
    n = np.asarray([payload.size], np.int32)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for rank in range(jax.process_count()):
        buf = np.asarray(gathered[rank][:int(all_n[rank])]).tobytes()
        out.append((rank, pickle.loads(buf)))
    return out


def merge_sharded_results(collected, num_samples: int) -> List[Any]:
    """Re-interleave rank-sharded results back into dataset order."""
    merged: List[Any] = [None] * num_samples
    for rank, results in collected:
        idx = shard_indices(num_samples, rank=rank,
                            world=len(collected))
        for i, r in zip(idx, results):
            if i < num_samples:
                merged[i] = r
    return merged
