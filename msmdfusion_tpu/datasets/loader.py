"""Threaded prefetching data loader (CPU -> device).

TPU-native replacement for the torch DataLoader worker-process pool the
reference uses (mmdet build_dataloader, workers_per_gpu=8): a thread pool
maps the numpy pipeline over indices, a background prefetcher keeps a queue
of ready host batches, and fixed shapes mean collation is a plain np.stack
(no DataContainer machinery). Device transfer happens in the train loop so
the loader stays framework-agnostic.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack fixed-shape sample dicts into batch arrays; metas -> list."""
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        if key == 'metas':
            batch['metas'] = [s['metas'] for s in samples]
        elif key == 'foreground':
            fg = {}
            for fk in samples[0]['foreground']:
                vals = [s['foreground'][fk] for s in samples]
                fg[fk] = (np.stack(vals) if isinstance(vals[0], np.ndarray)
                          else vals[0])
            batch['foreground'] = fg
        else:
            batch[key] = np.stack([s[key] for s in samples])
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, prefetch: int = 2, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed
        self.rng = np.random.RandomState(seed)

    def set_epoch(self, epoch: int):
        """Deterministic per-epoch shuffle (DistributedSampler.set_epoch
        semantics) so a resumed run sees the order a fresh run would."""
        self.rng = np.random.RandomState(self.seed + epoch)
        if hasattr(self.dataset, 'set_epoch'):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for i in range(nb):
            yield idx[i * self.batch_size:(i + 1) * self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in self._index_batches():
                    if stop.is_set():
                        return
                    samples = list(pool.map(
                        self.dataset.__getitem__, batch_idx.tolist()))
                    samples = [s for s in samples if s is not None]
                    if not samples:
                        continue
                    q.put(collate(samples))
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
