"""Training-loop observability hooks: JSON scalar log + in-training eval.

TPU-native equivalents of the reference's mmcv hooks
(configs/MSMDFusion_nusc_voxel_LC.py:295-299 `log_config`/`evaluation`):

- ``JsonLogWriter`` mirrors mmcv's TextLoggerHook JSON output
  (``<work_dir>/<timestamp>.log.json``): one JSON object per line with
  ``mode``/``epoch``/``iter`` plus scalars — consumable by
  tools/analysis_tools/analyze_logs.py and any tensorboard converter.
- ``EvalHook`` runs validation every N epochs (reference
  ``evaluation = dict(interval=1)``, mmdet3d eval hook) using a jitted
  inference step and the dataset's own ``evaluate``.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional


class JsonLogWriter:
    """Append-only line-JSON scalar log (mmcv TextLoggerHook format)."""

    def __init__(self, work_dir: str, filename: Optional[str] = None):
        os.makedirs(work_dir, exist_ok=True)
        name = filename or f'{time.strftime("%Y%m%d_%H%M%S")}.log.json'
        self.path = os.path.join(work_dir, name)

    def write(self, mode: str, epoch: int, step: int,
              scalars: Dict[str, float], **extra) -> None:
        rec = dict(mode=mode, epoch=int(epoch), iter=int(step))
        rec.update({k: (float(v) if hasattr(v, '__float__') else v)
                    for k, v in scalars.items()})
        rec.update(extra)
        with open(self.path, 'a') as f:
            f.write(json.dumps(rec) + '\n')


class EvalHook:
    """Run dataset evaluation every ``interval`` epochs during training.

    Args:
        dataset: a built val dataset with ``evaluate(results)``.
        infer_fn: callable(batch) -> list of per-sample detection dicts.
        interval: epochs between evaluations (reference EvalHook.interval).
        max_samples: cap on val samples (smoke-friendly; None = all).
    """

    def __init__(self, dataset, infer_fn: Optional[Callable] = None,
                 interval: int = 1, max_samples: Optional[int] = None):
        self.dataset = dataset
        self.infer_fn = infer_fn
        self.interval = max(int(interval), 1)
        self.max_samples = max_samples

    def should_run(self, epoch: int) -> bool:
        return (epoch + 1) % self.interval == 0

    def run(self, infer_fn: Optional[Callable] = None) -> Dict[str, float]:
        from ..datasets.loader import DataLoader
        infer_fn = infer_fn or self.infer_fn
        loader = DataLoader(self.dataset, 1, shuffle=False, drop_last=False,
                            num_workers=1)
        results = []
        for i, batch in enumerate(loader):
            if self.max_samples is not None and i >= self.max_samples:
                break
            results.extend(infer_fn(batch))
        metrics = self.dataset.evaluate(results)
        out = {k: float(v) for k, v in metrics.items()
               if hasattr(v, '__float__') or isinstance(v, (int, float))}
        # surface capacity-overflow counters in the eval record
        # (MSMD_OVERFLOW_CHECK=1; utils/overflow.py)
        from . import overflow
        if overflow.enabled():
            for site, count in overflow.counters().items():
                out[f'overflow/{site}'] = float(count)
        return out
