"""Checkpointing via orbax + torch->jax weight conversion hooks.

TPU-native equivalent of the reference's mmcv CheckpointHook / load_checkpoint
(configs checkpoint_config interval=1; tools/train.py:262-268 meta;
resume_from vs load_from semantics). Checkpoints store
{params, batch_stats, opt_state, step, meta}.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(work_dir: str, step: int, params, batch_stats,
                    opt_state=None, meta: Optional[Dict[str, Any]] = None,
                    name: Optional[str] = None):
    path = os.path.abspath(os.path.join(work_dir, name or f'ckpt_{step}'))
    state = {'params': params, 'batch_stats': batch_stats, 'step': step}
    if opt_state is not None:
        state['opt_state'] = opt_state
    _checkpointer().save(path, state, force=True)
    if meta:
        import json
        with open(os.path.join(path, 'meta.json'), 'w') as f:
            json.dump(meta, f)
    return path


def load_checkpoint(path: str):
    return _checkpointer().restore(os.path.abspath(path))


def latest_checkpoint(work_dir: str) -> Optional[str]:
    if not os.path.isdir(work_dir):
        return None
    ckpts = [d for d in os.listdir(work_dir) if d.startswith('ckpt_')]
    if not ckpts:
        return None
    steps = sorted(int(c.split('_')[1]) for c in ckpts)
    return os.path.join(work_dir, f'ckpt_{steps[-1]}')
