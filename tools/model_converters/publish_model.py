#!/usr/bin/env python
"""Strip a training checkpoint for publishing (drop optimizer state, add a
content hash to the filename).

TPU-native equivalent of tools/model_converters/publish_model.py:1-34: the
orbax checkpoint directory is re-saved with only params/batch_stats/meta and
renamed ``<out>-<sha256[:8]>``.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser(description='Publish a checkpoint')
    p.add_argument('in_dir', help='input orbax checkpoint directory')
    p.add_argument('out_dir', help='output checkpoint directory')
    return p.parse_args()


def dir_sha256(path: str) -> str:
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(path)):
        for f in sorted(files):
            fp = os.path.join(root, f)
            h.update(f.encode())
            with open(fp, 'rb') as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b''):
                    h.update(chunk)
    return h.hexdigest()


def process_checkpoint(in_dir: str, out_dir: str) -> str:
    from msmdfusion_tpu.utils.checkpoint import load_checkpoint, \
        save_checkpoint
    state = load_checkpoint(in_dir)
    parent = os.path.dirname(os.path.abspath(out_dir)) or '.'
    tmp_name = os.path.basename(out_dir)
    # drop the optimizer state (the published file only needs weights)
    ckpt = save_checkpoint(
        parent, 0, state['params'], state.get('batch_stats', {}),
        opt_state=None, meta=state.get('meta', {}), name=tmp_name)
    sha = dir_sha256(ckpt)
    final = f'{out_dir.rstrip(os.sep)}-{sha[:8]}'
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(ckpt, final)
    print(final)
    return final


if __name__ == '__main__':
    args = parse_args()
    process_checkpoint(args.in_dir, args.out_dir)
