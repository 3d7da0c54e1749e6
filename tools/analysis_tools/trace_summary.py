#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by self-time.

TPU-native replacement for eyeballing the reference's chrome traces
(the reference has no tracer at all — SURVEY §5 'Tracing/profiling';
its only tool is wall-clock tools/analysis_tools/benchmark.py). Usage:

    python tools/analysis_tools/trace_summary.py /tmp/jax_trace [-n 40]
    python tools/analysis_tools/trace_summary.py trace.xplane.pb --by-scope

Parses the .xplane.pb files written by ``jax.profiler.trace`` via xprof's
``framework_op_stats`` converter and prints per-op and per-scope tables
(scope = the ``jax.named_scope``/module path prefix of the op name).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict


def find_xplanes(path: str):
    if os.path.isfile(path):
        return [path]
    hits = sorted(glob.glob(os.path.join(
        path, '**', '*.xplane.pb'), recursive=True))
    if not hits:
        sys.exit(f'no .xplane.pb under {path}')
    # newest capture only
    newest_dir = os.path.dirname(hits[-1])
    return sorted(glob.glob(os.path.join(newest_dir, '*.xplane.pb')))


def load_rows(xplane_paths):
    from xprof.convert import raw_to_tool_data as r
    data, _ = r.xspace_to_tool_data(xplane_paths, 'framework_op_stats',
                                    {'use_saved_result': False})
    tables = json.loads(data) if isinstance(data, (str, bytes)) else data
    # the converter returns [table, ...] on first run but a bare table dict
    # when a saved op_stats.pb sits next to the xplane
    table = tables[0] if isinstance(tables, list) else tables
    cols = [c['id'] for c in table['cols']]
    rows = []
    for row in table['rows']:
        vals = dict(zip(cols, [c.get('v') for c in row['c']]))
        if vals.get('host_or_device') != 'Device':
            continue
        rows.append(vals)
    return rows


def scope_of(name: str, depth: int) -> str:
    parts = name.split('/')
    # drop the jit(...) prefix and the trailing op
    parts = [p for p in parts[1:-1]] or parts
    return '/'.join(parts[:depth]) or '(top)'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('path', help='trace dir or .xplane.pb file')
    ap.add_argument('-n', type=int, default=40, help='rows to print')
    ap.add_argument('--scope-depth', type=int, default=3)
    ap.add_argument('--iters', type=int, default=0,
                    help='divide totals by this many traced steps')
    args = ap.parse_args()

    rows = load_rows(find_xplanes(args.path))
    total_us = sum(r['total_self_time'] for r in rows)
    iters = args.iters or max(
        (int(r['occurrences']) for r in rows
         if 'extract_pts_feat' in (r.get('operation') or '')), default=1)
    print(f'device self-time total: {total_us / 1e3:.1f} ms '
          f'({total_us / 1e3 / iters:.1f} ms/iter over {iters} iters)\n')

    print(f'=== top {args.n} ops by device self-time ===')
    for r in sorted(rows, key=lambda r: -r['total_self_time'])[:args.n]:
        name = r['operation']
        if len(name) > 100:
            name = '...' + name[-97:]
        print(f"{r['total_self_time'] / 1e3 / iters:9.3f} ms/iter "
              f"x{int(r['occurrences']):<4d} {r['type']:<22s} {name}")

    agg = defaultdict(float)
    for r in rows:
        agg[scope_of(r['operation'] or '?', args.scope_depth)] += \
            r['total_self_time']
    print(f'\n=== scopes (depth {args.scope_depth}) ===')
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:args.n]:
        print(f'{v / 1e3 / iters:9.3f} ms/iter  {k}')


if __name__ == '__main__':
    main()
