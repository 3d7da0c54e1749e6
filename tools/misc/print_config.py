#!/usr/bin/env python
"""Print a fully-resolved config (reference tools/misc/print_config.py)."""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from msmdfusion_tpu.config import load_config, parse_cli_overrides


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()
    cfg = load_config(args.config, parse_cli_overrides(args.cfg_options))
    pprint.pprint(dict(cfg), width=100)


if __name__ == '__main__':
    main()
