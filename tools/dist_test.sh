#!/usr/bin/env bash
# Multi-host TPU evaluation launcher (reference tools/dist_test.sh:1-10).
# One process per host; rank-sharded eval + allgather collect
# (parallel/distributed.py). See dist_train.sh for the rendezvous modes.
#
# Usage: tools/dist_test.sh CONFIG CHECKPOINT [extra test.py args...]
set -e
CONFIG=$1
CHECKPOINT=$2
shift 2

LAUNCHER=tpu
if [ -n "$MSMD_COORDINATOR" ]; then
  LAUNCHER=manual
fi

PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --launcher $LAUNCHER "$@"
