#!/usr/bin/env bash
# Multi-host TPU training launcher (reference tools/dist_train.sh:1-9).
#
# On a TPU pod slice the JAX runtime discovers peers itself, so unlike the
# reference (torch.distributed.launch spawning one process per GPU) this
# wrapper launches ONE process per HOST with --launcher tpu
# (jax.distributed.initialize auto-discovery). Run it on every host of the
# slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`).
#
# Usage: tools/dist_train.sh CONFIG [NUM_PROCESSES] [extra train.py args...]
#   NUM_PROCESSES is optional; when given with MSMD_COORDINATOR set, the
#   manual rendezvous path is used instead of pod auto-discovery.
set -e
CONFIG=$1
shift || true
NPROC=0
if [[ "${1:-}" =~ ^[0-9]+$ ]]; then
  NPROC=$1
  shift
fi

LAUNCHER=tpu
if [ -n "$MSMD_COORDINATOR" ]; then
  LAUNCHER=manual
  export MSMD_NUM_PROCESSES=${MSMD_NUM_PROCESSES:-$NPROC}
fi

PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
python "$(dirname "$0")/train.py" "$CONFIG" --launcher $LAUNCHER "$@"
