#!/usr/bin/env bash
# SLURM evaluation launcher (reference tools/slurm_test.sh).
# Usage: GPUS=<hosts> tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [args...]
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NTASKS=${GPUS:-8}
CPUS_PER_TASK=${CPUS_PER_TASK:-5}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${NTASKS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    bash -c 'MSMD_COORDINATOR=${MSMD_COORDINATOR:-$(scontrol show hostnames $SLURM_JOB_NODELIST | head -1):29500} \
      MSMD_NUM_PROCESSES=$SLURM_NTASKS MSMD_PROCESS_ID=$SLURM_PROCID \
      python -u '"$(dirname "$0")"'/test.py '"$CONFIG"' '"$CHECKPOINT"' --launcher manual '"$PY_ARGS"
