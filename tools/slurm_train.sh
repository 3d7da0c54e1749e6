#!/usr/bin/env bash
# SLURM training launcher (reference tools/slurm_train.sh:1-25).
# srun starts one task per host; each task initializes the manual
# rendezvous from SLURM_* variables (parallel/distributed.py init_dist).
#
# Usage: GPUS=<hosts> tools/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [args...]
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
      python -u '"$(dirname "$0")"'/train.py '"$CONFIG"' --work-dir='"$WORK_DIR"' --launcher manual '"$PY_ARGS"
