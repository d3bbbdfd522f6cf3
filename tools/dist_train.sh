#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh surface).
#
# On TPU pods, JAX discovers the topology from the TPU runtime — one
# process per host, no torch.distributed.launch equivalent needed:
#
#   dist_train.sh CONFIG [NUM_PROCESSES]
#
# For CPU/GPU multi-process testing, set the coordinator explicitly:
#   JAX_COORDINATOR=host:port JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
# and nsgp_repre_tpu will call jax.distributed.initialize() from env.
CONFIG=$1
shift || true
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
