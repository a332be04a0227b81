#!/usr/bin/env bash
# Offline benchmark evaluation (reference scripts/eval_offline_benchs.sh).
# Data-parallel: one python process per shard on the same host pool.
set -euo pipefail

DATASET=${1:-mlvu}
MODEL=${2:-llava_ov_7b}
MODEL_PATH=${3:?model checkpoint dir}
NUM_PROCESSES=${NUM_PROCESSES:-8}
SAVE_DIR=${SAVE_DIR:-results/${DATASET}}

pids=()
for ((r = 0; r < NUM_PROCESSES; r++)); do
  RANK=$r WORLD_SIZE=$NUM_PROCESSES \
    python scripts/run_eval.py --dataset "$DATASET" --model "$MODEL" \
    --model_path "$MODEL_PATH" --save_dir "$SAVE_DIR" "$@" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
