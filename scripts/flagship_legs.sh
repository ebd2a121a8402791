#!/bin/bash
# Flagship leg driver: the axon backend accumulates HBM across layers
# (server-side memo of per-call buffers — see CLAUDE.md round-4 notes),
# so a single-process 19-layer run OOMs every ~2-3 layers.  This loop
# resumes from the per-layer ckpt until the sample completes, exactly
# the round-3 manual protocol, automated.
#
#   scripts/flagship_legs.sh <logfile> [extra run_resnet_demo args...]
set -u
LOG="${1:?log file}"; shift
for leg in $(seq 1 40); do
  echo "=== leg $leg $(date -u +%H:%M:%S) ===" >> "$LOG"
  OPTCONV_SYNC_STAGES="${OPTCONV_SYNC_STAGES:-1}" \
  OPTCONV_KEY_CACHE_GB="${OPTCONV_KEY_CACHE_GB:-4}" \
  OPTCONV_DOUBLE_HOIST="${OPTCONV_DOUBLE_HOIST:-0}" \
  python scripts/run_resnet_demo.py --depth 20 --ker 3 --logn 16 \
    --ckpt .run_r4/ckpt --keys .run_r4/keys.npz \
    --results-root .run_r4/results "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== done rc=0 after leg $leg ===" >> "$LOG"; exit 0
  fi
  echo "=== leg $leg exited rc=$rc; resuming in 45s ===" >> "$LOG"
  sleep 45   # let the server free the dead client's buffers
done
echo "=== gave up after 40 legs ===" >> "$LOG"; exit 1
