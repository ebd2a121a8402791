#!/bin/bash
# Flagship leg driver.  Root cause of the cross-layer OOMs (round-5
# repro, BENCH_DETAIL round5_hbm_leak_root_cause): HBM RESIDENCY grows
# as the model touches new (op, level) kernels — each loaded executable
# holds its baked-in constants on device — plus per-family DFT tables
# and keys; it is NOT per-execution retention (12x the same layer in
# one process is flat).  Blocks 1-2 now run whole in one leg (with
# OPTCONV_BTP_LIVE=1 even across family switches); block 3 (ls=4) sits
# at the 16 GB ceiling and restarts per layer.  This loop resumes from
# the per-layer ckpt until the sample completes.
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
