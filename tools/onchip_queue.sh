#!/usr/bin/env bash
# One-shot queue of on-chip work (2026-08-19, post layout-demotion change).
# Fire this as soon as a tiny-matmul probe succeeds; each step is
# independently timeout-bounded so a mid-queue tunnel drop doesn't wedge
# the shell. Usage: bash tools/onchip_queue.sh /tmp/onchip_queue.log
set -u
LOG="${1:-/tmp/onchip_queue.log}"
cd "$(dirname "$0")/.."

run() {
  local budget="$1"; shift
  echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"
  timeout "$budget" "$@" >>"$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# 1. headline bench with the new default paths (multi COLLAB, bf16 adj,
#    lockstep context row) — the number the driver records at round end
run 590 python bench.py

# 2. comparison matrix: COLLAB_multi128 (min-tile A/B), COLLAB_dense,
#    adjfp32 rows, DD matrix, COO kernels
run 1800 python bench.py --full

# 3. PROTEINS lockstep-cap A/B: at batch 50 the 10-fold stack is ~72 MB,
#    just over the 64 MB lockstep budget — measure whether lockstep
#    (cv_parallel=folds) beats the sequential dense driver there before
#    touching Config.lockstep_max_step_bytes
run 580 python train.py --data_type PROTEINS --synthetic --num_epochs 10 \
  --out_root /tmp/q_prot_seq
run 580 python -c "
from dgcnn_tpu.config import Config
from dgcnn_tpu.train.cv import run_cross_validation
cfg = Config(data_type='PROTEINS', num_epochs=10, cv_parallel='folds',
             statistics_dir='/tmp/q_prot_lock/statistics',
             epochs_dir='/tmp/q_prot_lock/epochs')
run_cross_validation(cfg, allow_synthetic=True)
"

# 4. full 8-dataset release validation under the new defaults (multi
#    COLLAB) -> refresh RESULTS.md from its report
run 1200 python tools/release_validation.py --out_root /tmp/rel7 \
  MUTAG PTC_MR NCI1 PROTEINS DD COLLAB IMDB-BINARY IMDB-MULTI
run 120 python tools/release_report.py /tmp/rel7

echo "=== queue complete ===" | tee -a "$LOG"
