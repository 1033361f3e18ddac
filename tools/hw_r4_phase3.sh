#!/bin/bash
# Round-4 phase-3 hardware battery: measure the fold_head judged line,
# re-attribute feature_net post-fold, decide the TRAINING default (the
# phase-1/2 rows showed the inference fast path is ~2x SLOWER than the
# r2 plain-XLA train path: s2d pays s^2 x FLOPs in train mode where
# phase_opt must fall back), and isolate hot-conv shapes for the fused
# Pallas conv kernel. ONE jax process at a time (CLAUDE.md); every step
# timeout-bounded.
set -u
LOG=${1:-/tmp/hw_r4_phase3.log}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}
NO_S2D=feature_s2d=False,context_s2d=False,unet_s2d=False,stage1_s2d=False,feature_fold_head=False,feature_phase_opt=False

echo "=== hw r4 phase3 $(date) ===" | tee -a "$LOG"
# 1. judged line with feature_fold_head (cold compile expected)
T=3600 run python bench.py
# 2. train-path decision rows: pallas kernel WITHOUT s2d layouts, and
#    the plain-XLA path (r2's 3.47 configuration), both at bench shape
T=3600 run python bench.py --train --bwd pallas --set "$NO_S2D"
T=3600 run python bench.py --train --set "warp_kernel=\"xla\",$NO_S2D"
# 3. post-fold feature attribution
T=1800 run python tools/trace_op.py feature
# 4. isolated hot-conv microbench (XLA vs shifted-matmul vs pallas)
T=3600 run python tools/bench_conv.py
echo "=== phase3 done $(date) ===" | tee -a "$LOG"
