#!/bin/bash
# Round-4 phase-4 hardware battery: the fused conv kernel on the real
# model (conv_pallas A/B at B=4 and the new B=8 default), post-kernel
# feature trace, and the new judged default line (B=8 + fold_head).
# ONE jax process at a time (CLAUDE.md); every step timeout-bounded.
set -u
LOG=${1:-/tmp/hw_r4_phase4.log}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}

echo "=== hw r4 phase4 $(date) ===" | tee -a "$LOG"
# 1. new default judged line: B=8 + fold_head (no kernel dependency)
T=3600 run python bench.py
# 2. conv-kernel debug row: full Mosaic error with traceback
T=1200 run python tools/bench_conv.py --only trunk1
# 3. conv_pallas rows (work iff the Mosaic fix landed by the time
#    this row starts; they fail fast otherwise)
T=3600 run python bench.py --batch 4 --set conv_pallas=True
T=3600 run python bench.py --set conv_pallas=True
T=1800 run python tools/trace_op.py feature --set conv_pallas=True
echo "=== phase4 done $(date) ===" | tee -a "$LOG"
