#!/bin/bash
# Round-4 phase-1 hardware battery: the load-bearing numbers first
# (judged line, trace attribution of the two headroom targets, the three
# training backward modes), so a tunnel death still leaves round-4's
# committed artifacts behind. ONE jax process at a time (CLAUDE.md).
set -u
LOG=${1:-/tmp/hw_r4_phase1.log}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}

echo "=== hw r4 phase1 $(date) ===" | tee -a "$LOG"
# 0. tunnel sanity + kernel numerics gate
T=900 run python bench.py --check
# 1. the judged line (r3 defaults; compile cache warm)
T=3600 run python bench.py
# 2. trace attribution of the two headroom targets
T=2400 run python tools/trace_op.py feature
T=2400 run python tools/trace_op.py stage3
# 3. train-step throughput per backward mode (VERDICT #3)
T=3600 run python bench.py --train --bwd recompute
T=3600 run python bench.py --train --bwd analytic
T=3600 run python bench.py --train --bwd pallas
# 4. component attribution table
T=2400 run python tools/profile_forward.py
echo "=== phase1 done $(date) ===" | tee -a "$LOG"
