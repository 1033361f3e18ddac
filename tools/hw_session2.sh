#!/bin/bash
# Trimmed round-3 battery: judged line first, then the defaults-deciding
# A/B, then train throughput per backward mode. Run AFTER bench --check
# has passed. ONE jax process at a time; every step timeout-bounded.
set -u
LOG=${1:-/tmp/hw_session2.log}
cd /root/repo
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1800}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}
echo "=== hw session2 $(date) ===" | tee -a "$LOG"
T=3600 run python bench.py
T=3600 run python bench.py --set feature_phase_opt=False,context_s2d=False
T=3600 run python bench.py --train --bwd pallas
T=2400 run python bench.py --train --bwd recompute
T=2400 run python tools/profile_forward.py
T=2400 run python tools/bench_glue_ab.py
T=3600 run python bench.py --set encoder_s2d=2
T=3600 run python bench.py --batch 8
T=900  run python bench.py --io --workers 0
echo "=== done $(date) ===" | tee -a "$LOG"
