#!/bin/bash
# Round-4 phase-2 hardware battery: the rows phase-1 didn't reach before
# the session died — remaining training backward modes, the A/B matrix
# that decomposes the r3 15.16 bundle (VERDICT r3 weak #4), and host-IO
# scaling at 1/2/4 workers (VERDICT r3 next #8). ONE jax process at a
# time (CLAUDE.md); every step timeout-bounded.
set -u
LOG=${1:-/tmp/hw_r4_phase2.log}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}

echo "=== hw r4 phase2 $(date) ===" | tee -a "$LOG"
# 1. remaining training backward modes (recompute=1.474 done in phase-1)
T=3600 run python bench.py --train --bwd analytic
T=3600 run python bench.py --train --bwd pallas
# 2. A/B matrix decomposing the r3 jump (phase_opt / context_s2d /
#    native agg / batch), cheapest-informative first
T=3600 run python bench.py --set feature_phase_opt=False,context_s2d=False
T=3600 run python bench.py --set warp_native_agg=False
T=3600 run python bench.py --set encoder_s2d=2
T=3600 run python bench.py --batch 8
# 3. host IO scaling (VERDICT #8) — native loader, workers sweep
T=900 run python bench.py --io --workers 0
T=900 run python bench.py --io --workers 1
T=900 run python bench.py --io --workers 2
T=900 run python bench.py --io --workers 4
echo "=== phase2 done $(date) ===" | tee -a "$LOG"
