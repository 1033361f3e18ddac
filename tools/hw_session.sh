#!/bin/bash
# One-shot hardware measurement battery for when the TPU tunnel is up.
# Run from /root/repo: bash tools/hw_session.sh [logfile]
# Order: cheapest/most-load-bearing first, so a tunnel that dies again
# mid-run still leaves the judged numbers behind. ONE jax process at a
# time (CLAUDE.md); every step is timeout-bounded.
set -u
LOG=${1:-/tmp/hw_session.log}
cd /root/repo
# scripts under tools/ need the repo root (and the axon plugin) on the
# path — python adds the script's dir, not the cwd
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}

echo "=== hw session $(date) ===" | tee -a "$LOG"
# 0. tunnel sanity + kernel numerics gate
T=600 run python bench.py --check
# 1. the judged line (current defaults incl. phase_opt + context_s2d)
T=3600 run python bench.py
# 2. phase-opt / context-s2d A/B (old config, still cached from r2/r3)
T=3600 run python bench.py --set feature_phase_opt=False,context_s2d=False
# 2a. batch-size scaling (B=4 is the shipped default; +15% was measured
#     B=1->4, check the curve hasn't flipped with the new tails)
T=3600 run python bench.py --batch 8
# 2b. encoder at s2d(2) (halves expanded-conv MACs, +1 relayout)
T=3600 run python bench.py --set encoder_s2d=2
# 3. train-step throughput per backward mode
T=3600 run python bench.py --train --bwd recompute
T=3600 run python bench.py --train --bwd analytic
T=3600 run python bench.py --train --bwd pallas
# 4. component attribution (incl. feature phase-opt A/B row)
T=2400 run python tools/profile_forward.py
# 5. kernel micro-bench incl. fwd+bwd rows
T=2400 run python tools/bench_kernel.py
# 6. batch-glue A/B (per-stage winner)
T=2400 run python tools/bench_glue_ab.py
# 6b. trace attribution of the two headroom targets (writes trace dirs;
#     parse with tools/trace_op.py parse_grouped <trace.json>)
T=2400 run python tools/trace_op.py feature
T=2400 run python tools/trace_op.py stage3
# 7. host IO (no TPU needed but cheap)
T=900 run python bench.py --io --workers 0
echo "=== done $(date) ===" | tee -a "$LOG"
