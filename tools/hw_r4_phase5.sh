#!/bin/bash
# Round-4 phase-5: the fixed conv kernel (f32 product rolls) on real
# TPU — microbench first (fails fast if Mosaic still rejects), then
# the full judged line with conv_pallas at B=4 and B=8, then the
# post-kernel feature trace attribution.
set -u
LOG=${1:-/tmp/hw_r4_phase5.log}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
run() {
  echo "### $(date +%T) $*" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" >> "$LOG" 2>&1
  echo "### exit=$? $(date +%T)" | tee -a "$LOG"
}

echo "=== hw r4 phase5 $(date) ===" | tee -a "$LOG"
T=1800 run python tools/bench_conv.py
T=3600 run python bench.py --batch 4 --set conv_pallas=True
T=3600 run python bench.py --set conv_pallas=True
T=1800 run python tools/trace_op.py feature --set conv_pallas=True
echo "=== phase5 done $(date) ===" | tee -a "$LOG"
