#!/bin/bash
# Round-4 session-4 battery: tail_s2d + fold_views A/Bs (sequential, one
# TPU process at a time). Appends JSON lines to hwlogs/battery_s4.jsonl.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_s4.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 python bench.py "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run --set feature_tail_s2d=True,context_tail_s2d=True
run --set warp_fold_views=True
