#!/bin/bash
# Round-5 session-3: epilogue relayout variants + batch 20 + profile_forward B=16.
while kill -0 $(cat /tmp/batt_r5b.pid) 2>/dev/null; do sleep 20; done
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5c.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run python tools/bench_epilogue.py
run python bench.py --batch 20
run python tools/profile_forward.py b=16
