#!/bin/bash
# Round-5 session-1 battery: new tile geometry + batch scaling.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5a.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 python bench.py "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run --check          # TPU pallas-vs-xla parity WITH the new geometry + judged line
run --batch 24
run --batch 32
