#!/bin/bash
# Round-4 session-5 battery: warp_grid_launch in-situ A/B.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_s5.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 python bench.py "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run --set warp_grid_launch=True
