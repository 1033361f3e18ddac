#!/bin/bash
# Round-5 session-7: post-diet A/Bs + resilient B=16 profile.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5g.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run python bench.py --set encoder_s2d=2
run python bench.py --set "warp_glue=(True, True, True)"
run python tools/profile_forward.py b=16
