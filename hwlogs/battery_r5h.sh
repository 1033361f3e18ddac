#!/bin/bash
# Round-5 session-8: stage-3 batched-glue A/B post-diet.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5h.jsonl
echo "=== glue A/B $(date -u) ===" >> $LOG.txt
timeout 5400 python bench.py --set "warp_glue=(True, True, True)" >> $LOG 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
