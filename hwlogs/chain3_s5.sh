#!/bin/bash
# after chain2 (pid 2387: waits for trace, then runs batch16), run mask_s2d A/B
while kill -0 2387 2>/dev/null; do sleep 15; done
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_s5.jsonl
echo "=== --set mask_s2d=True $(date -u) ===" >> $LOG.txt
timeout 5400 python bench.py --set mask_s2d=True >> $LOG 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
