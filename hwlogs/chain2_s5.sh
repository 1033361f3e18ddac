#!/bin/bash
while kill -0 $(cat /tmp/chain_s5.pid) 2>/dev/null; do sleep 10; done
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_s5.jsonl
echo "=== --batch 16 $(date -u) ===" >> $LOG.txt
timeout 5400 python bench.py --batch 16 >> $LOG 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
