#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5j.jsonl
echo "=== bench_kernel post-diet $(date -u) ===" >> $LOG.txt
timeout 5400 python tools/bench_kernel.py >> $LOG 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
