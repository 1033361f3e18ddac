#!/bin/bash
# Wait for the battery (pid file) to finish, then capture the stage3 B=8 trace.
while kill -0 $(cat /tmp/batt_s5.pid) 2>/dev/null; do sleep 10; done
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
echo "=== trace stage3 B=8 $(date -u) ===" >> hwlogs/battery_s5.jsonl.txt
TRACE_B=8 timeout 5400 python tools/trace_op.py stage3 > hwlogs/trace_stage3_b8.txt 2>> hwlogs/battery_s5.jsonl.txt
echo "exit=$? $(date -u)" >> hwlogs/battery_s5.jsonl.txt
