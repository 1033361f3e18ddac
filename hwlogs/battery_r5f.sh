#!/bin/bash
# Round-5 session-6: B=18 probe + proper B=16 component profile + fresh stage-3 trace.
while kill -0 $(cat /tmp/batt_r5e.pid) 2>/dev/null; do sleep 20; done
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5f.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run python bench.py --batch 18
run python tools/profile_forward.py b=16
echo "=== trace stage3 B=16 post-diet $(date -u) ===" >> $LOG.txt
TRACE_B=16 timeout 5400 python tools/trace_op.py stage3 > /root/repo/hwlogs/trace_stage3_b16_r5b.txt 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
