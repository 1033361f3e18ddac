#!/bin/bash
# Round-5 session-2 battery: fma-aligned coords (parity fix) + new-geometry bench + trace + conv war.
while kill -0 $(cat /tmp/batt_r5a.pid) 2>/dev/null; do sleep 20; done
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
export OMP_NUM_THREADS=1
LOG=/root/repo/hwlogs/battery_r5b.jsonl
run() {
  echo "=== $* $(date -u) ===" >> $LOG.txt
  timeout 5400 python bench.py "$@" >> $LOG 2>> $LOG.txt
  echo "exit=$? $(date -u)" >> $LOG.txt
}
run --check                 # parity with fma-aligned coords + judged B=16 line
echo "=== trace stage3 B=16 $(date -u) ===" >> $LOG.txt
TRACE_B=16 timeout 5400 python tools/trace_op.py stage3 > /root/repo/hwlogs/trace_stage3_b16_r5.txt 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
echo "=== bench_conv $(date -u) ===" >> $LOG.txt
timeout 5400 python tools/bench_conv.py >> $LOG 2>> $LOG.txt
echo "exit=$? $(date -u)" >> $LOG.txt
