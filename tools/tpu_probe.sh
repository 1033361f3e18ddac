#!/bin/bash
# Poll the TPU tunnel; when it answers, run the hardware measurement
# battery (tools/hw_session.sh). Serializes all TPU access within this
# loop (one jax process at a time). Logs to /tmp/tpu_probe.log.
set -u
LOG=/tmp/tpu_probe.log
cd /root/repo
echo "=== probe loop start $(date) ===" >> "$LOG"
while true; do
  timeout 90 python - >> "$LOG" 2>&1 <<'EOF'
import os
os.environ.setdefault('OMP_NUM_THREADS', '1')
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("probe-ok", jax.devices(), float((x @ x)[0, 0]))
EOF
  if [ $? -eq 0 ]; then
    echo "=== tunnel UP $(date) — starting hw battery ===" >> "$LOG"
    touch /tmp/tpu_up
    bash tools/hw_session.sh /tmp/hw_session.log >> "$LOG" 2>&1
    echo "=== hw battery done $(date) ===" >> "$LOG"
    break
  fi
  echo "probe-fail $(date)" >> "$LOG"
  sleep 150
done
