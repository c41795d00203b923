#!/bin/bash
# Round-5 TPU work queue: wait for the step-cache gate phases to finish, then
# produce the two missing measured records (docs/wan_bench.json via
# VAP_BENCH_FAMILY=wan bench.py, docs/train_bench.json via
# scripts/train_bench.py), each with tunnel-heal probes and one retry.
#
#   setsid nohup bash scripts/run_r5_tpu_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

GATE_PID_FILE="${GATE_PID_FILE:-/tmp/gate_phases.pid}"
if [ -f "$GATE_PID_FILE" ]; then
  gp=$(cat "$GATE_PID_FILE")
  while kill -0 "$gp" 2>/dev/null; do
    echo "waiting on gate phases (pid $gp) $(date -u +%H:%M:%S)"
    sleep 60
  done
fi
echo "gate phases done; starting queue $(date -u +%H:%M:%S)"

probe_tpu() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('TPU OK', float((x@x).mean()))"
}

run_job() {
  local name="$1"; shift
  for attempt in 1 2; do
    echo "=== job '$name' attempt $attempt $(date -u +%H:%M:%S) ==="
    for p in $(seq 1 20); do
      probe_tpu && break
      echo "tunnel down, probe $p; sleeping 120s"
      sleep 120
    done
    timeout 4200 "$@"
    rc=$?
    echo "job '$name' rc=$rc"
    [ $rc -eq 0 ] && return 0
    sleep 30
  done
  echo "job '$name' FAILED"
  return 1
}

run_job wan_bench env VAP_BENCH_FAMILY=wan python bench.py
run_job train_bench python scripts/train_bench.py
echo "=== queue done $(date -u +%H:%M:%S) ==="
