#!/bin/bash
# Sequence the step-cache quality-gate phases (scripts/step_cache_gate.py
# --only ...), one process per phase so an axon-tunnel wedge or TPU-worker
# crash costs one phase, not the run. Each phase gets up to 3 attempts with a
# tunnel-heal probe between attempts. Results merge incrementally into
# docs/step_cache_gate.json; final latents persist in $WORKDIR so retries and
# later phases reuse finished work.
#
# Run detached (survives the driving session):
#   setsid nohup bash scripts/run_gate_phases.sh > /tmp/gate_phases.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WORKDIR="${WORKDIR:-/tmp/vap_gate_work}"
PHASES=(full "uniform:2" "adaptive:0.12" "uniform:2:10:5" int8)

probe_tpu() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('TPU OK', float((x@x).mean()))"
}

for phase in "${PHASES[@]}"; do
  ok=0
  for attempt in 1 2 3; do
    echo "=== phase '$phase' attempt $attempt $(date -u +%H:%M:%S) ==="
    for p in $(seq 1 20); do
      probe_tpu && break
      echo "tunnel down, probe $p; sleeping 120s"
      sleep 120
    done
    timeout 3000 python scripts/step_cache_gate.py --only "$phase" --workdir "$WORKDIR"
    rc=$?
    echo "phase '$phase' rc=$rc"
    if [ $rc -eq 0 ]; then ok=1; break; fi
    sleep 30
  done
  if [ $ok -ne 1 ]; then
    echo "phase '$phase' FAILED after 3 attempts; continuing to next phase"
  fi
done
echo "=== all phases done $(date -u +%H:%M:%S) ==="
