#!/bin/bash
# Detached TPU-tunnel watchdog: probe the axon backend every PERIOD seconds;
# the moment a probe succeeds, run scripts/tpu_recovery.sh ONCE (conv3d
# shootout -> VAE A/B -> full bench warm) and exit. Probes run in a killable
# subprocess because a wedged tunnel HANGS jax backend init rather than
# erroring (see docs/COVERAGE.md "wedged tunnel").
#   setsid sh -c 'scripts/tpu_watchdog.sh &' < /dev/null
set -u
LOG=${LOG:-/tmp/tpu_watchdog.log}
PERIOD=${PERIOD:-900}
cd "$(dirname "$0")/.."
echo "=== watchdog start $(date -u +%FT%TZ) pid=$$ period=${PERIOD}s ===" >> "$LOG"
while true; do
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('TPU OK', float((x @ x).mean()), jax.devices()[0])" >> "$LOG" 2>&1
  rc=$?
  echo "probe rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "=== tunnel healed: launching recovery ===" >> "$LOG"
    bash scripts/tpu_recovery.sh >> "$LOG" 2>&1
    echo "=== watchdog done $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  sleep "$PERIOD"
done
