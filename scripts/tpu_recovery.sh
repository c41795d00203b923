#!/bin/bash
# One-shot TPU-recovery sequence (run the moment the axon tunnel heals):
#   1. probe the backend (fail fast if still wedged)
#   2. conv3d shootout for the VAE decode path (docs/ROOFLINE.md: ~28% MFU,
#      sum2d candidate prepared in r3 but never measured — the tunnel wedged)
#   3. end-to-end VAE decode timing, default vs VAP_VAE_CONV3D=sum2d
#   4. full bench.py (warms the persistent compile cache for the driver's
#      end-of-round capture, then prints the official JSON line)
# Every step logs to $LOG; steps after a failed probe are skipped.
set -u
LOG=${LOG:-/tmp/tpu_recovery.log}
cd "$(dirname "$0")/.."
echo "=== tpu_recovery $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "--- probe ---" | tee -a "$LOG"
timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('TPU OK', float((x @ x).mean()), jax.devices()[0])" 2>&1 | tee -a "$LOG"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "probe failed: tunnel still wedged" | tee -a "$LOG"
  exit 17
fi

echo "--- conv3d shootout ---" | tee -a "$LOG"
timeout 3600 python scripts/conv3d_bench.py 2>&1 | tee -a "$LOG"

echo "--- VAE decode end-to-end: default ---" | tee -a "$LOG"
timeout 3600 python scripts/vae_bench.py 2>&1 | tee -a "$LOG"
echo "--- VAE decode end-to-end: sum2d ---" | tee -a "$LOG"
timeout 3600 env VAP_VAE_CONV3D=sum2d python scripts/vae_bench.py 2>&1 | tee -a "$LOG"

echo "--- full bench ---" | tee -a "$LOG"
timeout 7200 python bench.py 2>&1 | tee -a "$LOG"

echo "--- profiled short bench (tail attribution) ---" | tee -a "$LOG"
# graphs are warm from the full bench; a 2-step profiled run captures the
# steady-state trace for the elementwise-tail attack (VERDICT r3 next #2)
timeout 3600 env VAP_BENCH_PROFILE_DIR=/tmp/vap_profile VAP_BENCH_STEPS=2 \
  VAP_BENCH_SKIP_VAE=1 python bench.py 2>&1 | tee -a "$LOG"
echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
