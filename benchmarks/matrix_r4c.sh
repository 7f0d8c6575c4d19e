#!/bin/bash
# Round-4 final follow-up matrix (serial, single v5e chip, 1-core host).
#
# Picks up exactly where matrix_r4b.sh was cut off by the round boundary
# (its log ends mid-seg_ab at 01:28): seg_ab post-speed-dropout-fix,
# dream_policy with a WM epoch budget that fits the session, and the
# CPU-mesh HLO collective audit whose code already emits the
# dagger_online / world-model / imagination rows but whose JSON predates
# them. Timeouts are sized so all three fit in ~55 min.
#
# Usage: bash benchmarks/matrix_r4c.sh > reports/matrix_r4c.log 2>&1
cd "$(dirname "$0")/.." || exit 1

probe() {
  for i in $(seq 1 20); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones(8).sum().block_until_ready()" 2>/dev/null; then
      return 0
    fi
    echo "[matrix-c] device probe $i failed; waiting 30s" >&2
    sleep 30
  done
  echo "[matrix-c] device never came back" >&2
  return 1
}

run() {
  name="$1"; shift
  echo "=== [matrix-c] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  timeout "$TMO" "$@"
  rc=$?
  echo "=== [matrix-c] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
}

TMO=1500 run seg_ab python benchmarks/seg_ab.py --out reports/seg_ab.json

echo "=== [matrix-c] dream_policy ($(date -u +%H:%M:%S)) ==="
probe
timeout 1800 python -m carla_imitation_learning_tpu.cli run dream_policy \
  --json -o NUM_EPOCHS=10 -o n_envs=64 -o n_steps=500 -o eval_envs=256 \
  -o eval_steps=300 -o log_dir=/tmp/dream_r4c > /tmp/dream_r4c.out 2>&1
rc=$?
grep '^{' /tmp/dream_r4c.out | tail -1 > reports/dream_policy.json
echo "=== [matrix-c] dream_policy done rc=$rc ($(date -u +%H:%M:%S)) ==="

TMO=1500 run scaling python benchmarks/scaling.py

echo "=== [matrix-c] ALL DONE ($(date -u +%H:%M:%S)) ==="
