#!/bin/bash
# Round-4 follow-up matrix (serial, single v5e chip — same rules as
# matrix_r4.sh: ONE measurement at a time on this 1-core host).
#
# Re-runs exactly the tiers whose matrix_r4.sh slot was invalidated by
# fixes that landed AFTER their run, plus the one that timed out:
#
#  1. route_quality   — ran 22:27, lane-aware goal tolerance (458b396,
#                       22:48) landed 11 min later; the 93%-timeout expert
#                       was the second-lane stranding that commit fixes.
#  2. seg_ab          — ran 23:30 with both arms parked at spawn; the
#                       speed-dropout inertia fix (671d60f, 23:53) came
#                       out of that exact failure.
#  3. dream_policy    — hit its 3600 s timeout with ~50 WM epochs eating
#                       the whole hour; NUM_EPOCHS=12 (val_loss plateaus
#                       by epoch ~2 at this data scale) leaves room for
#                       imagination training + the 256-env eval.
#  4. scaling audit   — regenerate reports/scaling.json so the JSON gains
#                       the dagger_online/world-model/imagination rows the
#                       audit code already covers (CPU mesh, no chip).
#
# Usage: setsid nohup bash benchmarks/matrix_r4b.sh <pid-to-wait-for> \
#          > reports/matrix_r4b.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "=== [matrix-b] waiting for matrix_r4.sh (pid $WAIT_PID) ($(date -u +%H:%M:%S)) ==="
  tail --pid="$WAIT_PID" -f /dev/null
  echo "=== [matrix-b] primary matrix done ($(date -u +%H:%M:%S)) ==="
fi

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones(8).sum().block_until_ready()" 2>/dev/null; then
      return 0
    fi
    echo "[matrix-b] device probe $i failed; waiting 60s" >&2
    sleep 60
  done
  echo "[matrix-b] device never came back" >&2
  return 1
}

run() {
  name="$1"; shift
  echo "=== [matrix-b] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  timeout "$TMO" "$@"
  rc=$?
  echo "=== [matrix-b] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
}

TMO=4800 run route_quality python benchmarks/route_quality.py

TMO=2400 run seg_ab python benchmarks/seg_ab.py --out reports/seg_ab.json

echo "=== [matrix-b] dream_policy ($(date -u +%H:%M:%S)) ==="
probe
timeout 5400 python -m carla_imitation_learning_tpu.cli run dream_policy \
  --json -o NUM_EPOCHS=12 -o n_envs=64 -o n_steps=500 -o eval_envs=256 \
  -o eval_steps=300 -o log_dir=/tmp/dream_r4b > /tmp/dream_r4b.out 2>&1
rc=$?
grep '^{' /tmp/dream_r4b.out | tail -1 > reports/dream_policy.json
echo "=== [matrix-b] dream_policy done rc=$rc ($(date -u +%H:%M:%S)) ==="

echo "=== [matrix-b] scaling audit (CPU mesh) ($(date -u +%H:%M:%S)) ==="
timeout 2400 python benchmarks/scaling.py
rc=$?
echo "=== [matrix-b] scaling done rc=$rc ($(date -u +%H:%M:%S)) ==="

echo "=== [matrix-b] ALL DONE ($(date -u +%H:%M:%S)) ==="
