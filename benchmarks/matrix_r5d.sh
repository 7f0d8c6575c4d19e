#!/bin/bash
# Round-5 queue D (endgame): after the running seg_ab (PID $1), the DAgger
# per-round curve, then the continuous ladder at 2 seeds (fits the
# remaining chip window; vit_crossover is authored but deferred — the
# statistically-honest continuous tiers outrank the one crossover
# datapoint in VERDICT r4's own ordering).
cd "$(dirname "$0")/.." || exit 1
[ -n "$1" ] && while kill -0 "$1" 2>/dev/null; do sleep 20; done

probe() {
  for i in $(seq 1 20); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones(8).sum().block_until_ready()" 2>/dev/null; then
      return 0
    fi
    echo "[matrix-r5d] device probe $i failed; waiting 30s" >&2
    sleep 30
  done
  echo "[matrix-r5d] device never came back" >&2
  return 1
}

run() {
  name="$1"; shift
  echo "=== [matrix-r5d] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  timeout "${TMO:-1800}" "$@"
  rc=$?
  echo "=== [matrix-r5d] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  return $rc
}

overall=0
TMO=2400 run driving_quality_curve python benchmarks/driving_quality.py \
  --seeds 3 --dagger 2 || overall=1
TMO=4200 run continuous_ab python benchmarks/continuous_ab.py --seeds 2 \
  || overall=1
echo "=== [matrix-r5d] ALL DONE overall=$overall ($(date -u +%H:%M:%S)) ==="
exit $overall
