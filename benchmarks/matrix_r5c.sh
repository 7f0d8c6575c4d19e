#!/bin/bash
# Round-5 queue C: routes re-run (the lane-fix measurement, crashed out of
# queue B on a wedged tunnel) rescheduled first after the in-flight RL
# stage; then the compliance arm, strong-dose imagination, seg, the DAgger
# curve, and the long-tail tiers. Waits for PID $1 (driving_quality_rl).
cd "$(dirname "$0")/.." || exit 1
[ -n "$1" ] && while kill -0 "$1" 2>/dev/null; do sleep 20; done

probe() {
  for i in $(seq 1 20); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones(8).sum().block_until_ready()" 2>/dev/null; then
      return 0
    fi
    echo "[matrix-r5c] device probe $i failed; waiting 30s" >&2
    sleep 30
  done
  echo "[matrix-r5c] device never came back" >&2
  return 1
}

run() {
  name="$1"; shift
  echo "=== [matrix-r5c] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  timeout "${TMO:-1800}" "$@"
  rc=$?
  echo "=== [matrix-r5c] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  return $rc
}

run_exp() {
  name="$1"; report="$2"; shift 2
  echo "=== [matrix-r5c] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  tmp="/tmp/${name}_r5c.out"
  timeout "${TMO:-1800}" "$@" > "$tmp" 2>&1
  rc=$?
  if [ $rc -eq 0 ] && grep -q '^{' "$tmp"; then
    grep '^{' "$tmp" | tail -1 > "$report"
  else
    echo "[matrix-r5c] $name rc=$rc — keeping existing $report" >&2
    tail -5 "$tmp" >&2
  fi
  echo "=== [matrix-r5c] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  return $rc
}

overall=0
TMO=3600 run route_quality_fixed python benchmarks/route_quality.py \
  --seeds 3 --dagger-rounds 2 --out reports/route_quality_fixed.json \
  || TMO=3600 run route_quality_retry python benchmarks/route_quality.py \
  --seeds 3 --dagger-rounds 2 --out reports/route_quality_fixed.json \
  || overall=1
TMO=3600 run rl_wred30 python benchmarks/driving_quality.py \
  --seeds 2 --dagger 1 --rl 12 --rl-w-red 30 \
  --out reports/driving_quality_rl_wred30.json || overall=1
TMO=2400 run_exp dream_strong reports/dream_policy_strong.json \
  python -m carla_imitation_learning_tpu.cli run dream_policy \
  --json -o NUM_EPOCHS=10 -o n_envs=64 -o n_steps=500 -o eval_envs=256 \
  -o eval_steps=300 -o imag_updates=300 -o imag_disagree=10 \
  -o imag_bc_anchor=1.0 -o imag_uncertainty_stop=0.25 \
  -o log_dir=/tmp/dream_r5s || overall=1
TMO=3600 run seg_ab python benchmarks/seg_ab.py || overall=1
TMO=3600 run driving_quality_curve python benchmarks/driving_quality.py \
  --seeds 3 --dagger 2 || overall=1
TMO=3600 run vit_crossover python benchmarks/vit_crossover.py || overall=1
TMO=5400 run continuous_ab python benchmarks/continuous_ab.py --seeds 3 \
  || overall=1
TMO=1800 run bench python bench.py || overall=1
echo "=== [matrix-r5c] ALL DONE overall=$overall ($(date -u +%H:%M:%S)) ==="
exit $overall
