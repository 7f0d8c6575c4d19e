#!/bin/bash
# Round-5 measurement matrix (serial, single v5e chip, 1-core host).
#
# The statistical-honesty round: every quality tier re-measured under the
# multi-seed protocol (--seeds 3, mean/min/max in each report's `summary`),
# the de-exploited dream_policy at fleet budget, the PPO compliance A/B
# (w_red 10 vs 30), the seg A/B at matrix budget with diagnosis arms, the
# envelope cost ablation, and the ViT crossover hunt.
#
# ADVICE r4 fixes baked in: run() returns the tier's rc (failures
# propagate), probe failure aborts the tier instead of launching anyway,
# and experiment JSON extraction only overwrites a report on rc==0 with
# non-empty output.
#
# Usage: bash benchmarks/matrix_r5.sh [stage ...] > reports/matrix_r5.log 2>&1
#   (no args = all stages in order)
cd "$(dirname "$0")/.." || exit 1

probe() {
  for i in $(seq 1 20); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones(8).sum().block_until_ready()" 2>/dev/null; then
      return 0
    fi
    echo "[matrix-r5] device probe $i failed; waiting 30s" >&2
    sleep 30
  done
  echo "[matrix-r5] device never came back" >&2
  return 1
}

run() {
  name="$1"; shift
  echo "=== [matrix-r5] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  timeout "${TMO:-1800}" "$@"
  rc=$?
  echo "=== [matrix-r5] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  return $rc
}

# run a CLI experiment whose stdout tail JSON becomes the report; only
# overwrite the report when the run succeeded and produced a JSON line
run_exp() {
  name="$1"; report="$2"; shift 2
  echo "=== [matrix-r5] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  tmp="/tmp/${name}_r5.out"
  timeout "${TMO:-1800}" "$@" > "$tmp" 2>&1
  rc=$?
  if [ $rc -eq 0 ] && grep -q '^{' "$tmp"; then
    grep '^{' "$tmp" | tail -1 > "$report"
  else
    echo "[matrix-r5] $name rc=$rc — keeping existing $report" >&2
    tail -5 "$tmp" >&2
  fi
  echo "=== [matrix-r5] $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  return $rc
}

stage_quality() {
  TMO=3600 run driving_quality python benchmarks/driving_quality.py \
    --seeds 3 --dagger 2
}

stage_routes() {
  TMO=3600 run route_quality python benchmarks/route_quality.py \
    --seeds 3 --dagger-rounds 2
}

stage_dream() {
  # fleet budget, round-5 mitigations ON (ensemble+anchor+warm start)
  TMO=2400 run_exp dream_policy reports/dream_policy.json \
    python -m carla_imitation_learning_tpu.cli run dream_policy \
    --json -o NUM_EPOCHS=10 -o n_envs=64 -o n_steps=500 -o eval_envs=256 \
    -o eval_steps=300 -o imag_updates=300 -o log_dir=/tmp/dream_r5
}

stage_dream_bare() {
  # mechanism check: same budget, mitigations OFF (round-4 objective) —
  # expected to reproduce the collapse; kept as the A/B arm
  TMO=2400 run_exp dream_policy_bare reports/dream_policy_bare.json \
    python -m carla_imitation_learning_tpu.cli run dream_policy \
    --json -o NUM_EPOCHS=10 -o n_envs=64 -o n_steps=500 -o eval_envs=256 \
    -o eval_steps=300 -o imag_updates=300 -o reward_ensemble=1 \
    -o imag_disagree=0 -o imag_bc_anchor=0 -o imag_warm_start=false \
    -o log_dir=/tmp/dream_r5_bare
}

stage_rl() {
  TMO=3600 run driving_quality_rl python benchmarks/driving_quality.py \
    --seeds 2 --dagger 1 --rl 12 --out reports/driving_quality_rl.json
}

stage_rl_compliance() {
  TMO=3600 run rl_wred30 python benchmarks/driving_quality.py \
    --seeds 2 --dagger 1 --rl 12 --rl-w-red 30 \
    --out reports/driving_quality_rl_wred30.json
}

stage_seg() {
  TMO=3600 run seg_ab python benchmarks/seg_ab.py
}

stage_continuous() {
  TMO=5400 run continuous_ab python benchmarks/continuous_ab.py --seeds 3
}

stage_sim() {
  TMO=1800 run sim_ablation python benchmarks/sim_ablation.py \
    --out reports/sim_ablation.json
}

stage_vit() {
  TMO=3600 run vit_crossover python benchmarks/vit_crossover.py
}

stage_bench() {
  TMO=1800 run bench python bench.py
}

if [ $# -eq 0 ]; then
  set -- quality routes dream dream_bare rl rl_compliance seg continuous \
         sim vit bench
fi
overall=0
for s in "$@"; do
  "stage_$s" || overall=1
done
echo "=== [matrix-r5] ALL DONE overall=$overall ($(date -u +%H:%M:%S)) ==="
exit $overall
