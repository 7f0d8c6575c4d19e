#!/bin/bash
# Round-4 measured-quality matrix (single v5e chip, serial — the host has
# ONE core, never run two measurements concurrently).
#
# Re-measures the whole quality ladder after the expert safety fix (headway
# braking + junction yield changed the label source, so every tier moves),
# and adds the round-4 tiers: ViT on-chip A/B + driving datapoint, seg-aux
# A/B, goal-directed DAgger-CIL on A→B, fleet-scale dream policy, coalesced
# HTTP serving throughput.
#
# Every harness writes its JSON INCREMENTALLY — a wedged tunnel mid-run
# loses at most the tier in flight. The probe loop waits out wedges
# (verify recipe: after a TPU OOM/wedge the tunnel self-recovers in minutes).
#
# Usage: setsid nohup bash benchmarks/matrix_r4.sh > reports/matrix_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones(8).sum().block_until_ready()" 2>/dev/null; then
      return 0
    fi
    echo "[matrix] device probe $i failed; waiting 60s" >&2
    sleep 60
  done
  echo "[matrix] device never came back" >&2
  return 1
}

run() {
  name="$1"; shift
  echo "=== [matrix] $name: $* ($(date -u +%H:%M:%S)) ==="
  probe || return 1
  timeout "$TMO" "$@"
  echo "=== [matrix] $name done rc=$? ($(date -u +%H:%M:%S)) ==="
}

# 0. Expert envelope ablation: what each safety lever buys the label source
#    (VERDICT items 1+9's "Done" numbers).
TMO=1800 run expert_envelope python benchmarks/expert_envelope.py

# 1. The post-fix quality ladder (expert/untrained/bc/dagger, same budget
#    and seeds as r3 so rows stay comparable).
TMO=2400 run driving_quality python benchmarks/driving_quality.py

# 2. A→B routes v2: command coverage + DAgger-CIL tier.
TMO=4800 run route_quality python benchmarks/route_quality.py

# 3. Continuous-control A/B on the new expert.
TMO=2400 run continuous_ab python benchmarks/continuous_ab.py --out reports/continuous_ab.json

# 4. ViT vs CNN step-path MFU (compiled FLOPs; the 30%-ceiling claim).
TMO=1800 run vit_ab python benchmarks/vit_ab.py --out reports/vit_ab.json

# 5. ViT driving-quality datapoint (same budget/seed as the CNN BC row).
TMO=2400 run driving_quality_vit python benchmarks/driving_quality.py \
  --arch vit --dagger 0 --out reports/driving_quality_vit.json

# 6. Seg-aux A/B: does per-pixel supervision move the driving score?
TMO=2400 run seg_ab python benchmarks/seg_ab.py --out reports/seg_ab.json

# 7. Fleet-scale dream policy (same collection budget as the matrix rows).
echo "=== [matrix] dream_policy ($(date -u +%H:%M:%S)) ==="
probe
timeout 3600 python -m carla_imitation_learning_tpu.cli run dream_policy \
  --json -o n_envs=64 -o n_steps=500 -o eval_envs=256 -o eval_steps=300 \
  -o log_dir=/tmp/dream_r4 > /tmp/dream_r4.out 2>&1
grep '^{' /tmp/dream_r4.out | tail -1 > reports/dream_policy.json
echo "=== [matrix] dream_policy done rc=$? ($(date -u +%H:%M:%S)) ==="

# 8. Coalesced serving throughput under concurrent batch-1 clients.
TMO=1800 run serving_http python benchmarks/serving_http.py --out reports/serving_http.json

# 9. Ladder variants on the new expert (balanced / noise / shield).
TMO=2400 run dq_balanced python benchmarks/driving_quality.py --balanced \
  --dagger 0 --out reports/driving_quality_balanced.json
TMO=2400 run dq_noise python benchmarks/driving_quality.py --noise \
  --dagger 0 --out reports/driving_quality_noise.json
TMO=2400 run dq_shield python benchmarks/driving_quality.py --shield \
  --dagger 0 --out reports/driving_quality_shield.json

# 10. PPO tier on the new expert's warm start.
TMO=3000 run dq_rl python benchmarks/driving_quality.py --rl 12 --dagger 1 \
  --out reports/driving_quality_rl.json

echo "=== [matrix] ALL DONE ($(date -u +%H:%M:%S)) ==="
