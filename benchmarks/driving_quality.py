"""End-to-end driving quality: expert vs untrained vs BC vs DAgger vs PPO.

The reference trains BC offline and never closes the loop (SURVEY.md §2.3 —
no closed-loop eval exists in /root/reference). This harness is the proof
that the whole TPU-native pipeline composes: on-device expert collection →
BC training on the packed FrameStore → policy-in-the-loop evaluation with
CARLA-leaderboard-style metrics (evaluate_policy) → DAgger refinement — all
on one chip, no host round-trips inside any rollout.

Reported per policy tier: driving_score (route completion × multiplicative
infraction penalty), route_completion, collisions_per_km, success_rate,
action agreement with the expert. Expected ordering:
    untrained  <<  BC  <=  DAgger  <=  expert (same controller that labels)

Usage: python benchmarks/driving_quality.py [--envs 256] [--steps 300]
         [--collect-envs 64] [--collect-steps 500] [--epochs 8] [--dagger 2]
Writes reports/driving_quality.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256, help="eval fleet size")
    ap.add_argument("--steps", type=int, default=300, help="eval horizon")
    ap.add_argument("--collect-envs", type=int, default=64)
    ap.add_argument("--collect-steps", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--dagger", type=int, default=2,
                    help="DAgger rounds on top of BC (0 to skip)")
    ap.add_argument("--rl", type=int, default=0,
                    help="PPO fine-tuning iterations on top of BC (0 to "
                         "skip) — warm-starts the actor from the BC params")
    ap.add_argument("--rl-envs", type=int, default=256)
    ap.add_argument("--rl-steps", type=int, default=128,
                    help="PPO rollout horizon per iteration")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shield", action="store_true",
                    help="add a bc_shield tier: the BC policy behind the "
                         "emergency-brake safety layer (same eval seed)")
    ap.add_argument("--balanced", action="store_true",
                    help="inverse-frequency action balancing during training")
    ap.add_argument("--noise", action="store_true",
                    help="CIL-style steering-noise injection during expert "
                         "collection (recovery-state data; labels stay clean)")
    ap.add_argument("--arch", choices=["cnn", "vit"], default="cnn",
                    help="policy trunk for the trained tiers (vit = the "
                         "transformer family, models/vit.py) — gives the "
                         "ViT a driving-quality datapoint at the same "
                         "budget/seed as the CNN rows")
    ap.add_argument("--out", default=None,
                    help="report path (default reports/driving_quality.json; "
                         "A/B runs should pick distinct files)")
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl
    from carla_imitation_learning_tpu.training.losses import bc_loss_fn
    from carla_imitation_learning_tpu.training.steps import (
        create_train_state, make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")
    rng = jax.random.PRNGKey(args.seed)
    if args.arch == "vit":
        if args.rl:
            raise SystemExit("--arch vit has no PPO warm-start path "
                             "(ActorCriticCNN trunk) — drop --rl")
        from carla_imitation_learning_tpu.models import ViTPolicy

        model = ViTPolicy(dtype=jnp.bfloat16)
    else:
        model = PolicyCNN(dtype=jnp.bfloat16)

    def policy_from(p):
        def policy_fn(obs):
            return jnp.argmax(model.apply({"params": p}, obs), axis=-1)
        return policy_fn

    def ev(policy_fn, key, shield=None):
        return cl.evaluate_policy(params, town, rcfg, policy_fn,
                                  jax.random.PRNGKey(key),
                                  n_envs=args.envs, n_steps=args.steps,
                                  shield=shield)

    keep = ("driving_score", "route_completion", "success_rate",
            "collisions_per_km", "red_violations_per_km", "mean_speed",
            "action_agreement", "km_driven", "steer_rate",
            "driving_score_arc", "route_completion_arc", "route_km")

    def trim(m):
        # per-km rates are already None over ~zero km (strict-JSON safe)
        return {k: None if m[k] is None else round(float(m[k]), 4)
                for k in keep}

    t0 = time.perf_counter()
    result: dict = {"config": vars(args), "platform": jax.devices()[0].platform}
    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "driving_quality.json")
    out.parent.mkdir(parents=True, exist_ok=True)

    def save():
        # incremental: a wedged tunnel mid-run must not lose finished tiers
        out.write_text(json.dumps(result, indent=2))

    # --- expert + untrained baselines -------------------------------------
    result["expert"] = trim(ev(None, 100))
    print(f"expert: {result['expert']}", flush=True)
    save()

    rng, ki = jax.random.split(rng)
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, ki, jnp.zeros((1, rcfg.height, rcfg.width, 4)), tx)
    result["untrained"] = trim(ev(policy_from(state.params), 101))
    print(f"untrained: {result['untrained']}", flush=True)
    save()

    # --- collect expert data + BC training --------------------------------
    rng, kc = jax.random.split(rng)
    tc = time.perf_counter()
    noise = cl.NoiseConfig(seed=args.seed) if args.noise else None
    store, _, _ = cl.collect_dataset(params, town, rcfg, kc,
                                     args.collect_envs, args.collect_steps,
                                     noise=noise)
    result["collect_seconds"] = round(time.perf_counter() - tc, 1)
    result["dataset_frames"] = len(store)

    step = make_train_step(bc_loss_fn, donate=False)
    tt = time.perf_counter()
    last = {}
    # ONE dataset per store: DeviceDataset uploads the full frame store to
    # HBM at construction (~512 MB at default shapes over a slow tunnel);
    # its internal rng reshuffles (or re-draws balanced) every epoch
    ds = pipe.DeviceDataset(store, args.batch, shuffle=True, seed=args.seed,
                            balanced=args.balanced)
    for ep in range(args.epochs):
        for batch in ds:
            rng, sk = jax.random.split(rng)
            state, last = step(state, batch, sk)
    if last:
        jax.block_until_ready(last["loss"])
        result["bc_final_loss"] = round(float(last["loss"]), 4)
        result["bc_final_accuracy"] = round(float(last["accuracy"]), 4)
    result["train_seconds"] = round(time.perf_counter() - tt, 1)
    save()  # training metadata survives even if the BC eval wedges
    result["bc"] = trim(ev(policy_from(state.params), 102))
    print(f"bc: {result['bc']}", flush=True)
    save()

    if args.shield:
        # deployment A/B: the SAME BC policy behind the emergency-brake
        # layer (training/shield.py), same eval seed — isolates the shield's
        # effect on collisions/km vs driving score
        from carla_imitation_learning_tpu.training.shield import ShieldConfig

        m = cl.evaluate_policy(params, town, rcfg, policy_from(state.params),
                               jax.random.PRNGKey(102), n_envs=args.envs,
                               n_steps=args.steps, shield=ShieldConfig())
        result["bc_shield"] = {k: (None if m[k] is None else
                                   round(float(m[k]), 4))
                               for k in keep + ("shield_interventions_per_km",
                                                "shield_active_frac")}
        print(f"bc+shield: {result['bc_shield']}", flush=True)
        save()

    # --- DAgger refinement -------------------------------------------------
    stores = [store]
    for rnd in range(args.dagger):
        print(f"dagger round {rnd}: collecting...", flush=True)
        rng, kd = jax.random.split(rng)
        # same (envs, steps) as the expert collect so ROUND 2+ hits the
        # persistent compile cache (round 1's policy-driven rollout is a
        # different program from the expert collect and still compiles)
        dstore, _, _ = cl.dagger_iteration(
            params, town, rcfg, policy_from(state.params), kd,
            args.collect_envs, args.collect_steps)
        stores.append(dstore)
        agg = pipe.FrameStore.concat(stores)
        ds = pipe.DeviceDataset(agg, args.batch, shuffle=True,
                                seed=1000 + rnd, balanced=args.balanced)
        for ep in range(max(2, args.epochs // 2)):
            for batch in ds:
                rng, sk = jax.random.split(rng)
                state, last = step(state, batch, sk)
    if args.dagger:
        jax.block_until_ready(last["loss"])
        result["dagger_frames"] = sum(len(s) for s in stores)
        result["dagger"] = trim(ev(policy_from(state.params), 103))
        print(f"dagger: {result['dagger']}", flush=True)
        save()

    # --- PPO fine-tuning on the driving objective ---------------------------
    if args.rl:
        from carla_imitation_learning_tpu.training.rl import (
            ActorCriticCNN, PPOConfig, actor_policy_params_from, ppo_train,
            warm_start_from_policy,
        )

        # warm-start from the final imitation params (BC or BC+DAgger)
        ac = ActorCriticCNN(dtype=jnp.bfloat16)
        rng, ka = jax.random.split(rng)
        ac_params = ac.init(ka, ac.example_input(
            1, rcfg.height, rcfg.width))["params"]
        ac_params = warm_start_from_policy(ac_params, state.params)
        pcfg = PPOConfig()
        ptx = optax.chain(optax.clip_by_global_norm(pcfg.max_grad_norm),
                          optax.adam(pcfg.learning_rate))
        tr = time.perf_counter()
        rng, kp = jax.random.split(rng)
        ac_params, _, hist = ppo_train(
            params, town, rcfg, ac, ac_params, ptx, ptx.init(ac_params), kp,
            n_envs=args.rl_envs, rollout_steps=args.rl_steps,
            iterations=args.rl, cfg=pcfg)
        result["rl_seconds"] = round(time.perf_counter() - tr, 1)
        result["rl_history"] = hist[:3] + hist[-3:] if len(hist) > 6 else hist
        result["rl_env_steps_per_sec"] = round(float(np.median(
            [h["env_steps_per_sec"] for h in hist[1:]])), 1) if len(hist) > 1 \
            else None
        save()
        result["rl"] = trim(ev(policy_from(
            actor_policy_params_from(ac_params)), 104))
        print(f"rl (ppo, warm-start): {result['rl']}", flush=True)

    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()
    print(json.dumps({
        "metric": "closed_loop_driving_score_bc",
        "value": result["bc"]["driving_score"],
        "unit": "leaderboard score (0-1)",
        "expert": result["expert"]["driving_score"],
        "untrained": result["untrained"]["driving_score"],
        "dagger": result.get("dagger", {}).get("driving_score"),
        "rl": result.get("rl", {}).get("driving_score"),
    }))


if __name__ == "__main__":
    main()
