"""End-to-end driving quality: expert vs untrained vs BC vs DAgger vs PPO.

The reference trains BC offline and never closes the loop (SURVEY.md §2.3 —
no closed-loop eval exists in /root/reference). This harness is the proof
that the whole TPU-native pipeline composes: on-device expert collection →
BC training on the packed FrameStore → policy-in-the-loop evaluation with
CARLA-leaderboard-style metrics (evaluate_policy) → DAgger refinement — all
on one chip, no host round-trips inside any rollout.

Reported per policy tier: driving_score (route completion × multiplicative
infraction penalty), route_completion, collisions_per_km, clean_episode_rate,
action agreement with the expert. Expected ordering:
    untrained  <<  BC  <=  DAgger  <=  expert (same controller that labels)

MULTI-SEED PROTOCOL (round 5): ``--seeds N`` repeats the WHOLE pipeline —
collection, training, and every eval fleet — under N distinct seeds inside
one process (the compiled rollout/train programs are shape-identical across
seeds, so seeds 2..N pay runtime only, no recompiles). The report carries
``runs`` (every seed's full tier dicts) and ``summary`` (per tier:
mean/min/max/spread of each metric). The reference seeds exactly once
(torch.manual_seed, train.py:103); round-4's own data showed a single tier
spanning 0.534–0.715 across reruns, so single-seed orderings at ~0.05 tier
gaps are unresolvable — claim an ordering only when the gap beats the spread.

Usage: python benchmarks/driving_quality.py [--envs 256] [--steps 300]
         [--collect-envs 64] [--collect-steps 500] [--epochs 8] [--dagger 2]
         [--seeds 3]
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
    ap.add_argument("--rl-w-red", type=float, default=None,
                    help="override PPOConfig.w_red (red-light crossing "
                         "penalty) — the round-5 compliance A/B knob")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0, help="base seed")
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of full pipeline repetitions (seed, seed+1, "
                         "…); >1 adds the per-tier mean/min/max summary")
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

    keep = ("driving_score", "route_completion", "clean_episode_rate",
            "collisions_per_km", "red_violations_per_km", "mean_speed",
            "action_agreement", "km_driven", "steer_rate",
            "driving_score_arc", "route_completion_arc", "route_km")

    def trim(m):
        # per-km rates are already None over ~zero km (strict-JSON safe)
        return {k: None if m[k] is None else round(float(m[k]), 4)
                for k in keep}

    t0 = time.perf_counter()
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform, "runs": {}}
    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "driving_quality.json")
    out.parent.mkdir(parents=True, exist_ok=True)

    def save():
        # incremental: a wedged tunnel mid-run must not lose finished tiers
        out.write_text(json.dumps(result, indent=2) + "\n")

    def run_seed(seed: int) -> dict:
        """The full pipeline under one seed: collection, training, and every
        eval fleet draw fresh randomness from it (eval keys fold the seed so
        eval-fleet variance is sampled too, not just training variance)."""
        r: dict = {}
        result["runs"][str(seed)] = r
        rng = jax.random.PRNGKey(seed)

        def ev(policy_fn, tier_key, shield=None):
            return cl.evaluate_policy(
                params, town, rcfg, policy_fn,
                jax.random.PRNGKey(1000 * seed + tier_key),
                n_envs=args.envs, n_steps=args.steps, shield=shield)

        # --- expert + untrained baselines ---------------------------------
        r["expert"] = trim(ev(None, 100))
        print(f"[seed {seed}] expert: {r['expert']}", flush=True)
        save()

        rng, ki = jax.random.split(rng)
        tx = optax.adam(1e-3)
        state = create_train_state(
            model, ki, jnp.zeros((1, rcfg.height, rcfg.width, 4)), tx)
        r["untrained"] = trim(ev(policy_from(state.params), 101))
        print(f"[seed {seed}] untrained: {r['untrained']}", flush=True)
        save()

        # --- collect expert data + BC training ----------------------------
        rng, kc = jax.random.split(rng)
        tc = time.perf_counter()
        noise = cl.NoiseConfig(seed=seed) if args.noise else None
        store, _, _ = cl.collect_dataset(params, town, rcfg, kc,
                                         args.collect_envs, args.collect_steps,
                                         noise=noise)
        r["collect_seconds"] = round(time.perf_counter() - tc, 1)
        r["dataset_frames"] = len(store)

        step = make_train_step(bc_loss_fn, donate=False)
        tt = time.perf_counter()
        last = {}
        # ONE dataset per store: DeviceDataset uploads the full frame store
        # to HBM at construction; its internal rng reshuffles every epoch
        ds = pipe.DeviceDataset(store, args.batch, shuffle=True, seed=seed,
                                balanced=args.balanced)
        for ep in range(args.epochs):
            for batch in ds:
                rng, sk = jax.random.split(rng)
                state, last = step(state, batch, sk)
        if last:
            jax.block_until_ready(last["loss"])
            r["bc_final_loss"] = round(float(last["loss"]), 4)
            r["bc_final_accuracy"] = round(float(last["accuracy"]), 4)
        r["train_seconds"] = round(time.perf_counter() - tt, 1)
        save()  # training metadata survives even if the BC eval wedges
        r["bc"] = trim(ev(policy_from(state.params), 102))
        print(f"[seed {seed}] bc: {r['bc']}", flush=True)
        save()

        if args.shield:
            # deployment A/B: the SAME BC policy behind the emergency-brake
            # layer (training/shield.py), same eval seed — isolates the
            # shield's effect on collisions/km vs driving score
            from carla_imitation_learning_tpu.training.shield import ShieldConfig

            m = ev(policy_from(state.params), 102, shield=ShieldConfig())
            r["bc_shield"] = {k: (None if m[k] is None else
                                  round(float(m[k]), 4))
                              for k in keep + ("shield_interventions_per_km",
                                               "shield_active_frac")}
            print(f"[seed {seed}] bc+shield: {r['bc_shield']}", flush=True)
            save()

        # --- DAgger refinement ---------------------------------------------
        stores = [store]
        for rnd in range(args.dagger):
            print(f"[seed {seed}] dagger round {rnd}: collecting...", flush=True)
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
                                    seed=1000 + 17 * seed + rnd,
                                    balanced=args.balanced)
            for ep in range(max(2, args.epochs // 2)):
                for batch in ds:
                    rng, sk = jax.random.split(rng)
                    state, last = step(state, batch, sk)
            # per-round eval on the SAME fleet key: the dagger-round CURVE
            # (r4 left "why is dagger=2 < dagger=1?" open — paired rounds
            # on one eval fleet answer it per seed)
            r[f"dagger_r{rnd + 1}"] = trim(ev(policy_from(state.params), 103))
            print(f"[seed {seed}] dagger_r{rnd + 1}: {r[f'dagger_r{rnd+1}']}",
                  flush=True)
            save()
        if args.dagger:
            jax.block_until_ready(last["loss"])
            r["dagger_frames"] = sum(len(s) for s in stores)
            r["dagger"] = r[f"dagger_r{args.dagger}"]
            save()

        # --- PPO fine-tuning on the driving objective ----------------------
        if args.rl:
            from carla_imitation_learning_tpu.training.rl import (
                ActorCriticCNN, PPOConfig, actor_policy_params_from,
                ppo_train, warm_start_from_policy,
            )

            # warm-start from the final imitation params (BC or BC+DAgger)
            ac = ActorCriticCNN(dtype=jnp.bfloat16)
            rng, ka = jax.random.split(rng)
            ac_params = ac.init(ka, ac.example_input(
                1, rcfg.height, rcfg.width))["params"]
            ac_params = warm_start_from_policy(ac_params, state.params)
            pcfg = (PPOConfig(w_red=args.rl_w_red)
                    if args.rl_w_red is not None else PPOConfig())
            ptx = optax.chain(optax.clip_by_global_norm(pcfg.max_grad_norm),
                              optax.adam(pcfg.learning_rate))
            tr = time.perf_counter()
            rng, kp = jax.random.split(rng)
            ac_params, _, hist = ppo_train(
                params, town, rcfg, ac, ac_params, ptx, ptx.init(ac_params),
                kp, n_envs=args.rl_envs, rollout_steps=args.rl_steps,
                iterations=args.rl, cfg=pcfg)
            r["rl_seconds"] = round(time.perf_counter() - tr, 1)
            r["rl_history"] = hist[:3] + hist[-3:] if len(hist) > 6 else hist
            r["rl_env_steps_per_sec"] = round(float(np.median(
                [h["env_steps_per_sec"] for h in hist[1:]])), 1) \
                if len(hist) > 1 else None
            save()
            r["rl"] = trim(ev(policy_from(
                actor_policy_params_from(ac_params)), 104))
            print(f"[seed {seed}] rl (ppo, warm-start): {r['rl']}", flush=True)
            save()
        return r

    seeds = [args.seed + i for i in range(max(1, args.seeds))]
    for seed in seeds:
        ts = time.perf_counter()
        run_seed(seed)
        result["runs"][str(seed)]["seed_seconds"] = round(
            time.perf_counter() - ts, 1)
        save()

    # --- aggregate: per tier, mean/min/max over seeds ------------------------
    tier_names = (["expert", "untrained", "bc", "bc_shield"]
                  + [f"dagger_r{i + 1}" for i in range(args.dagger)]
                  + ["dagger", "rl"])
    tiers = [t for t in tier_names
             if all(t in result["runs"][str(s)] for s in seeds)]
    summary: dict = {}
    for t in tiers:
        summary[t] = {}
        for k in keep:
            vals = [result["runs"][str(s)][t].get(k) for s in seeds]
            vals = [v for v in vals if v is not None]
            if not vals:
                continue
            summary[t][k] = {
                "mean": round(float(np.mean(vals)), 4),
                "min": round(float(np.min(vals)), 4),
                "max": round(float(np.max(vals)), 4),
                "values": vals,
            }
    result["summary"] = summary
    # compat: top-level tier dicts mirror seed-0 (single-seed runs keep the
    # historical shape; multi-seed consumers should read ``summary``)
    for t in tiers:
        result[t] = result["runs"][str(seeds[0])][t]
    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()

    def line(t):
        s = summary.get(t, {}).get("driving_score")
        if s is None:
            return None
        return s["mean"] if args.seeds > 1 else s["values"][0]

    print(json.dumps({
        "metric": "closed_loop_driving_score_bc",
        "value": line("bc"),
        "unit": "leaderboard score (0-1)" + (
            f" (mean of {args.seeds} seeds)" if args.seeds > 1 else ""),
        "seeds": args.seeds,
        "expert": line("expert"),
        "untrained": line("untrained"),
        "dagger": line("dagger"),
        "rl": line("rl"),
        "spread": {t: [summary[t]["driving_score"]["min"],
                       summary[t]["driving_score"]["max"]]
                   for t in tiers if "driving_score" in summary.get(t, {})},
    }))


if __name__ == "__main__":
    main()
