"""Discrete vs continuous action-space A/B on the driving score.

The reference discretizes the autopilot's controls into 9 classes and trains
a classifier (imitation_dataset.py:317-339); the continuous tier regresses
the raw (steer, accel) instead (bc_continuous). This harness answers the
obvious question — which drives better? — with everything else held equal:
SAME collected frames, SAME trunk, SAME epochs/batches, SAME eval fleet.

Tiers: expert ceiling, bc_discrete, bc_continuous, and optionally one DAgger
round per family (the policy drives in ITS OWN control space; the expert
labels both ways — store.actions discrete, store.controls continuous).

``--seeds N`` repeats the whole A/B under N seeds (collection, training and
eval fleets all re-drawn) and adds a per-tier mean/min/max summary — the
round-5 protocol: tier orderings are claimed only when the gap beats the
spread (round 4's single-seed DAgger tier spanned 0.534–0.715 across runs).

Usage: python benchmarks/continuous_ab.py [--envs 256] [--steps 300]
         [--collect-envs 64] [--collect-steps 500] [--epochs 8] [--dagger 1]
         [--seeds 3]
Writes reports/continuous_ab.json incrementally and prints one JSON line.
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
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--collect-envs", type=int, default=64)
    ap.add_argument("--collect-steps", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--dagger", type=int, default=1,
                    help="DAgger rounds per family (0 to skip)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1,
                    help="full-pipeline repetitions (multi-seed summary)")
    ap.add_argument("--noise", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import (
        ContinuousPolicyCNN, PolicyCNN,
    )
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl
    from carla_imitation_learning_tpu.training.losses import (
        bc_loss_fn, continuous_bc_loss_fn,
    )
    from carla_imitation_learning_tpu.training.steps import (
        create_train_state, make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")

    keep = ("driving_score", "route_completion", "clean_episode_rate",
            "collisions_per_km", "red_violations_per_km", "mean_speed",
            "action_agreement", "km_driven", "steer_rate",
            "driving_score_arc", "route_completion_arc")

    def trim(m):
        return {k: None if m[k] is None else round(float(m[k]), 4)
                for k in keep}

    t0 = time.perf_counter()
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform, "runs": {}}
    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "continuous_ab.json")
    out.parent.mkdir(parents=True, exist_ok=True)

    def save():
        out.write_text(json.dumps(result, indent=2) + "\n")

    families = {
        "discrete": {
            "model": PolicyCNN(dtype=jnp.bfloat16),
            "loss": bc_loss_fn,
            "labels": lambda s: None,
        },
        "continuous": {
            "model": ContinuousPolicyCNN(dtype=jnp.bfloat16),
            "loss": continuous_bc_loss_fn(),
            "labels": lambda s: s.controls,
        },
    }

    def run_seed(seed: int) -> dict:
        r: dict = {}
        result["runs"][str(seed)] = r
        rng = jax.random.PRNGKey(seed)

        def ev(policy_fn, tier_key, space):
            return trim(cl.evaluate_policy(
                params, town, rcfg, policy_fn,
                jax.random.PRNGKey(1000 * seed + tier_key),
                n_envs=args.envs, n_steps=args.steps, control_space=space))

        r["expert"] = ev(None, 100, "discrete")
        print(f"[seed {seed}] expert: {r['expert']}", flush=True)
        save()

        rng, kc = jax.random.split(rng)
        noise = cl.NoiseConfig(seed=seed) if args.noise else None
        store, _, _ = cl.collect_dataset(params, town, rcfg, kc,
                                         args.collect_envs, args.collect_steps,
                                         noise=noise)
        r["dataset_frames"] = len(store)
        save()

        for name, fam in families.items():
            model, loss = fam["model"], fam["loss"]

            def policy_from(p, model=model, name=name):
                def policy_fn(obs):
                    y = model.apply({"params": p}, obs)
                    return y if name == "continuous" else jnp.argmax(y, axis=-1)
                return policy_fn

            rng, ki = jax.random.split(rng)
            state = create_train_state(
                model, ki, jnp.zeros((1, rcfg.height, rcfg.width, 4)),
                optax.adam(1e-3))
            step = make_train_step(loss, donate=False)

            def train(st, frames_store, ds_seed, epochs):
                nonlocal rng
                ds = pipe.DeviceDataset(
                    frames_store, args.batch, shuffle=True, seed=ds_seed,
                    continuous_labels=fam["labels"](frames_store))
                last = {}
                for _ in range(epochs):
                    for batch in ds:
                        rng, sk = jax.random.split(rng)
                        st, last = step(st, batch, sk)
                return st, {k: round(float(v), 4) for k, v in last.items()}

            tt = time.perf_counter()
            state, last = train(state, store, seed, args.epochs)
            r[f"bc_{name}_train_seconds"] = round(time.perf_counter() - tt, 1)
            r[f"bc_{name}_final"] = last
            save()
            r[f"bc_{name}"] = ev(policy_from(state.params), 102, name)
            print(f"[seed {seed}] bc_{name}: {r[f'bc_{name}']}", flush=True)
            save()

            stores = [store]
            for rnd in range(args.dagger):
                rng, kd = jax.random.split(rng)
                dstore, _, _ = cl.dagger_iteration(
                    params, town, rcfg, policy_from(state.params), kd,
                    args.collect_envs, args.collect_steps, control_space=name)
                stores.append(dstore)
                state, last = train(state, pipe.FrameStore.concat(stores),
                                    1000 + 17 * seed + rnd,
                                    max(2, args.epochs // 2))
            if args.dagger:
                r[f"dagger_{name}"] = ev(policy_from(state.params), 103, name)
                print(f"[seed {seed}] dagger_{name}: {r[f'dagger_{name}']}",
                      flush=True)
                save()
        return r

    seeds = [args.seed + i for i in range(max(1, args.seeds))]
    for seed in seeds:
        ts = time.perf_counter()
        run_seed(seed)
        result["runs"][str(seed)]["seed_seconds"] = round(
            time.perf_counter() - ts, 1)
        save()

    tiers = ["expert", "bc_discrete", "bc_continuous"]
    if args.dagger:
        tiers += ["dagger_discrete", "dagger_continuous"]
    summary: dict = {}
    for t in tiers:
        if not all(t in result["runs"][str(s)] for s in seeds):
            continue
        summary[t] = {}
        for k in keep:
            vals = [result["runs"][str(s)][t].get(k) for s in seeds]
            vals = [v for v in vals if v is not None]
            if vals:
                summary[t][k] = {
                    "mean": round(float(np.mean(vals)), 4),
                    "min": round(float(np.min(vals)), 4),
                    "max": round(float(np.max(vals)), 4),
                    "values": vals,
                }
    result["summary"] = summary
    for t in summary:
        result[t] = result["runs"][str(seeds[0])][t]
    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()

    def line(t):
        s = summary.get(t, {}).get("driving_score")
        return None if s is None else (
            s["mean"] if args.seeds > 1 else s["values"][0])

    print(json.dumps({
        "metric": "continuous_vs_discrete_driving_score",
        "seeds": args.seeds,
        "bc_discrete": line("bc_discrete"),
        "bc_continuous": line("bc_continuous"),
        "dagger_discrete": line("dagger_discrete"),
        "dagger_continuous": line("dagger_continuous"),
        "expert": line("expert"),
        "spread": {t: [summary[t]["driving_score"]["min"],
                       summary[t]["driving_score"]["max"]]
                   for t in summary if "driving_score" in summary[t]},
    }))


if __name__ == "__main__":
    main()
