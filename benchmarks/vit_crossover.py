"""ViT crossover hunt: is there a size/resolution where the transformer's
MFU advantage buys DRIVING quality per wall-clock second? (VERDICT r4 #7.)

Round-4 established the compute story (`reports/vit_ab.json`: ViT 29.2% MFU
vs CNN 9.2% — the 4-channel conv stem caps the CNN; but the CNN needs 24×
fewer FLOPs at 133k params, so it wins raw img/s). This harness asks the
question that matters end-to-end: at 256² rendered observations — 4× the
matrix's pixel budget, where a 133k-param trunk should be capacity-starved —
which architecture converts a FIXED wall-clock training budget into the
better driving score?

Protocol: ONE expert collection at 256²; the CNN trains ``--epochs`` epochs
and its measured wall sets the budget; each ViT variant (stock 2M and a
scaled ``--vit-dim/--vit-depth`` ~10M config) then trains until that same
wall-clock elapses (whole epochs, ≥1); all policies drive the SAME 256²
eval fleet. Either the crossover shows, or the honest "CNN wins at all
practical sizes for this task" row gets its numbers.

Usage: python benchmarks/vit_crossover.py [--obs-hw 256] [--epochs 8]
Writes reports/vit_crossover.json incrementally; prints one JSON line.
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
    ap.add_argument("--obs-hw", type=int, default=256,
                    help="rendered observation resolution (camera + policy)")
    ap.add_argument("--envs", type=int, default=128, help="eval fleet size")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--collect-envs", type=int, default=32)
    ap.add_argument("--collect-steps", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=8,
                    help="CNN epochs; sets the shared wall-clock budget")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--vit-dim", type=int, default=384)
    ap.add_argument("--vit-depth", type=int, default=6)
    ap.add_argument("--vit-heads", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import PolicyCNN, ViTPolicy
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
    hw = args.obs_hw
    rcfg = RenderConfig(height=hw, width=hw,
                        backend="pallas" if on_tpu else "jax")
    rng = jax.random.PRNGKey(args.seed)

    keep = ("driving_score", "route_completion", "clean_episode_rate",
            "collisions_per_km", "red_violations_per_km", "mean_speed",
            "action_agreement")

    t0 = time.perf_counter()
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform}
    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "vit_crossover.json")
    out.parent.mkdir(parents=True, exist_ok=True)

    def save():
        out.write_text(json.dumps(result, indent=2) + "\n")

    def ev(model, p, tier_key):
        def policy_fn(obs):
            return jnp.argmax(model.apply({"params": p}, obs), axis=-1)
        m = cl.evaluate_policy(params, town, rcfg, policy_fn,
                               jax.random.PRNGKey(tier_key),
                               n_envs=args.envs, n_steps=args.steps)
        return {k: (None if m[k] is None else round(float(m[k]), 4))
                for k in keep}

    # --- shared collection at the crossover resolution ---------------------
    rng, kc = jax.random.split(rng)
    tc = time.perf_counter()
    store, _, _ = cl.collect_dataset(params, town, rcfg, kc,
                                     args.collect_envs, args.collect_steps)
    result["dataset_frames"] = len(store)
    result["collect_seconds"] = round(time.perf_counter() - tc, 1)
    m = cl.evaluate_policy(params, town, rcfg, None, jax.random.PRNGKey(100),
                           n_envs=args.envs, n_steps=args.steps)
    result["expert"] = {k: (None if m[k] is None else round(float(m[k]), 4))
                        for k in keep}
    save()

    def train_arch(name: str, model, budget_s: float | None, tier_key: int):
        """Train until ``budget_s`` wall-clock elapses (whole epochs, ≥1);
        None = exactly args.epochs (the budget-setting CNN run)."""
        rng_l = jax.random.PRNGKey(args.seed + tier_key)
        state = create_train_state(
            model, jax.random.PRNGKey(args.seed),
            jnp.zeros((1, hw, hw, 4)), optax.adam(1e-3))
        step = make_train_step(bc_loss_fn, donate=False)
        ds = pipe.DeviceDataset(store, args.batch, shuffle=True,
                                seed=args.seed)
        last, epochs_done, steps_done = {}, 0, 0
        # epoch 0 pays the compile; start the budget clock AFTER it so both
        # architectures get the same amount of pure training compute
        tt = None
        while True:
            for batch in ds:
                rng_l, sk = jax.random.split(rng_l)
                state, last = step(state, batch, sk)
                steps_done += 1
            jax.block_until_ready(last["loss"])
            epochs_done += 1
            if tt is None:
                tt = time.perf_counter()  # budget starts post-compile
            elif budget_s is None:
                if epochs_done >= args.epochs:
                    break
            elif time.perf_counter() - tt >= budget_s or epochs_done >= 64:
                break
            if budget_s is None and epochs_done >= args.epochs:
                break
        wall = time.perf_counter() - tt
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(state.params))
        r = {
            "params": n_params,
            "epochs": epochs_done,
            "train_steps": steps_done,
            "train_seconds_post_compile": round(wall, 1),
            "final_loss": round(float(last["loss"]), 4),
            "final_accuracy": round(float(last["accuracy"]), 4),
        }
        r["eval"] = ev(model, state.params, tier_key)
        result[name] = r
        print(f"{name}: params={n_params:,} epochs={epochs_done} "
              f"score={r['eval']['driving_score']} "
              f"acc={r['final_accuracy']}", flush=True)
        save()
        return r

    cnn = train_arch("cnn", PolicyCNN(dtype=jnp.bfloat16), None, 102)
    budget = cnn["train_seconds_post_compile"]
    result["wall_budget_seconds"] = budget
    train_arch("vit_2m", ViTPolicy(dtype=jnp.bfloat16), budget, 103)
    train_arch(
        "vit_scaled",
        ViTPolicy(dim=args.vit_dim, depth=args.vit_depth,
                  heads=args.vit_heads, dtype=jnp.bfloat16),
        budget, 104)

    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()
    print(json.dumps({
        "metric": "vit_crossover_driving_score",
        "obs_hw": hw,
        "wall_budget_seconds": budget,
        "cnn": result["cnn"]["eval"]["driving_score"],
        "vit_2m": result["vit_2m"]["eval"]["driving_score"],
        "vit_scaled": result["vit_scaled"]["eval"]["driving_score"],
        "expert": result["expert"]["driving_score"],
        "unit": "driving score at matched wall-clock",
    }))


if __name__ == "__main__":
    main()
