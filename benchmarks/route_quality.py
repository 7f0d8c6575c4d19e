"""A→B route quality: expert vs untrained vs goal-trained CIL vs DAgger-CIL.

The CARLA leaderboard's actual task is destination-based: drive from A to B
along a planned route. The reference never closes the loop at all (SURVEY.md
§2.3); this harness proves the framework's full driving STACK composes:
global route planner (sim/planner.py — host Dijkstra baked into device
tables) → goal-directed expert collection (commands announce the planner's
turns) → command-conditioned BranchedCILPolicy training → route_eval-style
scoring (training/closed_loop.evaluate_routes): arrival rate, time to
arrival, infractions per km, with the privileged expert as the ceiling.

Round-4 command-coverage fixes (r3 measured histogram was
[35728, 12531, 66, 2875, 0, 0] — right turns 0.13%, lane changes zero):
- the town is MULTILANE (2 lanes/direction) with scheduled lane changes
  (SimParams.lane_change_period), so commands 4/5 exist in the world;
- HALF the collection budget runs on the y-axis-mirrored town
  (sim/town.mirror_town) — make_town's loops are all counterclockwise, and
  reflection turns every left into a genuine right with consistent
  pixels/labels/commands;
- epoch sampling balances the JOINT (action, command) key
  (DeviceDataset balance_key="action_command"), so no CIL branch starves;
- a goal-directed DAgger round (policy drives to the goals, expert labels,
  aggregate, retrain) sits between BC and the expert.

Round-5: ``--seeds N`` repeats collection/training/eval under N seeds (town
and goal set stay FIXED — they are compiled constants; what varies is the
spawn/collection/training/eval randomness) with a mean/min/max summary, and
``--dagger-rounds`` allows more than one on-policy aggregation round. The
expert itself gained the junction entry-conflict tie-break and the
lane-change occupancy gate (sim/world.py round-5) — the two mechanisms
behind its 61-crashes-in-114-attempts r4 ceiling.

Expected ordering: untrained << CIL ≤ DAgger-CIL ≤ expert.

Usage: python benchmarks/route_quality.py [--envs 64] [--steps 2500]
         [--goals 8] [--collect-envs 64] [--collect-steps 800] [--epochs 8]
         [--dagger-epochs 4] [--dagger-rounds 1] [--seeds 3] [--no-mirror]
Writes reports/route_quality.json INCREMENTALLY and prints one JSON line.
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
    ap.add_argument("--envs", type=int, default=64, help="eval fleet size")
    ap.add_argument("--steps", type=int, default=2500, help="eval horizon")
    ap.add_argument("--goals", type=int, default=8)
    ap.add_argument("--collect-envs", type=int, default=64)
    ap.add_argument("--collect-steps", type=int, default=800,
                    help="TOTAL collection budget (split across the town "
                         "and its mirror unless --no-mirror)")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--dagger-epochs", type=int, default=4,
                    help="extra epochs on the aggregated store after each "
                         "DAgger round (0 skips the tier)")
    ap.add_argument("--dagger-rounds", type=int, default=1,
                    help="goal-directed DAgger rounds (each: policy drives "
                         "the routes, expert labels, aggregate, retrain)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--episode-len", type=int, default=2500,
                    help="per-attempt step budget (one-way loop detours + "
                         "red lights make generous budgets realistic)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1,
                    help="collection/training/eval repetitions (town+goals "
                         "stay fixed); adds the mean/min/max summary")
    ap.add_argument("--no-mirror", action="store_true")
    ap.add_argument("--no-balance", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import BranchedCILPolicy
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim.planner import (
        plan_to_goals, sample_goals,
    )
    from carla_imitation_learning_tpu.sim.town import mirror_town
    from carla_imitation_learning_tpu.training import closed_loop as cl
    from carla_imitation_learning_tpu.training.losses import cil_loss_fn
    from carla_imitation_learning_tpu.training.steps import (
        create_train_state, make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    # turn fans are the planner's graph; superblocks add straight-through +
    # right-turn geometry; 2 lanes/direction + scheduled lane changes put
    # commands 4/5 in the world
    town = make_town(blocks=3, n_buildings=24, n_lights=8,
                     lanes_per_direction=2,
                     superblocks=True, turn_fans=True, seed=args.seed)
    goals = sample_goals(town, args.seed, args.goals)
    town = plan_to_goals(town, goals)
    params = SimParams(n_agents=15, episode_len=args.episode_len,
                       lane_change_period=160)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")
    n_commands = 6
    model = BranchedCILPolicy(n_commands=n_commands, dtype=jnp.bfloat16)
    policy_from = model.as_policy_fn
    goal_ids = np.arange(args.collect_envs, dtype=np.int32) % args.goals
    worlds = [town] if args.no_mirror else [town, mirror_town(town)]
    per = args.collect_steps // len(worlds)
    balance = {} if args.no_balance else dict(
        balanced=True, balance_key="action_command")

    def trim(m):
        return {k: (None if v is None else round(float(v), 4))
                for k, v in m.items()}

    t0 = time.perf_counter()
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform, "runs": {}}
    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "route_quality.json")
    out.parent.mkdir(parents=True, exist_ok=True)

    def save():
        # incremental: a wedged tunnel mid-run must not lose finished tiers
        out.write_text(json.dumps(result, indent=2) + "\n")

    def run_seed(seed: int) -> dict:
        r: dict = {}
        result["runs"][str(seed)] = r
        rng = jax.random.PRNGKey(seed)

        def ev(policy_fn, tier_key):
            return trim(cl.evaluate_routes(
                params, town, rcfg, policy_fn,
                jax.random.PRNGKey(1000 * seed + tier_key),
                n_envs=args.envs, n_steps=args.steps))

        r["expert"] = ev(None, 100)
        print(f"[seed {seed}] expert: {r['expert']}", flush=True)
        save()

        rng, ki = jax.random.split(rng)
        tx = optax.adam(1e-3)
        ex = model.example_input(1, rcfg.height, rcfg.width)
        state = create_train_state(model, ki, ex, tx)
        r["untrained"] = ev(policy_from(state.params), 101)
        print(f"[seed {seed}] untrained: {r['untrained']}", flush=True)
        save()

        # --- goal-directed collection (normal + mirrored halves) -----------
        tc = time.perf_counter()
        stores = []
        for w in worlds:
            rng, kc = jax.random.split(rng)
            s, _, _ = cl.collect_dataset(params, w, rcfg, kc,
                                         args.collect_envs, per,
                                         goal_ids=goal_ids)
            stores.append(s)
        store = pipe.FrameStore.concat(stores)
        r["collect_seconds"] = round(time.perf_counter() - tc, 1)
        r["dataset_frames"] = len(store)
        hist = np.bincount(store.commands, minlength=n_commands)
        r["command_histogram"] = hist.tolist()
        r["command_min_frac"] = round(float(hist.min() / hist.sum()), 5)
        print(f"[seed {seed}] command histogram: {hist.tolist()}", flush=True)
        save()

        def fit(store, state, epochs, fit_seed):
            step = make_train_step(cil_loss_fn(), donate=False)
            ds = pipe.DeviceDataset(store, args.batch, shuffle=True,
                                    seed=fit_seed, cil=True, **balance)
            last, key = {}, jax.random.PRNGKey(fit_seed)
            for _ in range(epochs):
                for batch in ds:
                    key, sk = jax.random.split(key)
                    state, last = step(state, batch, sk)
            if last:
                jax.block_until_ready(last["loss"])
            return state, last

        tt = time.perf_counter()
        state, last = fit(store, state, args.epochs, 31 * seed + 7)
        if last:
            r["cil_final_loss"] = round(float(last["loss"]), 4)
            r["cil_final_accuracy"] = round(float(last["accuracy"]), 4)
        r["train_seconds"] = round(time.perf_counter() - tt, 1)
        save()

        r["cil"] = ev(policy_from(state.params), 102)
        print(f"[seed {seed}] cil: {r['cil']}", flush=True)
        save()

        # --- goal-directed DAgger rounds: policy drives to the goals, expert
        # labels, aggregate, retrain — the on-policy state-distribution fix --
        if args.dagger_epochs > 0 and args.dagger_rounds > 0:
            td = time.perf_counter()
            dag_stores = [store]
            for rnd in range(args.dagger_rounds):
                for w in worlds:
                    rng, kd = jax.random.split(rng)
                    s, _, _ = cl.dagger_iteration(
                        params, w, rcfg, policy_from(state.params), kd,
                        n_envs=args.collect_envs, n_steps=per,
                        goal_ids=goal_ids)
                    dag_stores.append(s)
                agg = pipe.FrameStore.concat(dag_stores)
                state, last = fit(agg, state, args.dagger_epochs,
                                  31 * seed + 13 + rnd)
            r["dagger_frames"] = sum(len(s) for s in dag_stores)
            if last:
                r["dagger_final_loss"] = round(float(last["loss"]), 4)
            r["dagger_seconds"] = round(time.perf_counter() - td, 1)
            r["dagger_cil"] = ev(policy_from(state.params), 103)
            print(f"[seed {seed}] dagger_cil: {r['dagger_cil']}", flush=True)
            save()
        return r

    seeds = [args.seed + i for i in range(max(1, args.seeds))]
    for seed in seeds:
        ts = time.perf_counter()
        run_seed(seed)
        result["runs"][str(seed)]["seed_seconds"] = round(
            time.perf_counter() - ts, 1)
        save()

    agg_keys = ("arrival_rate", "arrivals", "attempts", "crashes", "timeouts",
                "infractions_per_km", "mean_steps_to_arrival", "km_driven")
    tiers = [t for t in ("expert", "untrained", "cil", "dagger_cil")
             if all(t in result["runs"][str(s)] for s in seeds)]
    summary: dict = {}
    for t in tiers:
        summary[t] = {}
        for k in agg_keys:
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
    for t in tiers:
        result[t] = result["runs"][str(seeds[0])][t]
    result["command_histogram"] = result["runs"][str(seeds[0])].get(
        "command_histogram")
    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()

    def line(t):
        s = summary.get(t, {}).get("arrival_rate")
        return None if s is None else (
            s["mean"] if args.seeds > 1 else s["values"][0])

    best = "dagger_cil" if "dagger_cil" in summary else "cil"
    print(json.dumps({
        "metric": "route_arrival_rate_cil",
        "value": line(best),
        "unit": "arrivals/attempt (A->B)" + (
            f" (mean of {args.seeds} seeds)" if args.seeds > 1 else ""),
        "seeds": args.seeds,
        "expert": line("expert"),
        "untrained": line("untrained"),
        "bc_cil": line("cil"),
        "command_histogram": result["command_histogram"],
        "spread": {t: [summary[t]["arrival_rate"]["min"],
                       summary[t]["arrival_rate"]["max"]]
                   for t in tiers if "arrival_rate" in summary.get(t, {})},
    }))


if __name__ == "__main__":
    main()
