"""A/B: single-program DAgger vs the host-mediated dagger experiment.

Matched compute (same rounds / envs / steps / train steps / batch / model),
end-to-end wall clock including compiles reported separately from the
steady re-run (the persistent compile cache makes re-runs the deployment
case). The point being measured: on a tunneled TPU every host round-trip
costs ~5-50 ms and the host-mediated loop pays ~rounds×(epochs×batches+2)
of them plus H2D re-uploads of the growing aggregate; the single-program
path pays exactly ONE dispatch for the whole algorithm.

Usage: python benchmarks/dagger_online_bench.py [--rounds 3] [--envs 64]
         [--steps 300] [--train-steps 400] [--batch 128]
Writes reports/dagger_online.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--train-steps", type=int, default=400,
                    help="train steps per round (the host path converts this "
                         "to an equivalent epochs count over the aggregate)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl
    from carla_imitation_learning_tpu.training.losses import bc_loss_fn
    from carla_imitation_learning_tpu.training.online_dagger import (
        make_online_dagger,
    )
    from carla_imitation_learning_tpu.training.steps import (
        create_train_state, make_train_step,
    )
    import optax

    on_tpu = jax.devices()[0].platform != "cpu"
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")
    model = PolicyCNN(dtype=jnp.bfloat16)

    def fresh_state():
        return create_train_state(
            model, jax.random.PRNGKey(args.seed),
            jnp.zeros((1, rcfg.height, rcfg.width, 4)), optax.adam(1e-3))

    result = {"config": vars(args), "platform": jax.devices()[0].platform}
    out = Path(__file__).resolve().parents[1] / "reports" / "dagger_online.json"
    out.parent.mkdir(exist_ok=True)

    def save():
        out.write_text(json.dumps(result, indent=2))

    # --- single-program path (cold incl. compile, then warm re-run) -------
    run = make_online_dagger(model.apply, params, town, rcfg,
                             n_envs=args.envs, n_steps=args.steps,
                             rounds=args.rounds, train_steps=args.train_steps,
                             batch=args.batch)
    t0 = time.perf_counter()
    st, m = run(fresh_state(), jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    _ = float(m["loss"][-1])  # device_get: undeniable completion
    result["online_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    st, m = run(fresh_state(), jax.random.PRNGKey(2))
    _ = float(m["loss"][-1])
    result["online_warm_s"] = round(time.perf_counter() - t0, 2)
    result["online_loss_per_round"] = [round(float(x), 4) for x in m["loss"]]
    result["online_agreement"] = [round(float(x), 4) for x in m["agreement"]]
    save()
    print(f"online: cold {result['online_cold_s']}s "
          f"warm {result['online_warm_s']}s", flush=True)

    # --- host-mediated path (same compute budget) --------------------------
    def host_dagger(seed: int) -> float:
        rng = jax.random.PRNGKey(seed)
        state = fresh_state()
        step = make_train_step(bc_loss_fn, donate=False)
        stores = []
        t0 = time.perf_counter()
        for rnd in range(args.rounds):
            rng, k = jax.random.split(rng)
            if rnd == 0:
                store, _, _ = cl.collect_dataset(params, town, rcfg, k,
                                                 args.envs, args.steps)
            else:
                p = state.params

                def policy_fn(obs):
                    return jnp.argmax(model.apply({"params": p}, obs), axis=-1)

                store, _, _ = cl.dagger_iteration(params, town, rcfg,
                                                  policy_fn, k,
                                                  args.envs, args.steps)
            stores.append(store)
            agg = pipe.FrameStore.concat(stores)
            ds = pipe.DeviceDataset(agg, args.batch, shuffle=True, seed=rnd)
            done_steps, last = 0, None
            while done_steps < args.train_steps:
                for batch in ds:
                    rng, sk = jax.random.split(rng)
                    state, last = step(state, batch, sk)
                    done_steps += 1
                    if done_steps >= args.train_steps:
                        break
            _ = float(last["loss"])
        return time.perf_counter() - t0

    result["host_cold_s"] = round(host_dagger(1), 2)
    result["host_warm_s"] = round(host_dagger(2), 2)
    save()
    print(f"host: cold {result['host_cold_s']}s "
          f"warm {result['host_warm_s']}s", flush=True)

    result["speedup_warm"] = round(
        result["host_warm_s"] / max(result["online_warm_s"], 1e-9), 2)
    save()
    print(json.dumps({
        "metric": "dagger_online_speedup_warm",
        "value": result["speedup_warm"],
        "unit": "x vs host-mediated dagger (matched compute)",
        "online_warm_s": result["online_warm_s"],
        "host_warm_s": result["host_warm_s"],
    }))


if __name__ == "__main__":
    main()
