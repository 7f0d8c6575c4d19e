"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Flagship metric (BASELINE.json north star): closed-loop env-steps/sec — 1024
vectorized envs, on-device sim + Pallas-rendered 128×128 camera + policy
forward, zero host round-trips per step. Baseline = the 50,000 steps/sec
v5p-8 target (we report the measured-chip ratio against it).

Secondary metrics (BC images/sec, render-only rate) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_closed_loop(n_envs: int = 1024, n_steps: int = 50) -> float:
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    backend = "pallas" if jax.devices()[0].platform != "cpu" else "jax"
    rcfg = RenderConfig(height=128, width=128, max_triangles=512, backend=backend)

    model = PolicyCNN()
    mparams = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4)))["params"]

    def policy_fn(obs):
        return jnp.argmax(model.apply({"params": mparams}, obs), axis=-1)

    init_fn, rollout_fn = make_rollout(params, town, rcfg, policy_fn)
    carry = init_fn(jax.random.PRNGKey(1), n_envs)
    t0 = time.perf_counter()
    carry, traj = rollout_fn(carry, n_steps)
    jax.block_until_ready(traj["speed"])
    log(f"closed-loop compile+warmup: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    carry, traj = rollout_fn(carry, n_steps)
    jax.block_until_ready(traj["speed"])
    dt = time.perf_counter() - t0
    rate = n_envs * n_steps / dt
    log(f"closed-loop: {rate:,.0f} env-steps/sec "
        f"({n_envs} envs, rendered {rcfg.height}x{rcfg.width}, policy-in-loop)")
    return rate


def bench_bc_images(batch: int = 256, hw: int = 256, iters: int = 20) -> float:
    from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.training import (
        bc_loss_fn, create_train_state, make_optimizer, make_train_step,
    )

    store = FrameStore.synthetic(n=max(2 * batch, 512), height=hw, width=hw, seed=0)
    ds = DeviceDataset(store, batch_size=batch, frame_skip=4, shuffle=True)
    model = PolicyCNN()
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer({"LEARNING_RATE": 1e-3, "gradient_clip_val": 0.5}, 1)
    state = create_train_state(model, rng, model.example_input(1, hw, hw), tx)
    step = make_train_step(bc_loss_fn)

    # distinct batches each step (index vectors differ → real gathers + convs)
    import numpy as np

    batches = [
        ds.make_batch(np.random.default_rng(i).integers(0, ds.n_samples, batch))
        for i in range(4)
    ]
    state, m = step(state, batches[0], rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batches[i % 4], rng)
    jax.block_until_ready(m["loss"])
    rate = batch * iters / (time.perf_counter() - t0)
    log(f"BC training: {rate:,.0f} images/sec (batch {batch}, {hw}x{hw}x4, bf16)")
    return rate


def main() -> None:
    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    log(f"devices: {jax.devices()}")
    bc_rate = bench_bc_images()
    rate = bench_closed_loop()
    baseline = 50_000.0  # BASELINE.json north-star target (v5p-8)
    print(json.dumps({
        "metric": "closed_loop_env_steps_per_sec_rendered_1024envs",
        "value": round(rate, 1),
        "unit": "env-steps/sec",
        "vs_baseline": round(rate / baseline, 4),
    }))


if __name__ == "__main__":
    main()
