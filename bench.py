"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Flagship metric (BASELINE.json north star): closed-loop env-steps/sec — 1024
vectorized envs, on-device sim + Pallas-rendered 128×128 camera + policy
forward, zero host round-trips per step. Baseline = the 50,000 steps/sec
v5p-8 target (we report the measured-chip ratio against it).

MEASUREMENT PROTOCOL (round 2): on the tunneled axon platform,
``jax.block_until_ready`` is NOT a reliable completion barrier (it can return
at enqueue-ack) and the runtime memoizes same-content calls. Every number
here is therefore a MARGINAL cost: the same program is run at two in-program
step counts with device_get-fetched results (undeniable completion) and
evolving state between calls (memoization-proof); rate = Δsteps / Δwall.
Round-1's BC images/sec were measured with block_until_ready and are
inflated ~15×; PERFORMANCE.md records the correction.

Secondary metrics (BC images/sec) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x) -> float:
    """Undeniable completion barrier: reduce on device, copy to host."""
    return float(jnp.sum(x))


def assert_kernel_parity(n_seeds: int = 3) -> None:
    """Compiled-Pallas correctness gate (runs on the real chip, not interpret):
    the exact kernel must match the pure-XLA reference pixel-exact, and the
    fast rollout kernel must match the exact luma output within its documented
    quantization tolerance. Timing below is meaningless if this fails.
    ``n_seeds=1`` covers the compile path at a third of the cost (the TPU-gated
    test uses it; compiles dominate over the tunnel, extra seeds re-run the
    same compiled programs)."""
    from carla_imitation_learning_tpu.ops.raster import (
        rasterize_pallas, rasterize_pallas_luma,
    )
    from carla_imitation_learning_tpu.ops.raster_fast import rasterize_luma_fast
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.render.camera import (
        camera_from_ego, project_triangles,
    )
    from carla_imitation_learning_tpu.render.jax_raster import rasterize_jax
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim import agents as agent_lib
    from carla_imitation_learning_tpu.sim.world import reset_env

    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    static = geo.build_static_scene(town)
    H = W = 128
    worst_exact, worst_fast = 0.0, 0.0
    for seed in range(n_seeds):
        st = reset_env(params, town, jax.random.PRNGKey(seed))
        phases = agent_lib.light_phases(
            town, st.t.astype(jnp.float32) * params.dt,
            params.light_green, params.light_yellow, params.light_red)
        ap, ay = agent_lib.agent_positions(town, st.agents_route, st.agents_s)
        tris, colors, classes = geo.assemble_scene(
            static, town.lights_pos, phases, ap, ay, 512)
        cam = camera_from_ego(st.ego_pos, st.ego_yaw)
        setup = project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5)
        rgb_p, sem_p, _ = rasterize_pallas(setup, H, W)
        rgb_j, sem_j, _ = rasterize_jax(setup, H, W)
        d = float(jnp.abs(rgb_p - rgb_j).max())
        worst_exact = max(worst_exact, d)
        assert d < 1e-5, f"compiled Pallas vs XLA reference diverged: {d}"
        assert bool((sem_p == sem_j).all()), "semantic plane diverged"
        g_exact, _, _ = rasterize_pallas_luma(setup, H, W)
        g_fast = rasterize_luma_fast(setup, H, W)
        df = jnp.abs(g_exact - g_fast)
        frac = float((df > 2 / 255).mean())
        worst_fast = max(worst_fast, frac)
        assert frac < 0.01, f"fast rollout kernel off on {frac:.2%} of pixels"
    log(f"kernel parity: compiled exact max|d|={worst_exact:.2e} (pixel-exact), "
        f"fast kernel worst frac>2/255={worst_fast:.5f}")


def bench_closed_loop(n_envs: int = 1024) -> float:
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

    def run(carry, n):
        t0 = time.perf_counter()
        carry, traj = rollout_fn(carry, n)
        fetch(traj["speed"])
        return carry, time.perf_counter() - t0

    t0 = time.perf_counter()
    carry, _ = run(carry, 16)   # compile both lengths
    carry, _ = run(carry, 96)
    log(f"closed-loop compile+warmup: {time.perf_counter() - t0:.1f}s")

    deltas = []
    for _ in range(3):
        carry, t16 = run(carry, 16)
        carry, t96 = run(carry, 96)
        deltas.append((t96 - t16) / 80)
    per = float(np.median(deltas))
    rate = n_envs / per
    log(f"closed-loop: {rate:,.0f} env-steps/sec marginal ({per*1e3:.2f} ms/step, "
        f"{n_envs} envs, rendered {rcfg.height}x{rcfg.width}, policy-in-loop)")
    return rate


def _bc_fixture(batch: int, hw: int, dtype: str = "float32", s2d: bool = False):
    from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.training import (
        bc_loss_fn, create_train_state, make_optimizer,
    )

    store = FrameStore.synthetic(n=max(2 * batch, 512), height=hw, width=hw, seed=0)
    ds = DeviceDataset(store, batch_size=batch, frame_skip=4, shuffle=True,
                       dtype=dtype)
    model = PolicyCNN(s2d_stem=s2d)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer({"LEARNING_RATE": 1e-3, "gradient_clip_val": 0.5}, 1)
    state = create_train_state(model, rng, model.example_input(1, hw, hw), tx)
    return ds, state, rng, bc_loss_fn


def bench_bc_images(batch: int = 256, hw: int = 256, s2d: bool = False) -> float:
    """Step-path throughput: distinct pre-materialized device batches chained
    through donated state; marginal over two chain lengths with a scalar
    host fetch at the end of each chain. ``s2d`` benches the space-to-depth
    stem variant (function-preserving; PERFORMANCE.md A/B)."""
    from carla_imitation_learning_tpu.training import make_train_step

    ds, state, rng, loss_fn = _bc_fixture(batch, hw, dtype="bfloat16", s2d=s2d)
    step = make_train_step(loss_fn)
    batches = [ds.make_batch(np.random.default_rng(i).integers(0, ds.n_samples, batch))
               for i in range(16)]
    jax.block_until_ready(batches[-1][0])

    def chain(state, n):
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batches[i % 16], rng)
        fetch(m["loss"])
        return state, time.perf_counter() - t0

    state, _ = chain(state, 4)  # compile + warm
    deltas = []
    for _ in range(3):
        state, t_small = chain(state, 8)
        state, t_big = chain(state, 40)
        deltas.append((t_big - t_small) / 32)
    per = float(np.median(deltas))
    rate = batch / per
    log(f"BC training (step path{', s2d stem' if s2d else ''}): {rate:,.0f} "
        f"images/sec marginal ({per*1e3:.2f} ms/step, batch {batch}, "
        f"{hw}x{hw}x4, bf16)")
    return rate


def bench_bc_fused(batch: int = 256, hw: int = 256) -> float:
    """The REAL input path: fused epoch where the frame-window gather +
    normalize runs in-step from index rows (training/steps.py make_fused_epoch
    + DeviceDataset.make_batch); marginal over two epoch lengths."""
    from carla_imitation_learning_tpu.training import make_fused_epoch

    ds, state, rng, loss_fn = _bc_fixture(batch, hw, dtype="bfloat16")
    epoch = make_fused_epoch(loss_fn, ds.pure_batch, donate=False)

    def orders(nb, seed):
        return jnp.asarray(np.random.default_rng(seed).integers(
            0, ds.n_samples, (nb, batch)), jnp.int32)

    def run(state, rng, nb, seed):
        t0 = time.perf_counter()
        state, rng, m = epoch(state, orders(nb, seed), rng)
        fetch(m["loss"])
        return state, rng, time.perf_counter() - t0

    state, rng, _ = run(state, rng, 8, 0)    # compile both lengths
    state, rng, _ = run(state, rng, 32, 1)
    deltas = []
    for i in range(3):
        state, rng, t_small = run(state, rng, 8, 2 + i)
        state, rng, t_big = run(state, rng, 32, 10 + i)
        deltas.append((t_big - t_small) / 24)
    per = float(np.median(deltas))
    rate = batch / per
    log(f"BC training (fused epoch, in-step gather): {rate:,.0f} images/sec "
        f"marginal ({per*1e3:.2f} ms/step, batch {batch}, {hw}x{hw}x4, bf16)")
    return rate


def wait_for_device(max_wait_s: float = 2400.0) -> bool:
    """The tunneled platform can wedge for tens of minutes after an OOM
    elsewhere (probes hang rather than erroring). Probe with short-lived
    subprocesses — safe to kill, unlike this process's own backend init —
    and wait out the wedge so an unlucky bench launch still measures."""
    import subprocess

    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.numpy.arange(4.0).sum().item(); print('ok')"],
                timeout=120, capture_output=True)
            if r.returncode == 0 and b"ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            return False
        log("device probe failed (tunnel wedged?) — retrying in 60s")
        time.sleep(60)


def main() -> None:
    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    if not wait_for_device():
        log("FATAL: no device answered within the wait budget; "
            "refusing to hang — re-run when the tunnel recovers")
        sys.exit(1)
    setup_jax()
    log(f"devices: {jax.devices()}")
    if jax.devices()[0].platform != "cpu":
        assert_kernel_parity()
    bench_bc_images()
    bench_bc_fused()
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
