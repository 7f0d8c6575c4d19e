"""Closed-loop component breakdown on the real chip (verdict item 7 prep).

Marginal-cost protocol (PERFORMANCE.md): every number is Δwall/Δsteps between
two in-program scan lengths with a device_get'd reduction at the end and
evolving state between calls. Components measured as scans:

- full        : sim + render + framebuf + policy (the bench program)
- expert      : sim + render + framebuf, expert drives (− policy forward)
- sim_only    : sim step + autopilot + spawn-pool pick, constant obs
- lists_only  : evolving camera → project + pack + tile_lists_fast (no kernel)
- render_only : evolving camera → full fast render (lists + pallas kernel)

Usage: python benchmarks/rollout_breakdown.py [--envs 1024] [--rich]
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
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--rich", action="store_true",
                    help="rich-scene config (facade bands, shadows, 1024 tris)")
    ap.add_argument("--lod", type=float, default=-1.0,
                    help="-1 = auto (rollout default 2px), 0 = off")
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import functools

    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.ops.raster_fast import (
        fuse_prims, pack_setup_prims, rasterize_luma_fast, tile_lists_fast,
    )
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.render.camera import (
        camera_from_ego, project_triangles,
    )
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim import agents as agent_lib
    from carla_imitation_learning_tpu.sim.world import (
        autopilot_control, make_spawn_pool, pick_fresh, reset_env, step_env,
    )
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    n_envs = args.envs
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    rcfg = RenderConfig(
        height=128, width=128, backend="pallas", fast=True, rgb=False,
        max_triangles=1024 if args.rich else 512,
        facade_bands=3 if args.rich else 0, shadows=args.rich,
        lod_px=args.lod)
    H, W, T = rcfg.height, rcfg.width, rcfg.max_triangles

    def marginal(run, carry, n_small=16, n_big=96, reps=3):
        carry, _ = run(carry, n_small)
        carry, _ = run(carry, n_big)
        deltas = []
        for _ in range(reps):
            carry, t_s = run(carry, n_small)
            carry, t_b = run(carry, n_big)
            deltas.append((t_b - t_s) / (n_big - n_small))
        return carry, float(np.median(deltas))

    results = {}

    # --- full + expert rollouts ------------------------------------------
    model = PolicyCNN()
    mp_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 4)))["params"]

    def policy_fn(obs):
        return jnp.argmax(model.apply({"params": mp_}, obs), axis=-1)

    for name, pf in (("full", policy_fn), ("expert", None)):
        init_fn, rollout_fn = make_rollout(params, town, rcfg, pf)
        carry = init_fn(jax.random.PRNGKey(1), n_envs)

        def run(carry, n, _rf=rollout_fn):
            t0 = time.perf_counter()
            carry, traj = _rf(carry, n)
            float(jnp.sum(traj["speed"]))
            return carry, time.perf_counter() - t0

        _, per = marginal(run, carry)
        results[name] = per

    # --- sim-only scan ----------------------------------------------------
    pool = make_spawn_pool(params, town, jax.random.PRNGKey(0x5EED), 1024)
    states = jax.vmap(lambda k: reset_env(params, town, k))(
        jax.random.split(jax.random.PRNGKey(2), n_envs))

    def sim_step(states, _):
        control = jax.vmap(lambda s: autopilot_control(params, town, s))(states)
        fresh = jax.vmap(lambda s: pick_fresh(pool, s))(states)
        new_states, info = jax.vmap(
            lambda s, c, f: step_env(params, town, s, c, f))(states, control, fresh)
        return new_states, info["speed"]

    @functools.partial(jax.jit, static_argnames=("n",))
    def sim_scan(states, n):
        return jax.lax.scan(sim_step, states, None, length=n)

    def run_sim(states, n):
        t0 = time.perf_counter()
        states, speeds = sim_scan(states, n)
        float(jnp.sum(speeds))
        return states, time.perf_counter() - t0

    _, results["sim_only"] = marginal(run_sim, states)

    # --- render-side scans over an evolving camera ------------------------
    static = geo.build_static_scene(town, facade_bands=rcfg.facade_bands)
    st0 = states  # evolving poses come from advancing arclength along routes

    def scene_setup(s, dt_s):
        from carla_imitation_learning_tpu.sim.town import route_point

        s_adv = s.replace(ego_s=s.ego_s + dt_s)
        pos, yaw = route_point(town, s_adv.ego_route, s_adv.ego_s)
        phases = agent_lib.light_phases(
            town, s.t.astype(jnp.float32) * params.dt,
            params.light_green, params.light_yellow, params.light_red)
        ap, ay = agent_lib.agent_positions(town, s.agents_route, s.agents_s)
        tris, colors, classes = geo.assemble_scene(
            static, town.lights_pos, phases, ap, ay, T,
            shadows=rcfg.shadows)
        cullable = ((classes == geo.SEM_BUILDING)
                    | (classes == geo.SEM_VEHICLE))
        cam = camera_from_ego(pos, yaw)
        return s_adv, project_triangles(tris, colors, classes, cam, W, H,
                                        90.0, 0.5, cullable=cullable)

    def mk_scan(do_kernel: bool):
        def one_env(s, acc):
            s, setup = scene_setup(s, 0.4)
            if do_kernel:
                g = rasterize_luma_fast(setup, H, W, lod_px=rcfg.lod_px)
                acc = acc + jnp.sum(g)
            else:
                # mirror the kernel's real front-end: quad fusion + prim table
                prims = fuse_prims(setup)
                tris = pack_setup_prims(prims)
                _idx, count = tile_lists_fast(prims, H, T, width=W,
                                              lod_px=max(rcfg.lod_px, 0.0))
                acc = acc + jnp.sum(tris[0]) + jnp.sum(count).astype(jnp.float32)
            return s, acc

        vbody = jax.vmap(one_env)

        def body(carry, _):
            return vbody(*carry), None

        @functools.partial(jax.jit, static_argnames=("n",))
        def scan(carry, n):
            return jax.lax.scan(body, carry, None, length=n)[0]

        return scan

    for name, do_kernel in (("lists_only", False), ("render_only", True)):
        scan = mk_scan(do_kernel)

        def run_r(carry, n, _scan=scan):
            t0 = time.perf_counter()
            carry = _scan(carry, n)
            float(jnp.sum(carry[1]))  # undeniable completion
            return carry, time.perf_counter() - t0

        carry = (st0, jnp.zeros((n_envs,)))
        _, results[name] = marginal(run_r, carry)

    out = {
        "envs": n_envs, "rich": bool(args.rich), "lod_px": args.lod,
        "ms_per_fleet_step": {k: round(v * 1e3, 2) for k, v in results.items()},
        "env_steps_per_sec_full": round(n_envs / results["full"], 1),
        "derived_ms": {
            "policy_fwd": round((results["full"] - results["expert"]) * 1e3, 2),
            "raster_kernel": round(
                (results["render_only"] - results["lists_only"]) * 1e3, 2),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
