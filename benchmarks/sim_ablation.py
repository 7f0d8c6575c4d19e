"""Sim-step ablation: where do the 4.4 ms/fleet-step of pure sim go?

Round-2 measured the sim cost as 'diffuse'; this harness bisects it by
scanning stripped variants of the step (marginal protocol, 1024 envs):

- full            : autopilot + step_env(+pool) — the rollout's sim side
- const_control   : step_env with constant control (− autopilot)
- no_agents       : traffic agents frozen (− step_agents route math)
- no_nearest      : ego_s dead-reckoned (− the 13-candidate window search)
- no_reset        : no done/select/pool-pick (− auto-reset machinery)
- no_collision    : collision/offroad forced False (needs no_reset too)

Usage: python benchmarks/sim_ablation.py [--envs 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim import agents as agent_lib
    from carla_imitation_learning_tpu.sim import collision as col
    from carla_imitation_learning_tpu.sim import world as w
    from carla_imitation_learning_tpu.sim.dynamics import bicycle_step

    n_envs = args.envs
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    pool = w.make_spawn_pool(params, town, jax.random.PRNGKey(0x5EED), 1024)

    def custom_step(state, control, *, agents=True, nearest=True, reset=True,
                    collide=True):
        phases = agent_lib.light_phases(
            town, state.t.astype(jnp.float32) * params.dt,
            params.light_green, params.light_yellow, params.light_red)
        ego_pos, ego_yaw, ego_v, ego_steer = bicycle_step(
            state.ego_pos, state.ego_yaw, state.ego_v, state.ego_steer,
            jnp.clip(control.steer, -1, 1) * params.max_steer,
            jnp.clip(control.throttle, 0, 1), jnp.clip(control.brake, 0, 1),
            dt=params.dt, wheelbase=params.wheelbase,
            max_accel=params.max_accel, max_brake=params.max_brake,
            drag=params.drag, tire_stiffness=params.tire_stiffness)
        if agents:
            agents_route, agents_s, agents_v = agent_lib.step_agents(
                town, state.agents_route, state.agents_s, state.agents_v,
                phases, dt=params.dt, target_speed=params.agent_target_speed)
        else:
            agents_route, agents_s, agents_v = (
                state.agents_route, state.agents_s, state.agents_v)
        if collide:
            ap_, _ = agent_lib.agent_positions(town, agents_route, agents_s)
            hit = (col.any_vehicle_collision(ego_pos, ap_,
                                             params.collision_radius)
                   | col.any_building_collision(ego_pos, town.buildings,
                                                params.collision_radius))
            off = col.offroad(ego_pos, town.road_segments, town.road_half_width)
        else:
            hit = off = jnp.zeros((), bool)
        t_new = state.t + 1
        mid = state.replace(
            ego_pos=ego_pos, ego_yaw=ego_yaw, ego_v=ego_v, ego_steer=ego_steer,
            agents_route=agents_route, agents_s=agents_s, agents_v=agents_v,
            t=t_new)
        if nearest:
            mid = mid.replace(ego_s=w._nearest_s_update(town, mid))
        else:
            mid = mid.replace(ego_s=mid.ego_s + ego_v * params.dt)
        if reset:
            done = hit | off | (t_new >= params.episode_len)
            fresh = w.pick_fresh(pool, state)
            mid = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), fresh, mid)
        return mid

    def mk_scan(auto=True, **kw):
        def one(s):
            control = (w.autopilot_control(params, town, s) if auto else
                       w.VehicleControl(steer=jnp.zeros(()),
                                        throttle=jnp.ones(()),
                                        brake=jnp.zeros(())))
            return custom_step(s, control, **kw)

        vstep = jax.vmap(one)

        def body(s, _):
            s = vstep(s)
            return s, s.ego_v

        @functools.partial(jax.jit, static_argnames=("n",))
        def scan(s, n):
            return jax.lax.scan(body, s, None, length=n)

        return scan

    def marginal(scan, states):
        def run(states, n):
            t0 = time.perf_counter()
            states, v = scan(states, n)
            float(jnp.sum(v))
            return states, time.perf_counter() - t0

        states, _ = run(states, 16)
        states, _ = run(states, 96)
        deltas = []
        for _ in range(3):
            states, ts = run(states, 16)
            states, tb = run(states, 96)
            deltas.append((tb - ts) / 80)
        return float(np.median(deltas))

    states0 = jax.vmap(lambda k: w.reset_env(params, town, k))(
        jax.random.split(jax.random.PRNGKey(2), n_envs))

    variants = {
        "full": dict(auto=True),
        "const_control": dict(auto=False),
        "no_agents": dict(auto=True, agents=False),
        "no_nearest": dict(auto=True, nearest=False),
        "no_reset": dict(auto=True, reset=False),
        "no_collision": dict(auto=True, reset=False, collide=False),
    }
    out = {}
    for name, kw in variants.items():
        per = marginal(mk_scan(**kw), states0)
        out[name] = round(per * 1e3, 3)
        print(f"{name}: {per*1e3:.3f} ms/fleet-step", file=sys.stderr)
    print(json.dumps({"envs": n_envs, "ms": out}))


if __name__ == "__main__":
    main()
