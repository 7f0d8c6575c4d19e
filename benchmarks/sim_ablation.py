"""Sim-step ablation: where do the ms/fleet-step of pure sim go?

Round-2 measured the sim cost as 'diffuse'; this harness bisects it by
scanning stripped variants of the step (marginal protocol, 1024 envs):

- full            : autopilot (incl. safety envelope) + step_env(+pool)
- no_envelope     : headway/yield envelope off (− the r4 corridor/yield
                    math inside autopilot_control — the marginal cost of
                    the expert safety envelope, VERDICT r4 #6)
- circle_collision: legacy disc collision model (− the r4 oriented-capsule
                    Ericson segment-segment math)
- const_control   : step with constant control (− autopilot entirely)
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import dataclasses

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

    def custom_step(state, control, *, p=params, agents=True, nearest=True,
                    reset=True, collide=True):
        phases = agent_lib.light_phases(
            town, state.t.astype(jnp.float32) * p.dt,
            p.light_green, p.light_yellow, p.light_red)
        ego_pos, ego_yaw, ego_v, ego_steer = bicycle_step(
            state.ego_pos, state.ego_yaw, state.ego_v, state.ego_steer,
            jnp.clip(control.steer, -1, 1) * p.max_steer,
            jnp.clip(control.throttle, 0, 1), jnp.clip(control.brake, 0, 1),
            dt=p.dt, wheelbase=p.wheelbase,
            max_accel=p.max_accel, max_brake=p.max_brake,
            drag=p.drag, tire_stiffness=p.tire_stiffness)
        if agents:
            agents_route, agents_s, agents_v = agent_lib.step_agents(
                town, state.agents_route, state.agents_s, state.agents_v,
                phases, dt=p.dt, target_speed=p.agent_target_speed)
        else:
            agents_route, agents_s, agents_v = (
                state.agents_route, state.agents_s, state.agents_v)
        if collide:
            ap_, ay_ = agent_lib.agent_positions(town, agents_route, agents_s)
            if p.collision_model == "capsule":
                hit = (col.capsule_vehicle_collision(
                           ego_pos, ego_yaw, ap_, ay_,
                           p.vehicle_half_len, p.vehicle_radius)
                       | col.capsule_building_collision(
                           ego_pos, ego_yaw, p.vehicle_half_len,
                           p.vehicle_radius, town.buildings))
            else:
                hit = (col.any_vehicle_collision(ego_pos, ap_,
                                                 p.collision_radius)
                       | col.any_building_collision(ego_pos, town.buildings,
                                                    p.collision_radius))
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
            mid = mid.replace(ego_s=mid.ego_s + ego_v * p.dt)
        if reset:
            done = hit | off | (t_new >= p.episode_len)
            fresh = w.pick_fresh(pool, state)
            mid = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), fresh, mid)
        return mid

    def mk_scan(auto=True, p=params, **kw):
        def one(s):
            control = (w.autopilot_control(p, town, s) if auto else
                       w.VehicleControl(steer=jnp.zeros(()),
                                        throttle=jnp.ones(()),
                                        brake=jnp.zeros(())))
            return custom_step(s, control, p=p, **kw)

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

        t0 = time.perf_counter()
        states, _ = run(states, 16)
        states, _ = run(states, 96)
        compile_s = time.perf_counter() - t0
        deltas = []
        for _ in range(3):
            states, ts = run(states, 16)
            states, tb = run(states, 96)
            deltas.append((tb - ts) / 80)
        return float(np.median(deltas)), compile_s

    states0 = jax.vmap(lambda k: w.reset_env(params, town, k))(
        jax.random.split(jax.random.PRNGKey(2), n_envs))

    no_env = dataclasses.replace(params, headway_gap=0.0, yield_gap=0.0)
    circle = dataclasses.replace(params, collision_model="circle")
    variants = {
        "full": dict(auto=True),
        "no_envelope": dict(auto=True, p=no_env),
        "circle_collision": dict(auto=True, p=circle),
        "const_control": dict(auto=False),
        "no_agents": dict(auto=True, agents=False),
        "no_nearest": dict(auto=True, nearest=False),
        "no_reset": dict(auto=True, reset=False),
        "no_collision": dict(auto=True, reset=False, collide=False),
    }
    out, compiles = {}, {}
    for name, kw in variants.items():
        per, compile_s = marginal(mk_scan(**kw), states0)
        out[name] = round(per * 1e3, 3)
        compiles[name] = round(compile_s, 1)
        print(f"{name}: {per*1e3:.3f} ms/fleet-step "
              f"(compile+warm {compile_s:.1f}s)", file=sys.stderr)
    line = json.dumps({"envs": n_envs, "ms": out, "compile_s": compiles})
    if args.out:
        Path(args.out).write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
