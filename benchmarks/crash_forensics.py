"""Expert crash forensics on the A→B towns (VERDICT r4 item 4 diagnosis).

The privileged expert still fails ~half its A→B attempts after the round-5
junction tie-break (route_quality seed-0: 52 crashes / 101 attempts). This
probe re-runs the expert on the EXACT route_quality world (multilane,
superblocks, turn fans, 15 agents, scheduled ego lane changes) with a
sim-only scan (no rendering) and classifies every collision event by
mechanism, so the fix targets the dominant mode instead of a guess:

- building / offroad        : tracking failure (pure pursuit left the road)
- veh:lane_teleport         : the colliding AGENT changed lanes this step —
                              agents transfer loops as an instantaneous
                              ~3.5 m lateral jump, and their lane-change
                              occupancy test (sim/agents.py `near`) checks
                              only OTHER AGENTS, never the ego: an agent can
                              legally teleport into the ego's flank.
- veh:rear_end              : culprit behind the ego (agent hit us from
                              behind — agents' ego-corridor check failed)
- veh:frontal               : culprit ahead in the ego's corridor (our
                              headway envelope failed)
- veh:side                  : lateral conflict (junction cross / merge)
  each veh mode cross-tabbed with in_junction and the ego's nav command.

Usage: python benchmarks/crash_forensics.py [--envs 32] [--steps 2000]
Prints per-mode counts and one JSON line; writes reports/crash_forensics.json
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
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--goals", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--episode-len", type=int, default=2500)
    ap.add_argument("--out", default=None)
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
    from carla_imitation_learning_tpu.sim.planner import (
        plan_to_goals, sample_goals,
    )

    # the exact route_quality world (benchmarks/route_quality.py)
    town = make_town(blocks=3, n_buildings=24, n_lights=8,
                     lanes_per_direction=2, superblocks=True, turn_fans=True,
                     seed=args.seed)
    goals = sample_goals(town, args.seed, args.goals)
    town = plan_to_goals(town, goals)
    params = SimParams(n_agents=15, episode_len=args.episode_len,
                       lane_change_period=160)

    def one(state):
        """step_env + classification features for the same transition —
        the duplicated calls (autopilot, bicycle, step_agents) are identical
        subgraphs XLA CSEs with step_env's own, so the features match the
        collision step_env reports."""
        ctrl = w.autopilot_control(params, town, state)
        phases = agent_lib.light_phases(
            town, state.t.astype(jnp.float32) * params.dt,
            params.light_green, params.light_yellow, params.light_red)
        ego_pos, ego_yaw, _, _ = bicycle_step(
            state.ego_pos, state.ego_yaw, state.ego_v, state.ego_steer,
            jnp.clip(ctrl.steer, -1, 1) * params.max_steer,
            jnp.clip(ctrl.throttle, 0, 1), jnp.clip(ctrl.brake, 0, 1),
            dt=params.dt, wheelbase=params.wheelbase,
            max_accel=params.max_accel, max_brake=params.max_brake,
            drag=params.drag, tire_stiffness=params.tire_stiffness)
        routes_post, s_post, _ = agent_lib.step_agents(
            town, state.agents_route, state.agents_s, state.agents_v, phases,
            dt=params.dt, target_speed=params.agent_target_speed,
            ego_pos=state.ego_pos)
        ap_, ay_ = agent_lib.agent_positions(town, routes_post, s_post)
        hl, vr = params.vehicle_half_len, params.vehicle_radius
        he = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
        ha = jnp.stack([jnp.cos(ay_), jnp.sin(ay_)], axis=-1)
        d = col.segment_segment_distance(
            ego_pos - hl * he, ego_pos + hl * he,
            ap_ - hl * ha, ap_ + hl * ha)           # (A,)
        culprit = jnp.argmin(d)
        left = jnp.stack([-he[1], he[0]])
        rel = ap_[culprit] - ego_pos
        d_junc = jnp.min(jnp.linalg.norm(town.junctions - ego_pos, axis=-1))
        junction_r = jnp.maximum(6.0, town.road_half_width * 1.8)
        new_state, info = w.step_env(params, town, state, ctrl)
        feats = {
            "hit_v": d[culprit] < 2.0 * vr,
            "culprit_fwd": rel @ he, "culprit_lat": rel @ left,
            "culprit_changed": routes_post[culprit] != state.agents_route[
                culprit],
            "in_junction": d_junc < junction_r + 2.0,
            "cmd": w.navigation_command(params, town, state),
            "ego_v": state.ego_v,
        }
        keep = {k: info[k] for k in ("collision", "offroad", "done",
                                     "arrived", "timeout")}
        return new_state, {**feats, **keep}

    vstep = jax.vmap(one)

    def body(s, _):
        s, out = vstep(s)
        return s, out

    @functools.partial(jax.jit, static_argnames=("n",))
    def scan(s, n):
        return jax.lax.scan(body, s, None, length=n)

    keys = jax.random.split(jax.random.PRNGKey(args.seed + 7), args.envs)
    states = jax.vmap(lambda k: w.reset_env(params, town, k))(keys)
    states = states.replace(goal=jnp.arange(args.envs, dtype=jnp.int32)
                            % args.goals)

    t0 = time.perf_counter()
    _, tr = scan(states, args.steps)
    tr = {k: np.asarray(v) for k, v in tr.items()}  # (T, B)
    wall = time.perf_counter() - t0

    coll = tr["collision"]
    n_events = int(coll.sum())
    modes = {"building": 0, "veh_lane_teleport": 0,
             "veh_rear_end": 0, "veh_frontal": 0, "veh_side": 0,
             "veh_other": 0}
    junction_ct: dict = {}
    cmd_ct: dict = {}
    ev_speed = []
    t_idx, b_idx = np.nonzero(coll)
    for t, b in zip(t_idx, b_idx):
        in_j = bool(tr["in_junction"][t, b])
        cmd = int(tr["cmd"][t, b])
        ev_speed.append(float(tr["ego_v"][t, b]))
        if tr["hit_v"][t, b]:
            fwd, lat = float(tr["culprit_fwd"][t, b]), float(
                tr["culprit_lat"][t, b])
            if tr["culprit_changed"][t, b]:
                mode = "veh_lane_teleport"
            elif fwd < -0.5:
                mode = "veh_rear_end"
            elif fwd > 0.5 and abs(lat) < 2.0:
                mode = "veh_frontal"
            elif abs(lat) >= 2.0 or abs(fwd) <= 0.5:
                mode = "veh_side"
            else:
                mode = "veh_other"
        else:
            # collision without a vehicle capsule hit: building (peds off)
            mode = "building"
        modes[mode] += 1
        junction_ct[mode] = junction_ct.get(mode, 0) + int(in_j)
        cmd_ct.setdefault(mode, {}).setdefault(cmd, 0)
        cmd_ct[mode][cmd] += 1

    offroad_ep = int((tr["offroad"] & ~coll).sum())
    km = float(tr["ego_v"].sum() * params.dt / 1e3)
    out = {
        "envs": args.envs, "steps": args.steps, "km": round(km, 2),
        "collision_events": n_events,
        "offroad_only_events": offroad_ep,
        "collisions_per_km": round(n_events / km, 3) if km else None,
        "modes": modes,
        "in_junction_by_mode": junction_ct,
        "cmd_by_mode": cmd_ct,
        "mean_ego_speed_at_impact": (round(float(np.mean(ev_speed)), 2)
                                     if ev_speed else None),
        "arrivals": int(tr["arrived"].sum()),
        "wall_seconds": round(wall, 1),
    }
    for k, v in out.items():
        print(f"{k}: {v}", file=sys.stderr)
    line = json.dumps(out)
    path = Path(args.out) if args.out else (
        Path(__file__).resolve().parents[1] / "reports"
        / "crash_forensics.json")
    path.write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
