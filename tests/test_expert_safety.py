"""Expert (autopilot) safety envelope: lead-vehicle headway braking,
first-come junction yield, slow-for-turn cruise cap, and the traffic agents'
ego-awareness — the behaviors that make the label source a safe driver
(CARLA's autopilot keeps headway / yields; the reference's training logs,
imitation_dataset.py:96-110, were produced by such a driver)."""

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.sim import (
    SimParams, autopilot_control, make_town, reset_env,
)
from carla_imitation_learning_tpu.sim.agents import (
    GREEN, agent_positions, step_agents,
)
from carla_imitation_learning_tpu.sim.town import route_point

# pin every traffic light green: cycle = green only, so mod(t+offset, cycle)
# always lands in the green window and red_light_ahead never fires
_GREEN = dict(light_green=1e6, light_yellow=0.0, light_red=0.0)


def _cruising_state(town, params, agents_route, agents_s, ego_s=20.0,
                    ego_route=0, ego_v=6.0):
    """A hand-built world state: ego mid-edge on route 0 at speed, scripted
    agents wherever the scenario needs them."""
    state = reset_env(params, town, jax.random.PRNGKey(0))
    pos, yaw = route_point(town, jnp.asarray(ego_route, jnp.int32),
                           jnp.asarray(ego_s))
    return state.replace(
        ego_pos=pos, ego_yaw=yaw, ego_v=jnp.asarray(float(ego_v)),
        ego_route=jnp.asarray(ego_route, jnp.int32), ego_s=jnp.asarray(ego_s),
        agents_route=jnp.asarray(agents_route, jnp.int32),
        agents_s=jnp.asarray(agents_s, jnp.float32),
        agents_v=jnp.zeros((len(agents_s),)),
    )


def test_expert_brakes_for_lead_vehicle():
    """A stopped vehicle 5 m ahead in-lane → full brake; the same scene with
    the headway envelope disabled → the old tailgating throttle."""
    town = make_town(blocks=3)
    params = SimParams(n_agents=1, target_speed=8.0, **_GREEN)
    state = _cruising_state(town, params, agents_route=[0], agents_s=[25.0])
    # sanity: the agent really is ~5 m ahead of the ego
    apos, _ = agent_positions(town, state.agents_route, state.agents_s)
    gap = float(jnp.linalg.norm(apos[0] - state.ego_pos))
    assert 4.0 < gap < 6.0

    ctrl = autopilot_control(params, town, state)
    assert float(ctrl.brake) == 1.0
    assert float(ctrl.throttle) == 0.0

    off = SimParams(n_agents=1, target_speed=8.0, headway_gap=0.0,
                    yield_gap=0.0, **_GREEN)
    ctrl_off = autopilot_control(off, town, state)
    assert float(ctrl_off.brake) == 0.0
    assert float(ctrl_off.throttle) > 0.0


def test_headway_watch_grows_with_speed():
    """Time-headway: a gap that is safe when crawling is braked for at
    speed (watch distance = gap + ttc·v)."""
    town = make_town(blocks=3)
    params = SimParams(n_agents=1, target_speed=8.0, headway_gap=7.0,
                       headway_ttc=1.2, **_GREEN)
    # lead 10 m ahead: outside the 7 m static gap, inside 7 + 1.2·8 = 16.6
    fast = _cruising_state(town, params, agents_route=[0], agents_s=[30.0],
                           ego_v=8.0)
    slow = fast.replace(ego_v=jnp.asarray(0.5))
    assert float(autopilot_control(params, town, fast).brake) == 1.0
    assert float(autopilot_control(params, town, slow).brake) == 0.0


def test_expert_ignores_vehicle_behind_and_beside():
    """The corridor is forward-only and lane-narrow: traffic behind the ego
    or one road over must not trigger the headway brake."""
    town = make_town(blocks=3)
    params = SimParams(n_agents=2, target_speed=8.0, **_GREEN)
    # one agent 10 m BEHIND on the same route, one on a different route far away
    state = _cruising_state(town, params, agents_route=[0, 3],
                            agents_s=[10.0, 10.0], ego_s=20.0, ego_v=2.0)
    apos, _ = agent_positions(town, state.agents_route, state.agents_s)
    heading = jnp.stack([jnp.cos(state.ego_yaw), jnp.sin(state.ego_yaw)])
    assert float((apos[0] - state.ego_pos) @ heading) < 0  # really behind
    ctrl = autopilot_control(params, town, state)
    assert float(ctrl.brake) == 0.0
    assert float(ctrl.throttle) > 0.0


def test_expert_yields_at_occupied_junction():
    """Approaching a junction whose disc holds another vehicle → stop until
    it clears (first-come right-of-way, the rule the scripted agents follow)."""
    town = make_town(blocks=3)
    params = SimParams(n_agents=1, target_speed=8.0, headway_gap=0.0,
                       yield_gap=8.0, **_GREEN)
    junction_r = max(6.0, float(town.road_half_width) * 1.8)

    # place the ego approaching its nearest junction from ~junction_r + 4 m;
    # scan arclengths on route 0 for a point in that band
    best = None
    for s in [float(x) for x in range(2, int(float(town.route_total[0])), 2)]:
        pos, yaw = route_point(town, jnp.asarray(0, jnp.int32), jnp.asarray(s))
        d = jnp.linalg.norm(town.junctions - pos, axis=-1)
        j = int(jnp.argmin(d))
        dj = float(d[j])
        heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
        ahead = float((town.junctions[j] - pos) @ heading) > 0.0
        if junction_r + 2.0 < dj < junction_r + 6.0 and ahead:
            best = (s, j)
            break
    assert best is not None, "no approach point found on route 0"
    ego_s, j = best

    # an agent parked INSIDE that junction's disc: find an arclength on some
    # route whose position falls within junction_r of the junction center
    inside = None
    for r in range(int(town.routes.shape[0])):
        total = float(town.route_total[r])
        for s in [float(x) for x in range(0, int(total), 2)]:
            pos, _ = route_point(town, jnp.asarray(r, jnp.int32), jnp.asarray(s))
            if float(jnp.linalg.norm(pos - town.junctions[j])) < junction_r - 1.0:
                inside = (r, s)
                break
        if inside:
            break
    assert inside is not None

    state = _cruising_state(town, params, agents_route=[inside[0]],
                            agents_s=[inside[1]], ego_s=ego_s, ego_v=5.0)
    ctrl = autopilot_control(params, town, state)
    assert float(ctrl.brake) == 1.0

    # junction empty → no yield
    empty = state.replace(agents_s=state.agents_s + 1e6)
    ctrl2 = autopilot_control(params, town, empty)
    assert float(ctrl2.brake) == 0.0


def test_expert_yields_to_closer_rival_entering_junction():
    """Entry-conflict tie-break (round 5): two vehicles approaching the same
    EMPTY junction used to both pass the occupancy test and meet inside.
    The ego now yields when a rival approaching the same junction is closer
    to it; a strictly-farther rival does not hold the ego."""
    town = make_town(blocks=3)
    params = SimParams(n_agents=1, target_speed=8.0, headway_gap=0.0,
                       yield_gap=8.0, **_GREEN)
    junction_r = max(6.0, float(town.road_half_width) * 1.8)

    # ego approaching its nearest junction from ~junction_r + 4 m
    best = None
    for s in [float(x) for x in range(2, int(float(town.route_total[0])), 2)]:
        pos, yaw = route_point(town, jnp.asarray(0, jnp.int32), jnp.asarray(s))
        d = jnp.linalg.norm(town.junctions - pos, axis=-1)
        j = int(jnp.argmin(d))
        dj = float(d[j])
        heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
        ahead = float((town.junctions[j] - pos) @ heading) > 0.0
        if junction_r + 3.0 < dj < junction_r + 6.0 and ahead:
            best = (s, j, dj)
            break
    assert best is not None, "no approach point found on route 0"
    ego_s, j, ego_d = best

    # a rival agent approaching the SAME junction, closer than the ego but
    # still OUTSIDE the disc (the old occupancy rule sees an empty junction)
    rival = None
    for r in range(int(town.routes.shape[0])):
        if r == 0:
            continue
        total = float(town.route_total[r])
        for s in [float(x) for x in range(0, int(total), 1)]:
            pos, _ = route_point(town, jnp.asarray(r, jnp.int32), jnp.asarray(s))
            d = float(jnp.linalg.norm(pos - town.junctions[j]))
            if junction_r + 0.5 < d < ego_d - 1.0:
                rival = (r, s)
                break
        if rival:
            break
    assert rival is not None, "no closer rival approach found"

    state = _cruising_state(town, params, agents_route=[rival[0]],
                            agents_s=[rival[1]], ego_s=ego_s, ego_v=5.0)
    ctrl = autopilot_control(params, town, state)
    assert float(ctrl.brake) == 1.0          # yields to the closer rival

    # same geometry, rival moved to a point far from the junction → proceed
    far_s = None
    total = float(town.route_total[rival[0]])
    for s in [float(x) for x in range(0, int(total), 2)]:
        pos, _ = route_point(town, jnp.asarray(rival[0], jnp.int32),
                             jnp.asarray(s))
        if float(jnp.linalg.norm(pos - town.junctions[j])) > junction_r + 10.0:
            far_s = s
            break
    assert far_s is not None
    gone = state.replace(agents_s=jnp.asarray([far_s], jnp.float32))
    assert float(autopilot_control(params, town, gone).brake) == 0.0


def test_ego_lane_change_blocked_by_occupied_target_lane():
    """The scheduled ego lane change must obey the same free-headway rule
    the agents' overtakes do (round 5): with traffic alongside in the target
    lane the switch is skipped; with the lane clear it executes."""
    from carla_imitation_learning_tpu.sim.world import (
        _apply_ego_lane_change, ego_lane_change_plan,
    )

    town = make_town(blocks=3, lanes_per_direction=2)
    params = SimParams(n_agents=1, lane_change_period=160, **_GREEN)

    # ego on lane 0 of cell 0 (route 0), at the scheduled switch step,
    # clear of junctions
    state = None
    for s in [float(x) for x in range(2, int(float(town.route_total[0])), 2)]:
        pos, yaw = route_point(town, jnp.asarray(0, jnp.int32), jnp.asarray(s))
        d = float(jnp.min(jnp.linalg.norm(pos - town.junctions, axis=-1)))
        junction_r = max(6.0, float(town.road_half_width) * 1.8)
        if d > junction_r + 4.0:
            state = _cruising_state(town, params, agents_route=[1],
                                    agents_s=[0.0], ego_s=s)
            break
    assert state is not None
    state = state.replace(t=jnp.asarray(80, jnp.int32))  # period//2
    target_route, _ = ego_lane_change_plan(params, town, state)
    assert int(target_route) == 1            # lane 0 → lane 1 of cell 0

    # agent parked ALONGSIDE on the target lane (same fractional position)
    frac = float(state.ego_s / town.route_total[0])
    beside = state.replace(
        agents_s=jnp.asarray([frac * float(town.route_total[1])]))
    blocked = _apply_ego_lane_change(params, town, beside, beside)
    assert int(blocked.ego_route) == 0       # switch skipped

    # agent far away on the target lane → switch executes
    far_frac = (frac + 0.5) % 1.0
    clear = state.replace(
        agents_s=jnp.asarray([far_frac * float(town.route_total[1])]))
    done = _apply_ego_lane_change(params, town, clear, clear)
    assert int(done.ego_route) == 1


def test_turn_speed_caps_cruise_through_curves():
    """With turn_speed set, the expert lifts/brakes when the route heading
    swings over the pursuit horizon; on a straight it cruises at target."""
    town = make_town(blocks=3)
    params = SimParams(n_agents=0, target_speed=8.0, turn_speed=4.0, **_GREEN)

    # find a pre-corner arclength: heading swing between s+3 and s+13 ≥ 0.15
    turn_s = straight_s = None
    for s in [float(x) for x in range(0, int(float(town.route_total[0])), 1)]:
        _, y1 = route_point(town, jnp.asarray(0, jnp.int32), jnp.asarray(s + 3.0))
        _, y2 = route_point(town, jnp.asarray(0, jnp.int32), jnp.asarray(s + 13.0))
        dyaw = abs(float(jnp.mod(y2 - y1 + jnp.pi, 2 * jnp.pi) - jnp.pi))
        if dyaw >= 0.15 and turn_s is None:
            turn_s = s
        if dyaw < 0.02 and straight_s is None:
            straight_s = s
        if turn_s is not None and straight_s is not None:
            break
    assert turn_s is not None and straight_s is not None

    at_turn = _cruising_state(town, params, agents_route=[], agents_s=[],
                              ego_s=turn_s, ego_v=7.0)
    ctrl = autopilot_control(params, town, at_turn)
    assert float(ctrl.brake) == 1.0  # 7 m/s ≫ 4 m/s cap → brake

    on_straight = _cruising_state(town, params, agents_route=[], agents_s=[],
                                  ego_s=straight_s, ego_v=7.0)
    ctrl2 = autopilot_control(params, town, on_straight)
    assert float(ctrl2.brake) == 0.0
    assert float(ctrl2.throttle) > 0.0


def test_agents_brake_for_ego_in_corridor():
    """ego_pos makes the scripted traffic treat the ego as a leader: an agent
    whose forward corridor holds the ego slows; without ego_pos it cruises
    (CARLA's traffic manager avoids the hero vehicle)."""
    town = make_town(blocks=3)
    phases = jnp.full((town.lights_pos.shape[0],), GREEN, jnp.int32)
    routes = jnp.asarray([0], jnp.int32)
    s = jnp.asarray([20.0])
    v = jnp.asarray([6.0])
    # ego parked 5 m ahead of the agent, in its lane
    apos, ayaw = agent_positions(town, routes, s)
    heading = jnp.stack([jnp.cos(ayaw[0]), jnp.sin(ayaw[0])])
    ego_pos = apos[0] + 5.0 * heading

    _, _, v_block = step_agents(town, routes, s, v, phases, dt=0.05,
                                target_speed=7.0, ego_pos=ego_pos)
    _, _, v_free = step_agents(town, routes, s, v, phases, dt=0.05,
                               target_speed=7.0)
    assert float(v_block[0]) < float(v[0])      # braking toward 0
    assert float(v_free[0]) > float(v[0])       # accelerating to target

    # ego BEHIND the agent → no effect
    _, _, v_behind = step_agents(town, routes, s, v, phases, dt=0.05,
                                 target_speed=7.0,
                                 ego_pos=apos[0] - 5.0 * heading)
    assert float(v_behind[0]) == float(v_free[0])


def test_ran_red_is_a_crossing_event_not_exposure():
    """info['ran_red'] fires only when the car drives THROUGH a non-green
    light's stop line — an expert braking to a clean stop logs zero, a
    full-throttle run-through logs the crossing."""
    from carla_imitation_learning_tpu.sim.world import VehicleControl, step_env

    town = make_town(blocks=3)
    # every light pinned non-green
    params = SimParams(n_agents=0, target_speed=8.0, light_green=0.0,
                       light_yellow=0.0, light_red=1e6)
    # spawn the ego ~12 m before its nearest in-corridor light, cruising
    state = reset_env(params, town, jax.random.PRNGKey(3))
    lp = town.lights_pos
    best = None
    for r in range(int(town.routes.shape[0])):
        total = float(town.route_total[r])
        for s in [float(x) for x in range(0, int(total), 2)]:
            pos, yaw = route_point(town, jnp.asarray(r, jnp.int32),
                                   jnp.asarray(s))
            h = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
            lat = jnp.stack([-h[1], h[0]])
            rel = lp - pos
            ok = ((rel @ h) > 8.0) & ((rel @ h) < 14.0) \
                & (jnp.abs(rel @ lat) < 3.0)
            if bool(jnp.any(ok)):
                best = (r, s)
                break
        if best:
            break
    assert best is not None, "no pre-light spawn found"
    state = state.replace(
        ego_route=jnp.asarray(best[0], jnp.int32),
        ego_s=jnp.asarray(best[1]),
        ego_pos=route_point(town, jnp.asarray(best[0], jnp.int32),
                            jnp.asarray(best[1]))[0],
        ego_yaw=route_point(town, jnp.asarray(best[0], jnp.int32),
                            jnp.asarray(best[1]))[1],
        ego_v=jnp.asarray(6.0))

    # expert: brakes for the red, never crosses
    s_exp = state
    any_ran = False
    for _ in range(60):
        ctrl = autopilot_control(params, town, s_exp)
        s_exp, info = step_env(params, town, s_exp, ctrl)
        any_ran |= bool(info["ran_red"])
    assert not any_ran
    assert float(s_exp.ego_v) < 1.0  # stopped at the line

    # run-through: full throttle must log the crossing exactly once
    s_run = state
    crossings = 0
    full = VehicleControl(steer=jnp.asarray(0.0), throttle=jnp.asarray(1.0),
                          brake=jnp.asarray(0.0))
    for _ in range(60):
        ctrl = autopilot_control(params, town, s_run)
        forced = full.replace(steer=ctrl.steer)  # keep lane, ignore brakes
        s_run, info = step_env(params, town, s_run, forced)
        crossings += int(bool(info["ran_red"]))
    assert crossings == 1, crossings
