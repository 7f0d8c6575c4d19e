"""Scripted traffic agents + traffic-light schedule.

Agents are route-followers: their pose is a pure function of (route, arclength)
— a gather + lerp into the town's resampled polylines — so a fleet step is a
handful of vectorized ops with no per-agent control flow.

Traffic lights are STATELESS: phase is a pure function of sim time and the
light's fixed offset, so light state never needs checkpointing or resets.
Phases: 0=green, 1=yellow, 2=red.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.sim.town import TownMap, route_point

GREEN, YELLOW, RED = 0, 1, 2


def light_phases(town: TownMap, t_seconds, green: float, yellow: float, red: float):
    """(L,) int32 phase of every light at sim time t."""
    cycle = green + yellow + red
    s = jnp.mod(t_seconds + town.lights_offset, cycle)
    return jnp.where(s < green, GREEN, jnp.where(s < green + yellow, YELLOW, RED))


def red_light_ahead(town: TownMap, pos, yaw, phases, stop_distance: float):
    """True when a non-green light lies within stop_distance in front of pos."""
    rel = town.lights_pos - pos  # (L,2)
    dist = jnp.linalg.norm(rel, axis=-1)
    heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
    ahead = (rel @ heading) > 0.0
    blocking = (phases != GREEN) & ahead & (dist < stop_distance)
    return jnp.any(blocking)


def agent_positions(town: TownMap, routes, s):
    """(A,) routes + (A,) arclens → ((A,2) pos, (A,) yaw)."""
    return jax.vmap(lambda r, ss: route_point(town, r, ss))(routes, s)


def step_agents(
    town: TownMap,
    routes: jnp.ndarray,   # (A,) int32
    s: jnp.ndarray,        # (A,) arclength
    v: jnp.ndarray,        # (A,) speed
    phases: jnp.ndarray,   # (L,) light phases
    dt: float,
    target_speed: float,
    accel: float = 3.0,
    stop_distance: float = 12.0,
    gap: float = 8.0,
    junction_radius: float = 6.0,
    yield_at_junctions: bool = True,
    lane_changes: bool = True,
    ego_pos: jnp.ndarray | None = None,
):
    """One fleet step → (routes, s, v). Speed control: accelerate to target,
    brake for red lights ahead, for the leading agent on the same route, and
    (first-come right-of-way) for agents already inside the junction this
    agent is about to enter.

    ``ego_pos`` (2,), when given, makes agents treat the EGO vehicle as
    traffic too: an agent brakes when the ego sits in its forward corridor
    (CARLA's traffic manager avoids the hero vehicle — without this, traffic
    rear-ends an ego stopped at a red light and the crash is logged against
    the ego), and an ego inside a junction holds approaching agents exactly
    like another agent would. The ego check uses the agent's BODY frame, so
    it also covers an off-route (policy-driven) ego the route-arclength
    leader-gap math cannot see.

    On multi-lane towns (``town.lanes > 1``) a leader-blocked agent changes
    to an adjacent same-direction lane when that lane has free headway both
    ways — overtaking, as a pure route-index rewrite: lane k of grid cell g
    is route g·lanes + k (make_town contract), and the fractional loop
    position transfers (concentric rectangles ⇒ same corner phase). On BLOCK
    loops (offset inward) k=0 is the driver's right lane so overtaking is
    k+1; on the PERIMETER loops (offset outward) the orientation flips and
    overtaking-left is k−1. Simultaneous changes into the same slot are
    broken by agent index. ``routes`` passes through on single-lane towns."""
    pos, yaw = agent_positions(town, routes, s)
    # junction pavement scales with road width (multi-lane corners sit
    # farther out); computed in jnp so town may be traced or constant
    junction_r = jnp.maximum(junction_radius, town.road_half_width * 1.8)
    d_junc_all = (jnp.linalg.norm(pos[:, None, :] - town.junctions[None],
                                  axis=-1)
                  if town.junctions.shape[0] > 0 else None)

    # red light braking, per agent
    must_stop = jax.vmap(
        lambda p, y: red_light_ahead(town, p, y, phases, stop_distance)
    )(pos, yaw)

    # same-route leader gap: pairwise forward arc distance (A is small)
    total = town.route_total[routes]  # (A,)
    ds = jnp.mod(s[None, :] - s[:, None], total[:, None])  # ds[i,j] = arc i→j
    same_route = (routes[None, :] == routes[:, None])
    is_other = ~jnp.eye(routes.shape[0], dtype=bool)
    blocked = same_route & is_other & (ds > 1e-3) & (ds < gap)
    leader_close = jnp.any(blocked, axis=1)

    if ego_pos is not None:
        # ego-as-leader: forward-corridor check in each agent's body frame
        rel_ego = ego_pos - pos                                # (A, 2)
        hvec = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        lvec = jnp.stack([-jnp.sin(yaw), jnp.cos(yaw)], axis=-1)
        fwd = jnp.sum(rel_ego * hvec, axis=-1)
        lat = jnp.sum(rel_ego * lvec, axis=-1)
        leader_close |= (fwd > 0.0) & (fwd < gap) & (jnp.abs(lat) < 2.6)

    # intersection right-of-way (first-come): an agent APPROACHING its nearest
    # junction yields while any OTHER agent occupies that junction's disc —
    # the cross-route conflict rule lights don't cover (CARLA's unsignalised
    # junction behavior). All scatter-free: J is a static town constant.
    must_yield = jnp.zeros_like(leader_close)
    if yield_at_junctions and d_junc_all is not None:
        jidx = jnp.argmin(d_junc_all, axis=1)                  # (A,)
        d_junc = jnp.take_along_axis(d_junc_all, jidx[:, None], 1)[:, 0]
        in_junction = d_junc < junction_r
        approaching = (d_junc >= junction_r) & (d_junc < junction_r + gap)
        # occupied[a] = any OTHER agent inside agent a's target junction
        same_junc = jidx[None, :] == jidx[:, None]             # (A, A)
        occupied = jnp.any(same_junc & is_other & in_junction[None, :], axis=1)
        if ego_pos is not None:
            # an ego inside the junction holds approaching agents too
            d_ego = jnp.linalg.norm(ego_pos - town.junctions, axis=-1)  # (J,)
            occupied |= d_ego[jidx] < junction_r
        must_yield = approaching & occupied

    target = jnp.where(must_stop | leader_close | must_yield, 0.0, target_speed)
    dv = jnp.clip(target - v, -2.0 * accel * dt, accel * dt)
    v_new = jnp.maximum(v + dv, 0.0)
    s_new = jnp.mod(s + v_new * dt, total)

    routes_new = routes
    if lane_changes and town.lanes > 1:
        lanes = town.lanes
        A = routes.shape[0]
        frac = s_new / total                       # fractional loop position
        lane_k = routes % lanes
        # block loops are offset INWARD (k=0 = right lane, overtake = k+1);
        # the perimeter loops (last cell group) are offset OUTWARD, so the
        # driver's left is k−1 there
        n_cells = town.routes.shape[0] // lanes
        is_perim = (routes // lanes) == (n_cells - 1)
        ldelta = jnp.where(is_perim, -1, 1)
        can_left = jnp.where(is_perim, lane_k > 0, lane_k + 1 < lanes)
        can_right = jnp.where(is_perim, lane_k + 1 < lanes, lane_k > 0)
        # blocked → overtake one lane left; unblocked → drift back right
        want_left = leader_close & can_left
        want_right = (~leader_close) & can_right
        target_route = jnp.where(
            want_left, routes + ldelta,
            jnp.where(want_right, routes - ldelta, routes))
        total_t = town.route_total[target_route]
        # headway on the target lane: fractional distance to every agent
        # already there, scaled to meters on the target loop; the return-to
        # -right move requires DOUBLE the gap (hysteresis against ping-pong)
        on_target = routes[None, :] == target_route[:, None]     # (A, A)
        df = jnp.abs(jnp.mod(frac[None, :] - frac[:, None] + 0.5, 1.0) - 0.5)
        need = jnp.where(want_right, 2.0 * gap, gap)[:, None]
        near = on_target & is_other & (df * total_t[:, None] < need)
        target_free = ~jnp.any(near, axis=1)
        # never swap lanes inside/entering a junction (turn geometry)
        clear_of_junctions = True
        if d_junc_all is not None:
            clear_of_junctions = d_junc_all.min(axis=1) > junction_r + 2.0
        wants = want_left | want_right
        # simultaneous-change tie-break: two agents converging on the same
        # lane slot in the same step would pass each other's pre-change
        # occupancy test — the LOWER-indexed agent wins, the other aborts
        same_tgt = target_route[None, :] == target_route[:, None]
        rival = (same_tgt & wants[None, :] & is_other
                 & (df * total_t[:, None] < gap)
                 & (jnp.arange(A)[None, :] < jnp.arange(A)[:, None]))
        yields_to_rival = jnp.any(rival, axis=1)
        ego_clear = True
        if ego_pos is not None:
            # ego occupancy on the TARGET slot: a route transfer is an
            # instantaneous ~lane-width lateral jump, and the `near` test
            # above sees only other agents — without this an agent could
            # legally teleport into the ego's flank (measured: 3 of 4
            # expert A→B collisions, benchmarks/crash_forensics.py, the
            # ego usually stopped mid-yield when it happens). Veto the
            # change when the LANDING point sits within the same headway
            # the agent-agent rule demands (`need`).
            land = jax.vmap(lambda r, f: route_point(town, r, f)[0])(
                target_route, frac * total_t)            # (A, 2)
            d_ego_land = jnp.linalg.norm(land - ego_pos, axis=-1)
            ego_clear = d_ego_land > need[:, 0]
        change = (wants & target_free & clear_of_junctions
                  & ~yields_to_rival & ego_clear)
        routes_new = jnp.where(change, target_route, routes)
        # transfer the fractional position onto the (concentric) target loop
        s_new = jnp.where(change, frac * total_t, s_new)

    return routes_new, s_new, v_new
