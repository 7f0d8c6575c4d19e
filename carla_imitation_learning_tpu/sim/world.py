"""World state + env step/reset + autopilot expert.

The closed-loop replacement for CARLA's socket step loop: everything —
dynamics, traffic, lights, collision, auto-reset — is one pure function, so a
policy-in-the-loop rollout is a single lax.scan under jit with ZERO host
round-trips per step (BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from carla_imitation_learning_tpu.sim import agents as agent_lib
from carla_imitation_learning_tpu.sim import collision as col
from carla_imitation_learning_tpu.sim import pedestrians as ped_lib
from carla_imitation_learning_tpu.sim.dynamics import bicycle_step
from carla_imitation_learning_tpu.sim.town import TownMap, route_point


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static simulation constants (python floats → baked into the jaxpr)."""

    dt: float = 0.05
    wheelbase: float = 2.9
    max_steer: float = 0.6
    max_accel: float = 4.0
    max_brake: float = 8.0
    drag: float = 0.05
    tire_stiffness: float = 9.0
    n_agents: int = 15
    agent_target_speed: float = 7.0
    n_pedestrians: int = 0   # crosswalk walkers (sim/pedestrians.py); 0 = off
    ped_speed: float = 1.4
    # Expected fraction of walkers strolling sidewalk loops instead of
    # working a crosswalk (sim/pedestrians.py); 0 = all-crosswalk.
    ped_sidewalk_frac: float = 0.0
    light_green: float = 8.0
    light_yellow: float = 2.0
    light_red: float = 6.0
    collision_radius: float = 2.2
    # Collision geometry. "capsule" (default) models every vehicle as an
    # oriented capsule — 2·(vehicle_half_len+vehicle_radius) long along its
    # heading, 2·vehicle_radius wide — the shape CARLA's oriented bounding
    # boxes approximate. "circle" is the legacy disc of ``collision_radius``:
    # it flags any center within 4.4 m, so an oncoming pass in the adjacent
    # lane (3.5 m lateral) counts as a crash — measured 76% of all expert
    # collision events on the stock town were such passes. Disc numbers are
    # NOT comparable with capsule numbers (r1-r3 reports are disc-based).
    collision_model: str = "capsule"
    vehicle_half_len: float = 1.3
    vehicle_radius: float = 1.0
    # Goal navigation (sim/planner.py): an env with WorldState.goal >= 0
    # arrives — episode ends as a success — within this many meters of its
    # goal point.
    arrive_radius: float = 4.0
    episode_len: int = 400
    target_speed: float = 8.0  # autopilot cruise speed
    # Scripted ego lane changes (multi-lane towns): every ``lane_change_period``
    # steps the ego's navigation plan swaps to the adjacent same-direction
    # lane; the CIL nav command announces it (4=left, 5=right) for
    # ``lane_change_window`` steps around the switch. 0 = off.
    lane_change_period: int = 0
    lane_change_window: int = 12
    # Expert (autopilot) safety envelope. The reference's labels come from
    # CARLA's autopilot, which keeps headway to the lead vehicle and yields
    # at unsignalised junctions (the data contract at reference
    # imitation_dataset.py:96-110 was produced by such a driver) — without
    # these the expert tailgates into crashes and every imitation tier
    # inherits that ceiling.
    # ``headway_gap`` (m): brake when a vehicle sits closer than this in the
    # forward lane corridor; the watched gap grows by ``headway_ttc`` seconds
    # of current speed (time-headway). 0 disables.
    headway_gap: float = 7.0
    headway_ttc: float = 1.2
    headway_corridor: float = 2.6  # lateral half-width of the watched corridor
    # ``yield_gap`` (m): depth of the approach zone in which the expert
    # yields to vehicles already inside the junction ahead (first-come
    # right-of-way, same rule the scripted agents follow). 0 disables.
    yield_gap: float = 8.0
    # ``turn_speed`` (m/s): cruise cap while the route ahead curves (the
    # planner-aware slow-for-turn the pure-pursuit tracker needs to hold the
    # lane through junction fans). 0 = no slowdown.
    turn_speed: float = 0.0
    # Junction turn fans (towns built with turn_fans=True): every
    # ``turn_period`` steps the ego re-rolls which loop it follows among the
    # routes running through its current position (town.transfer_* tables) —
    # a genuine turn decision ahead of the next junction, which
    # navigation_command then announces from the new route's geometry.
    # ``agent_turn_prob`` is the per-step probability each traffic agent
    # takes an available transfer (route variety in the background traffic).
    # 0 = off (tables unused, no per-step cost).
    turn_period: int = 0
    agent_turn_prob: float = 0.0

    @classmethod
    def from_cfg(cls, cfg) -> "SimParams":
        s = cfg.sim
        return cls(
            dt=float(s.dt), wheelbase=float(s.wheelbase), max_steer=float(s.max_steer),
            max_accel=float(s.max_accel), max_brake=float(s.max_brake),
            drag=float(s.drag), tire_stiffness=float(s.tire_stiffness),
            n_agents=int(s.n_agents), agent_target_speed=float(s.agent_target_speed),
            light_green=float(s.light_green), light_yellow=float(s.light_yellow),
            light_red=float(s.light_red), collision_radius=float(s.collision_radius),
            episode_len=int(s.episode_len),
            n_pedestrians=int(s.get("n_pedestrians", 0)),
            ped_speed=float(s.get("ped_speed", 1.4)),
            ped_sidewalk_frac=float(s.get("ped_sidewalk_frac", 0.0)),
            lane_change_period=int(s.get("lane_change_period", 0)),
            lane_change_window=int(s.get("lane_change_window", 12)),
            turn_period=int(s.get("turn_period", 0)),
            agent_turn_prob=float(s.get("agent_turn_prob", 0.0)),
            arrive_radius=float(s.get("arrive_radius", 4.0)),
            headway_gap=float(s.get("headway_gap", 7.0)),
            headway_ttc=float(s.get("headway_ttc", 1.2)),
            headway_corridor=float(s.get("headway_corridor", 2.6)),
            yield_gap=float(s.get("yield_gap", 8.0)),
            turn_speed=float(s.get("turn_speed", 0.0)),
            collision_model=str(s.get("collision_model", "capsule")),
            vehicle_half_len=float(s.get("vehicle_half_len", 1.3)),
            vehicle_radius=float(s.get("vehicle_radius", 1.0)),
        )


class WorldState(struct.PyTreeNode):
    ego_pos: jnp.ndarray    # (2,)
    ego_yaw: jnp.ndarray    # ()
    ego_v: jnp.ndarray      # ()
    ego_steer: jnp.ndarray  # () realized wheel angle (rad)
    ego_route: jnp.ndarray  # () int32 — route the autopilot/spawn follows
    ego_s: jnp.ndarray      # () arclength of the nearest route point (autopilot)
    agents_route: jnp.ndarray  # (A,) int32
    agents_s: jnp.ndarray      # (A,)
    agents_v: jnp.ndarray      # (A,)
    peds_crossing: jnp.ndarray  # (P,) int32 crosswalk ids (P may be 0)
    peds_s: jnp.ndarray         # (P,) normalized position on the crosswalk
    peds_phase: jnp.ndarray     # (P,) walk/wait phase (sim/pedestrians.py)
    t: jnp.ndarray          # () int32 step count within episode
    rng: jnp.ndarray        # PRNG key folded at resets
    # () int32 navigation goal id into town.nav_* tables (sim/planner.py);
    # −1 (the reset default) = free-roam, identical to the pre-goal behavior.
    goal: jnp.ndarray


class VehicleControl(struct.PyTreeNode):
    """CARLA-style normalized control (reference state.csv columns)."""

    steer: jnp.ndarray     # [-1, 1]
    throttle: jnp.ndarray  # [0, 1]
    brake: jnp.ndarray     # [0, 1]


def reset_env(params: SimParams, town: TownMap, rng) -> WorldState:
    """Spawn ego + agents on random routes at spaced arclengths."""
    k_ego_r, k_ego_s, k_ar, k_as, k_ped, k_state = jax.random.split(rng, 6)
    n_routes = town.routes.shape[0]
    ego_route = jax.random.randint(k_ego_r, (), 0, n_routes)
    ego_s = jax.random.uniform(k_ego_s, ()) * town.route_total[ego_route]
    ego_pos, ego_yaw = route_point(town, ego_route, ego_s)

    a = params.n_agents
    agents_route = jax.random.randint(k_ar, (a,), 0, n_routes)
    # spread agents: stratified arclengths with jitter, avoids spawn overlap
    base = (jnp.arange(a) + jax.random.uniform(k_as, (a,))) / a
    agents_s = base * town.route_total[agents_route]
    peds_crossing, peds_s, peds_phase = ped_lib.spawn_pedestrians(
        town, k_ped, params.n_pedestrians,
        sidewalk_frac=params.ped_sidewalk_frac)
    return WorldState(
        ego_pos=ego_pos, ego_yaw=ego_yaw,
        ego_v=jnp.zeros(()), ego_steer=jnp.zeros(()),
        ego_route=ego_route, ego_s=ego_s,
        agents_route=agents_route, agents_s=agents_s,
        agents_v=jnp.full((a,), params.agent_target_speed * 0.5),
        peds_crossing=peds_crossing, peds_s=peds_s, peds_phase=peds_phase,
        t=jnp.zeros((), jnp.int32), rng=k_state,
        goal=jnp.full((), -1, jnp.int32),
    )


def ego_lane_change_plan(params: SimParams, town: TownMap, state: WorldState):
    """Scripted lane-change navigation plan for the ego.

    Returns ``(target_route, command)`` — command is 0 (none), 4 (change
    left) or 5 (change right), active for ``lane_change_window`` steps around
    the scheduled switch at ``t % period == period // 2``. Pure function of
    (t, route): no extra state, so checkpoints/resets need nothing new.
    Lane-index geometry follows agents.step_agents: on block/super-block
    loops (offset inward) k+1 is the driver's LEFT; the perimeter (offset
    outward) flips.
    """
    zero = jnp.zeros((), jnp.int32)
    if town.lanes <= 1 or params.lane_change_period <= 0:
        return state.ego_route, zero
    lanes = town.lanes
    period = params.lane_change_period
    k = state.ego_route % lanes
    n_cells = town.routes.shape[0] // lanes
    is_perim = (state.ego_route // lanes) == (n_cells - 1)
    # target lane: up until the top lane, then back down
    dk = jnp.where(k + 1 < lanes, 1, -1)
    target_route = state.ego_route + dk
    left = jnp.where(is_perim, dk < 0, dk > 0)
    cmd = jnp.where(left, 4, 5).astype(jnp.int32)
    phase = jnp.mod(state.t, period)
    active = jnp.abs(phase - period // 2) < params.lane_change_window // 2 + 1
    return target_route, jnp.where(active, cmd, zero)


def _apply_ego_lane_change(params: SimParams, town: TownMap,
                           prev: WorldState, mid: WorldState) -> WorldState:
    """Execute the scheduled lane switch on ``mid`` (pre-arclength-refine):
    rewrite ego_route and transfer the fractional loop position (concentric
    loops ⇒ same corner phase), unless the ego is inside/entering a junction
    (turn geometry) — a blocked switch just waits for the next period."""
    if town.lanes <= 1 or params.lane_change_period <= 0:
        return mid
    target_route, _ = ego_lane_change_plan(params, town, prev)
    phase = jnp.mod(prev.t, params.lane_change_period)
    clear = jnp.ones((), bool)
    if town.junctions.shape[0] > 0:
        d = jnp.min(jnp.linalg.norm(prev.ego_pos - town.junctions, axis=-1))
        junction_r = jnp.maximum(6.0, town.road_half_width * 1.8)
        clear = d > junction_r + 2.0
    if prev.agents_s.shape[0] > 0:
        # occupancy gate (round 5): never swap into a lane slot with traffic
        # nearby — the agents' own overtakes require free headway both ways
        # (step_agents target_free) but the scheduled ego change didn't, so
        # every lane_change_period the ego could side-swipe adjacent-lane
        # traffic (a dominant expert crash mode on the multilane A→B towns).
        # Same fractional-position trick the agents use: same-cell lanes are
        # concentric loops, so |Δfrac|·total is the along-lane gap in meters.
        total_t = town.route_total[target_route]
        frac = prev.ego_s / town.route_total[prev.ego_route]
        af = prev.agents_s / town.route_total[prev.agents_route]
        df = jnp.abs(jnp.mod(af - frac + 0.5, 1.0) - 0.5)
        near = (prev.agents_route == target_route) & (df * total_t < 10.0)
        clear &= ~jnp.any(near)
    do = (phase == params.lane_change_period // 2) \
        & (target_route != prev.ego_route) & clear
    frac = mid.ego_s / town.route_total[prev.ego_route]
    return mid.replace(
        ego_route=jnp.where(do, target_route, mid.ego_route),
        ego_s=jnp.where(do, frac * town.route_total[target_route], mid.ego_s))


def navigation_command(params: SimParams, town: TownMap, state: WorldState
                       ) -> jnp.ndarray:
    """CIL-style navigation command (full CARLA-like taxonomy):
    0=follow(lane) 1=left 2=right 3=straight (through the next junction —
    reachable on super-block/perimeter/L routes) 4=change-lane-left
    5=change-lane-right (scripted, ``ego_lane_change_plan``).

    Pure function of the world state; the rollout loop vmaps it per env and
    the BranchedCILPolicy selects its head with it (models/cil.py)."""
    from carla_imitation_learning_tpu.sim.town import route_point

    _, yaw_now = route_point(town, state.ego_route, state.ego_s)
    _, yaw_ahead = route_point(town, state.ego_route, state.ego_s + 15.0)
    dyaw = jnp.mod(yaw_ahead - yaw_now + jnp.pi, 2 * jnp.pi) - jnp.pi
    turn = jnp.where(dyaw > 0, 1, 2)
    # straight-at-junction: path ahead is straight AND passes a grid node
    # (super-block long sides, L-loop sides, perimeter; plain block loops
    # always turn at the nodes they touch)
    straight_junc = jnp.zeros((), bool)
    if town.junctions.shape[0] > 0:
        p_ahead, _ = route_point(town, state.ego_route, state.ego_s + 10.0)
        d = jnp.min(jnp.linalg.norm(p_ahead - town.junctions, axis=-1))
        junction_r = jnp.maximum(6.0, town.road_half_width * 1.8)
        straight_junc = d < junction_r + 2.0
    base = jnp.where(jnp.abs(dyaw) >= 0.15, turn,
                     jnp.where(straight_junc, 3, 0)).astype(jnp.int32)
    _, lane_cmd = ego_lane_change_plan(params, town, state)
    return jnp.where(lane_cmd > 0, lane_cmd, base)


def _route_index(town: TownMap, route, s):
    """Sample-point index of arclength ``s`` on ``route`` (uniform resampling
    makes this a multiply, same as route_point's i0; the ±1 chord correction
    is irrelevant at transfer-table resolution)."""
    n = town.routes.shape[1]
    total = town.route_total[route]
    return jnp.clip((jnp.mod(s, total) / total * n).astype(jnp.int32), 0, n - 1)


def _apply_route_transfers(params: SimParams, town: TownMap,
                           state: WorldState, mid: WorldState) -> WorldState:
    """Junction turn fans: re-roll which loop the ego (and optionally each
    traffic agent) follows among the routes running through its current
    position (town.transfer_* — see sim/town.py _build_transfer_table).

    A transfer is position-preserving: the target arclength lands on the same
    world point with the same heading, so dynamics, rendering, pure pursuit
    and the windowed arclength tracker all continue seamlessly — only the
    turn taken at the next junction changes. The within-segment offset of the
    source carries over (shared stretches are co-linear, locally metric).

    Decision cadence: the ego re-rolls a uniform slot of the K-wide fan every
    ``turn_period`` steps (an invalid slot means "stay" — so the stay
    probability scales with how few options the current stretch offers);
    agents roll with per-step probability ``agent_turn_prob``. All pure
    gathers + one PRNG draw; compiles out entirely when disabled."""
    nav = town.nav_slot is not None
    if town.transfer_route is None or (
            params.turn_period <= 0 and params.agent_turn_prob <= 0.0
            and not nav):
        return mid
    K = town.transfer_route.shape[-1]
    key = jax.random.fold_in(jax.random.fold_in(state.rng, 0x7F2B), state.t)
    k_slot, k_ag, k_agslot = jax.random.split(key, 3)
    out = mid
    if params.turn_period > 0 or nav:
        i = _route_index(town, mid.ego_route, mid.ego_s)
        slot = jax.random.randint(k_slot, (), 0, K)
        hit = (jnp.mod(mid.t, params.turn_period) == 0
               if params.turn_period > 0 else jnp.zeros((), bool))
        if nav:
            # goal navigation overrides the random turn re-roll: take the
            # planner's prescribed slot wherever its table says so
            # (sim/planner.py — every step, pure gathers)
            g = jnp.clip(mid.goal, 0, town.nav_slot.shape[0] - 1)
            nav_slot = town.nav_slot[g, mid.ego_route, i]
            nav_on = mid.goal >= 0
            slot = jnp.where(nav_on, jnp.maximum(nav_slot, 0), slot)
            hit = jnp.where(nav_on, nav_slot >= 0, hit)
        do = hit & town.transfer_valid[mid.ego_route, i, slot]
        new_route = town.transfer_route[mid.ego_route, i, slot]
        frac_off = jnp.mod(mid.ego_s, town.route_total[mid.ego_route]) \
            - town.route_arclen[mid.ego_route, i]
        new_s = jnp.mod(town.transfer_s[mid.ego_route, i, slot] + frac_off,
                        town.route_total[new_route])
        if nav:
            # monotone-descent gate: a nav transfer must STRICTLY reduce the
            # table distance at the node it actually LANDS on. The parent
            # tree is acyclic over graph nodes, but the runtime landing index
            # quantizes ±1 node off the graph target, which can compose
            # prescriptions into route-id ping-pongs between coincident
            # loops; requiring strict descent (the true parent edge saves
            # ≥ its hop cost; a bounce saves nothing) kills every cycle
            # while a needed transfer fires within a node's transit time.
            g = jnp.clip(mid.goal, 0, town.nav_slot.shape[0] - 1)
            i_new = _route_index(town, new_route, new_s)
            descent = (town.nav_dist[g, new_route, i_new]
                       < town.nav_dist[g, mid.ego_route, i])
            do &= jnp.where(mid.goal >= 0, descent, True)
        out = out.replace(
            ego_route=jnp.where(do, new_route, mid.ego_route),
            ego_s=jnp.where(do, new_s, mid.ego_s))
    if params.agent_turn_prob > 0.0:
        A = mid.agents_route.shape[0]
        ai = _route_index(town, mid.agents_route, mid.agents_s)  # broadcasts
        slots = jax.random.randint(k_agslot, (A,), 0, K)
        roll = jax.random.uniform(k_ag, (A,)) < params.agent_turn_prob
        do = roll & town.transfer_valid[mid.agents_route, ai, slots]
        new_route = town.transfer_route[mid.agents_route, ai, slots]
        frac_off = jnp.mod(mid.agents_s, town.route_total[mid.agents_route]) \
            - town.route_arclen[mid.agents_route, ai]
        new_s = jnp.mod(town.transfer_s[mid.agents_route, ai, slots] + frac_off,
                        town.route_total[new_route])
        out = out.replace(
            agents_route=jnp.where(do, new_route, mid.agents_route),
            agents_s=jnp.where(do, new_s, mid.agents_s))
    return out


def _nearest_s_update(town: TownMap, state: WorldState) -> jnp.ndarray:
    """Track the ego's arclength on its route by local search around ego_s
    (window search = fixed-size gather; no global argmin needed)."""
    route = state.ego_route
    total = town.route_total[route]
    offsets = jnp.linspace(-4.0, 8.0, 13)
    cand = jnp.mod(state.ego_s + offsets, total)
    pts = jax.vmap(lambda s: route_point(town, route, s)[0])(cand)
    d2 = jnp.sum((pts - state.ego_pos) ** 2, axis=-1)
    return cand[jnp.argmin(d2)]


def step_env(params: SimParams, town: TownMap, state: WorldState,
             control: VehicleControl, fresh: WorldState | None = None):
    """One sim tick → (new_state, info). Auto-resets on done.

    ``fresh`` optionally supplies the reset state (e.g. picked from a
    precomputed spawn pool — see make_batched_env); when None it is sampled
    here with the per-env PRNG (5 threefry splits per env per step, which
    dominates the fleet sim cost at scale)."""
    phases = agent_lib.light_phases(
        town, state.t.astype(jnp.float32) * params.dt,
        params.light_green, params.light_yellow, params.light_red)

    steer_cmd = jnp.clip(control.steer, -1.0, 1.0) * params.max_steer
    ego_pos, ego_yaw, ego_v, ego_steer = bicycle_step(
        state.ego_pos, state.ego_yaw, state.ego_v, state.ego_steer,
        steer_cmd, jnp.clip(control.throttle, 0.0, 1.0),
        jnp.clip(control.brake, 0.0, 1.0),
        dt=params.dt, wheelbase=params.wheelbase, max_accel=params.max_accel,
        max_brake=params.max_brake, drag=params.drag,
        tire_stiffness=params.tire_stiffness,
    )

    agents_route, agents_s, agents_v = agent_lib.step_agents(
        town, state.agents_route, state.agents_s, state.agents_v, phases,
        dt=params.dt, target_speed=params.agent_target_speed,
        ego_pos=state.ego_pos)
    agents_pos, agents_yaw = agent_lib.agent_positions(town, agents_route,
                                                       agents_s)

    peds_s, peds_phase = ped_lib.step_pedestrians(
        town, state.peds_crossing, state.peds_s, state.peds_phase,
        dt=params.dt, speed=params.ped_speed)
    peds_pos = ped_lib.ped_positions(town, state.peds_crossing, peds_s)

    if params.collision_model == "capsule":
        hl, vr = params.vehicle_half_len, params.vehicle_radius
        hit_vehicle = col.capsule_vehicle_collision(
            ego_pos, ego_yaw, agents_pos, agents_yaw, hl, vr)
        hit_building = col.capsule_building_collision(
            ego_pos, ego_yaw, hl, vr, town.buildings)
        hit_ped = col.capsule_point_collision(
            ego_pos, ego_yaw, hl, vr, peds_pos, ped_lib.PED_RADIUS)
    else:
        hit_vehicle = col.any_vehicle_collision(ego_pos, agents_pos,
                                                params.collision_radius)
        hit_building = col.any_building_collision(ego_pos, town.buildings,
                                                  params.collision_radius)
        hit_ped = jnp.any(col.circle_circle(
            ego_pos, params.collision_radius, peds_pos, ped_lib.PED_RADIUS))
    off = col.offroad(ego_pos, town.road_segments, town.road_half_width)
    collided = hit_vehicle | hit_building | hit_ped
    t_new = state.t + 1
    timeout = t_new >= params.episode_len
    arrived = jnp.zeros((), bool)
    unreachable = jnp.zeros((), bool)
    if town.nav_goals is not None:
        # goal navigation (sim/planner.py): reaching the goal point ends the
        # episode as a success. A spawn from which the goal is UNREACHABLE
        # (inf in the distance table — e.g. the perimeter loop, which shares
        # no lane line with the fan graph) ends immediately so the respawn
        # re-attempts from a connected spawn instead of orbiting forever.
        g = jnp.clip(state.goal, 0, town.nav_goals.shape[0] - 1)
        nav_on = state.goal >= 0
        arrived = nav_on & (
            jnp.linalg.norm(ego_pos - town.nav_goals[g])
            < params.arrive_radius)
        i = _route_index(town, state.ego_route, state.ego_s)
        unreachable = nav_on & ~jnp.isfinite(
            town.nav_dist[g, state.ego_route, i])
    done = collided | off | timeout | arrived | unreachable

    mid = WorldState(
        ego_pos=ego_pos, ego_yaw=ego_yaw, ego_v=ego_v, ego_steer=ego_steer,
        ego_route=state.ego_route, ego_s=state.ego_s,
        agents_route=agents_route, agents_s=agents_s, agents_v=agents_v,
        peds_crossing=state.peds_crossing, peds_s=peds_s, peds_phase=peds_phase,
        t=t_new, rng=state.rng, goal=state.goal,
    )
    mid = _apply_ego_lane_change(params, town, state, mid)
    mid = mid.replace(ego_s=_nearest_s_update(town, mid))
    mid = _apply_route_transfers(params, town, state, mid)

    # auto-reset: branchless select between continued and fresh state
    if fresh is None:
        reset_rng, next_rng = jax.random.split(jax.random.fold_in(state.rng, state.t))
        fresh = reset_env(params, town, reset_rng)
        fresh = fresh.replace(rng=next_rng)
    # the goal survives auto-resets: a goal-directed env re-attempts its
    # destination from the fresh spawn (free-roam envs keep −1)
    fresh = fresh.replace(goal=state.goal)
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(done, a, b), fresh, mid)  # done is scalar: broadcasts

    # Stop-line crossing on red: a non-green light that was AHEAD in the
    # ego's lane corridor before the step and is BEHIND after it — the car
    # actually drove through (CARLA leaderboard semantics). The older
    # exposure-edge proxy ((red ahead within 15 m) ∧ moving) charged the
    # expert a "violation" the instant a light turned while it was still
    # braking toward a clean stop — measured 3.3/km of phantom infractions.
    h_pre = jnp.stack([jnp.cos(state.ego_yaw), jnp.sin(state.ego_yaw)])
    l_pre = jnp.stack([-h_pre[1], h_pre[0]])
    h_post = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    rel_pre = town.lights_pos - state.ego_pos       # (L, 2)
    rel_post = town.lights_pos - ego_pos
    crossed = ((rel_pre @ h_pre) > 0.0) & ((rel_post @ h_post) <= 0.0) \
        & (jnp.abs(rel_pre @ l_pre) < 4.0) \
        & (jnp.linalg.norm(rel_pre, axis=-1) < 10.0)
    # RED only (round 5): a yellow-phase crossing is the legal dilemma-zone
    # case (a light can turn yellow inside the braking distance — CARLA's
    # leaderboard infraction is running a RED). Counting yellow charged the
    # braking expert ~0.1/km of phantom violations.
    ran_red = jnp.any(crossed & (phases == agent_lib.RED))

    info = {
        "collision": collided, "offroad": off, "timeout": timeout, "done": done,
        "speed": ego_v, "red_light": agent_lib.red_light_ahead(
            town, ego_pos, ego_yaw, phases, stop_distance=15.0),
        "ran_red": ran_red,
        "pedestrian": hit_ped, "arrived": arrived,
    }
    return new_state, info


def autopilot_control(params: SimParams, town: TownMap, state: WorldState
                      ) -> VehicleControl:
    """Expert: pure pursuit along the ego's route + discrete CARLA-like pedals.

    Pedal values are restricted to the (throttle, brake) pairs the reference's
    discretizer understands — (1,0), (0.5,0), (0,1) — so logged expert actions
    discretize losslessly (imitation_dataset.py:330-333 table).

    Longitudinal safety mirrors the CARLA autopilot that produced the
    reference's training logs (imitation_dataset.py:96-110): stop for red
    lights and crossing pedestrians, keep time-headway to any vehicle in the
    forward lane corridor (``headway_gap`` + ``headway_ttc``·v — covers both
    the same-route leader and cross-route traffic at junctions), yield to
    vehicles already inside the junction being approached (first-come
    right-of-way, the same rule sim/agents.py gives the scripted traffic),
    and cap cruise speed through curves (``turn_speed``).
    """
    lookahead = jnp.maximum(4.0, 0.8 * state.ego_v)
    target_pos, _ = route_point(town, state.ego_route, state.ego_s + lookahead)
    rel = target_pos - state.ego_pos
    # angle to target in body frame
    alpha = jnp.arctan2(rel[1], rel[0]) - state.ego_yaw
    alpha = jnp.mod(alpha + jnp.pi, 2 * jnp.pi) - jnp.pi
    ld = jnp.linalg.norm(rel) + 1e-6
    steer_angle = jnp.arctan2(2.0 * params.wheelbase * jnp.sin(alpha), ld)
    steer = jnp.clip(steer_angle / params.max_steer, -1.0, 1.0)

    phases = agent_lib.light_phases(
        town, state.t.astype(jnp.float32) * params.dt,
        params.light_green, params.light_yellow, params.light_red)
    must_stop = agent_lib.red_light_ahead(town, state.ego_pos, state.ego_yaw,
                                          phases, stop_distance=15.0)
    if params.n_pedestrians > 0:  # static: no-op branch when walkers are off
        peds_pos = ped_lib.ped_positions(town, state.peds_crossing, state.peds_s)
        # sidewalk strollers (path id >= n_crossings) never enter the roadway
        # — only crosswalk-mode walkers may trigger braking
        on_crossing = state.peds_crossing < town.crossings.shape[0]
        must_stop |= ped_lib.pedestrian_ahead(state.ego_pos, state.ego_yaw,
                                              peds_pos, mask=on_crossing)

    if (params.headway_gap > 0.0 or params.yield_gap > 0.0) \
            and state.agents_s.shape[0] > 0:
        heading = jnp.stack([jnp.cos(state.ego_yaw), jnp.sin(state.ego_yaw)])
        left = jnp.stack([-heading[1], heading[0]])
        agents_pos, _ = agent_lib.agent_positions(
            town, state.agents_route, state.agents_s)
        if params.headway_gap > 0.0:
            # lead-vehicle time-headway braking: any vehicle inside the
            # forward corridor within gap + ttc·v meters (body frame, so it
            # catches same-route leaders AND crossing traffic in front)
            rel = agents_pos - state.ego_pos            # (A, 2)
            fwd = rel @ heading
            lat = rel @ left
            watch = params.headway_gap + params.headway_ttc * state.ego_v
            lead = (fwd > 0.0) & (fwd < watch) \
                & (jnp.abs(lat) < params.headway_corridor)
            must_stop |= jnp.any(lead)
        if params.yield_gap > 0.0 and town.junctions.shape[0] > 0:
            # first-come junction right-of-way (the cross-route conflict
            # rule lights don't cover): while approaching the junction
            # ahead, wait for any vehicle already inside its disc
            d_all = jnp.linalg.norm(town.junctions - state.ego_pos, axis=-1)
            jidx = jnp.argmin(d_all)
            d_junc = d_all[jidx]
            junction_r = jnp.maximum(6.0, town.road_half_width * 1.8)
            ahead = ((town.junctions[jidx] - state.ego_pos) @ heading) > 0.0
            approaching = (d_junc >= junction_r) \
                & (d_junc < junction_r + params.yield_gap) & ahead
            d_agents = jnp.linalg.norm(
                agents_pos - town.junctions[jidx], axis=-1)
            occupied = jnp.any(d_agents < junction_r)
            # entry-conflict tie-break (round 5): two vehicles entering an
            # EMPTY junction simultaneously both pass the occupancy test and
            # meet inside — the dominant expert crash mode on the junction-
            # dense A→B towns (61 crashes / 114 attempts, r4
            # reports/route_quality.json). While approaching, also yield to
            # any agent approaching the same junction that is strictly
            # closer to it; agents don't reciprocate (they yield only on
            # occupancy, sim/agents.py), so no mutual-yield deadlock.
            rival = jnp.any((d_agents >= junction_r)
                            & (d_agents < junction_r + params.yield_gap)
                            & (d_agents < d_junc - 0.5))
            must_stop |= approaching & (occupied | rival)

    cruise = params.target_speed
    if params.turn_speed > 0.0:
        # slow-for-turn: cap cruise while the route heading swings over the
        # pursuit horizon (route curvature the controller already queries)
        _, yaw_near = route_point(town, state.ego_route, state.ego_s + 3.0)
        _, yaw_far = route_point(town, state.ego_route, state.ego_s + 13.0)
        dyaw = jnp.mod(yaw_far - yaw_near + jnp.pi, 2 * jnp.pi) - jnp.pi
        cruise = jnp.where(jnp.abs(dyaw) >= 0.15, params.turn_speed, cruise)
    err = cruise - state.ego_v
    throttle = jnp.where(err > 1.0, 1.0, jnp.where(err > -0.5, 0.5, 0.0))
    brake = jnp.where(err <= -0.5, 1.0, 0.0)
    throttle = jnp.where(must_stop, 0.0, throttle)
    brake = jnp.where(must_stop, 1.0, brake)
    return VehicleControl(steer=steer, throttle=throttle, brake=brake)


def sensor_vector(params: SimParams, state: WorldState) -> jnp.ndarray:
    """(3,) = (current_steer, speed_long, speed) — the reference's sensor
    contract (imitation_dataset.py:159-160)."""
    beta = jnp.arctan(0.5 * jnp.tan(state.ego_steer))
    return jnp.stack([
        state.ego_steer / params.max_steer,
        state.ego_v * jnp.cos(beta),
        state.ego_v,
    ])


def traffic_light_state(params: SimParams, town: TownMap, state: WorldState):
    """() int32 — 1 when a red/yellow light blocks the ego (state.csv
    'trafficlight' column semantics)."""
    phases = agent_lib.light_phases(
        town, state.t.astype(jnp.float32) * params.dt,
        params.light_green, params.light_yellow, params.light_red)
    return agent_lib.red_light_ahead(town, state.ego_pos, state.ego_yaw, phases,
                                     stop_distance=15.0).astype(jnp.int32)


def make_spawn_pool(params: SimParams, town: TownMap, rng, size: int = 1024
                    ) -> WorldState:
    """Precomputed reset states; auto-resets gather from this pool instead of
    re-running the PRNG-heavy reset_env every step."""
    return jax.vmap(lambda k: reset_env(params, town, k))(jax.random.split(rng, size))


def pick_fresh(pool: WorldState, state: WorldState) -> WorldState:
    """Deterministic per-env, per-episode pool pick (pure gather, no PRNG)."""
    size = pool.t.shape[0]
    salt = state.rng[..., 0].astype(jnp.uint32) if state.rng.ndim else state.rng
    idx = (salt + state.t.astype(jnp.uint32)) % jnp.uint32(size)
    return jax.tree_util.tree_map(lambda a: a[idx], pool)


def pack_spawn_pool(pool: WorldState):
    """Pack a spawn pool into ONE (size, D) f32 matrix (+ unpack metadata).

    ``pick_fresh`` gathers ~14 separate leaves per env per step; packing
    turns the pick into a SINGLE row gather (non-f32 leaves are bitcast —
    all WorldState leaves are 32-bit). → (packed, metas, treedef) for
    ``pick_fresh_packed``."""
    leaves, treedef = jax.tree_util.tree_flatten(pool)
    cols, metas = [], []
    for leaf in leaves:
        flat = leaf.reshape(leaf.shape[0], -1)
        metas.append((leaf.dtype, leaf.shape[1:], flat.shape[1]))
        if flat.dtype != jnp.float32:
            flat = jax.lax.bitcast_convert_type(flat, jnp.float32)
        cols.append(flat)
    return jnp.concatenate(cols, axis=1), metas, treedef


def pick_fresh_packed(packed, metas, treedef, state: WorldState) -> WorldState:
    """pick_fresh over a packed pool: one row gather + free slicing/bitcasts."""
    size = packed.shape[0]
    salt = state.rng[..., 0].astype(jnp.uint32) if state.rng.ndim else state.rng
    idx = (salt + state.t.astype(jnp.uint32)) % jnp.uint32(size)
    row = packed[idx]
    leaves, off = [], 0
    for dtype, shape, width in metas:
        piece = row[off:off + width]
        off += width
        if dtype != jnp.float32:
            piece = jax.lax.bitcast_convert_type(piece, dtype)
        leaves.append(piece.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_batched_env(params: SimParams, town: TownMap, spawn_pool: int = 0):
    """vmapped reset/step closures over the env axis (shard with NamedSharding
    on the leading dim for multi-chip fleets). ``spawn_pool > 0`` enables the
    pooled fast reset path."""
    pool = (make_spawn_pool(params, town, jax.random.PRNGKey(0x5EED), spawn_pool)
            if spawn_pool else None)

    def reset_batch(rng, n_envs: int):
        return jax.vmap(lambda k: reset_env(params, town, k))(
            jax.random.split(rng, n_envs))

    def step_batch(states: WorldState, controls: VehicleControl):
        if pool is None:
            return jax.vmap(lambda s, c: step_env(params, town, s, c))(states, controls)
        fresh = jax.vmap(lambda s: pick_fresh(pool, s))(states)
        return jax.vmap(lambda s, c, f: step_env(params, town, s, c, f))(
            states, controls, fresh)

    return reset_batch, step_batch
