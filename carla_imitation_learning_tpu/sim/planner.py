"""Global A→B route planner — CARLA's GlobalRoutePlanner, TPU-first.

CARLA's planner (`agents.navigation.GlobalRoutePlanner`) runs a host-side A*
over the road topology PER QUERY and hands the agent a waypoint list to
consume step-by-step. Here planning splits the TPU way:

- **host side, once per (town, goal set)**: Dijkstra over the quantized
  (route, sample point) graph — R·P nodes, follow edges (r,p)→(r,p+1)
  weighted by segment length plus the town's position-preserving turn-fan
  transfers (sim/town.py ``_build_transfer_table``) as ~zero-cost edges —
  baking the ENTIRE shortest-path policy into static device tables:
  ``nav_slot (G, R, P)`` ("take turn-fan slot k here", −1 = stay) and
  ``nav_dist (G, R, P)`` (meters to goal g from node (r, p)).
- **device side, every step**: the sim consults the tables with pure gathers
  (sim/world.py ``_apply_route_transfers``): an env whose ``WorldState.goal``
  is ≥ 0 deterministically takes the slot its table prescribes. No per-step
  host round-trips, no dynamic shapes — a whole fleet with per-env goals
  costs one extra (G, R, P) gather per step.

Because transfers are position-preserving route REWRITES, everything
downstream composes for free: the pure-pursuit autopilot follows the
rewritten route (the expert drives to the goal), ``navigation_command``
announces the planner's turns from the new route's geometry (CIL commands
stay truthful), and arrival (within ``SimParams.arrive_radius`` of the goal
point) ends the episode as a success (``info["arrived"]``).

Ties between staying and transferring prefer staying; mutually-transferable
equal-distance stretches (0-cost cycles) can flap the route id between two
coincident loops for a few steps — harmless at the wheels (the loops are
geometrically identical there) and self-resolving as the car advances.
"""

from __future__ import annotations

import heapq

import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.sim.town import TownMap

_EPS = 0.5  # meters a transfer must strictly save before it is prescribed
# Tiny positive cost per transfer hop: Dijkstra then minimizes hops among
# equal-length paths, so no optimal path ever hops A→B→A — mutual ("ping
# pong") prescriptions between coincident loops are impossible by
# construction, even under the ±1-node landing quantization of a runtime
# transfer. Small enough (vs _EPS) never to change which PATHS are optimal.
_HOP_COST = 0.01


def nearest_node(town: TownMap, xy) -> tuple[int, int]:
    """(route, point-index) of the route sample point nearest ``xy``."""
    routes = np.asarray(town.routes)  # (R, P, 2)
    d2 = np.sum((routes - np.asarray(xy, np.float64)) ** 2, axis=-1)
    r, p = np.unravel_index(int(np.argmin(d2)), d2.shape)
    return int(r), int(p)


def _reverse_adjacency(town: TownMap):
    """Reverse-edge lists for Dijkstra-from-goal. Returns (rev, R, P) where
    rev[v] = list of (u, w, slot): forward edge u→v with weight w; slot is
    the turn-fan slot realizing the edge (−1 = the follow edge)."""
    routes = np.asarray(town.routes)
    R, P, _ = routes.shape
    seg_len = np.linalg.norm(np.roll(routes, -1, axis=1) - routes, axis=-1)
    total = np.asarray(town.route_total)
    rev: list[list[tuple[int, float, int]]] = [[] for _ in range(R * P)]
    for r in range(R):
        for p in range(P):
            u = r * P + p
            rev[r * P + (p + 1) % P].append((u, float(seg_len[r, p]), -1))
    if town.transfer_route is not None:
        tr = np.asarray(town.transfer_route)
        ts = np.asarray(town.transfer_s)
        tv = np.asarray(town.transfer_valid)
        for r in range(R):
            for p in range(P):
                u = r * P + p
                for k in range(tr.shape[-1]):
                    if not tv[r, p, k]:
                        continue
                    rr = int(tr[r, p, k])
                    pp = int(round(ts[r, p, k] / total[rr] * P)) % P
                    # position-preserving: ~free; node quantization (±half a
                    # segment) is absorbed by the parent-tree prescription
                    rev[rr * P + pp].append((u, _HOP_COST, k))
    return rev, R, P


def _dijkstra_to(town: TownMap, goal_xy, goal_tol: float = 2.0):
    """(dist (R, P), slot (R, P)) for one goal: meters-to-goal per node
    (np.inf = unreachable) and the turn-fan slot of each node's OPTIMAL
    outgoing edge straight from the Dijkstra parent tree (−1 = follow the
    current route). Parent edges form a tree — following prescriptions can
    never cycle, unlike recomputed per-node cost comparisons, which node
    quantization can turn into 0-net-progress transfer loops. Nodes whose
    follow edge is within ``_EPS`` of optimal are downgraded to stay (−1):
    only REQUIRED turns are prescribed, so the route id never flaps between
    coincident equal-cost loops (which destabilizes pure pursuit).

    Goal nodes are ALL sample points within ``goal_tol`` of the goal point
    (coincident loops share the spot) plus the single nearest node."""
    rev, R, P = _reverse_adjacency(town)
    routes = np.asarray(town.routes).reshape(R * P, 2)
    d0 = np.linalg.norm(routes - np.asarray(goal_xy, np.float64), axis=-1)
    sources = set(np.nonzero(d0 < goal_tol)[0].tolist())
    sources.add(int(np.argmin(d0)))
    dist = np.full(R * P, np.inf)
    slot = np.full(R * P, -1, np.int64)
    heap = []
    for s in sources:
        dist[s] = 0.0
        heapq.heappush(heap, (0.0, s))
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist[v]:
            continue
        for u, w, k in rev[v]:
            nd = d + w
            if nd < dist[u]:
                dist[u] = nd
                slot[u] = k
                heapq.heappush(heap, (nd, u))
    # prefer staying wherever the follow edge is (near-)optimal too
    dist2, slot2 = dist.reshape(R, P), slot.reshape(R, P)
    pts = np.asarray(town.routes)
    seg_len = np.linalg.norm(np.roll(pts, -1, axis=1) - pts, axis=-1)
    follow_cost = seg_len + np.roll(dist2, -1, axis=1)
    follow_ok = follow_cost <= dist2 + _EPS
    slot2[follow_ok & np.isfinite(dist2)] = -1
    return dist2, slot2.astype(np.int32)


def _widen_back(town: TownMap, slot: np.ndarray) -> None:
    """Fire each prescribed transfer at the EARLIEST coincident node
    (in place). The parent tree prescribes a required turn at the last
    beneficial node — right at the junction corner, where a route rewrite
    yanks the pure-pursuit lookahead mid-turn (measured: off-road crashes
    clustered at transfer corners). The two loops are geometrically
    coincident along the whole shared stretch, so prescribing the SAME
    target route at every earlier stretch node is semantically identical and
    lets the car settle onto the new loop long before the corner. The
    runtime's strict-descent gate still blocks any widened back-transfer
    (descending into the source costs the hop margin)."""
    if town.transfer_route is None:
        return
    tr = np.asarray(town.transfer_route)
    tv = np.asarray(town.transfer_valid)
    P = slot.shape[1]
    for r, p in zip(*np.nonzero(slot >= 0)):
        target = tr[r, p, slot[r, p]]
        q = (int(p) - 1) % P
        for _ in range(P - 1):
            if slot[r, q] != -1:
                break
            ks = np.nonzero(tv[r, q] & (tr[r, q] == target))[0]
            if ks.size == 0:
                break
            slot[r, q] = ks[0]
            q = (q - 1) % P


def plan_to_goals(town: TownMap, goals_xy,
                  goal_tol: float | None = None) -> TownMap:
    """Bake shortest-path navigation tables for ``goals_xy`` (G, 2) into the
    town: returns ``town.replace(nav_slot=(G,R,P) int32, nav_dist=(G,R,P)
    f32, nav_goals=(G,2) f32)``. An env with ``WorldState.goal = g`` then
    navigates to ``goals_xy[g]`` deterministically; ``goal = −1`` keeps the
    free-roam behavior bit-for-bit.

    ``goal_tol`` defaults to LANE-AWARE: 2.0 + lane_width·(lanes−1), so a
    goal is reachable from ANY same-direction lane. With the bare 2.0 m
    tolerance on a 2-lane town, every second-lane node had nav_dist=∞
    (adjacent lane centers sit 3.5 m from the goal point) — measured 52% of
    all nodes — and a scripted lane change mid-route killed the episode as
    "unreachable" (999 of 1069 expert A→B attempts, r4 route_quality under
    the old default). SimParams.arrive_radius (4.0) already accepts arrival
    from the adjacent lane."""
    if goal_tol is None:
        goal_tol = 2.0 + float(town.lane_width) * (int(town.lanes) - 1)
    goals = np.atleast_2d(np.asarray(goals_xy, np.float32))
    slots, dists = [], []
    for g in goals:
        dist, slot = _dijkstra_to(town, g, goal_tol)
        _widen_back(town, slot)
        slots.append(slot)
        dists.append(dist.astype(np.float32))
    return town.replace(
        nav_slot=jnp.asarray(np.stack(slots)),
        nav_dist=jnp.asarray(np.stack(dists)),
        nav_goals=jnp.asarray(goals),
    )


def sample_goals(town: TownMap, rng: np.random.Generator | int,
                 n_goals: int, margin: float = 0.8) -> np.ndarray:
    """(G, 2) goal points drawn from route sample points (always reachable
    spots), spread by farthest-point selection so goals don't cluster."""
    rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
    pts = np.asarray(town.routes).reshape(-1, 2)
    if town.transfer_valid is not None:
        # prefer points on SHARED stretches (any turn-fan option): those are
        # reachable from many routes, so every spawn can navigate to them
        shared = np.asarray(town.transfer_valid).any(-1).reshape(-1)
        if shared.any():
            pts = pts[shared]
    lim = float(np.asarray(town.extent)) * margin
    inside = np.all(np.abs(pts) < lim, axis=-1)
    if inside.any():
        pts = pts[inside]
    goals = [pts[int(rng.integers(len(pts)))]]
    for _ in range(n_goals - 1):
        d2 = np.min(np.sum((pts[:, None] - np.asarray(goals)[None]) ** 2,
                           axis=-1), axis=-1)
        goals.append(pts[int(np.argmax(d2))])
    return np.asarray(goals, np.float32)
