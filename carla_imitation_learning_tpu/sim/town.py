"""Procedural town: grid road network, lane-offset loop routes, buildings,
traffic lights. Generated host-side with numpy ONCE (static geometry), then
lives on device as a fixed-shape pytree shared by all envs.

Conventions: world is z-up, ground plane z=0, distances in meters, yaw in
radians (0 = +x). Right-hand traffic: route loops run counterclockwise around
blocks offset to the right lane.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


class TownMap(struct.PyTreeNode):
    # Routes: (R, P, 2) closed-loop lane-center polylines, uniformly resampled;
    # (R, P) per-point cumulative arclength; (R,) total loop length.
    routes: jnp.ndarray
    route_arclen: jnp.ndarray
    route_total: jnp.ndarray
    # Buildings: (B, 5) = cx, cy, half_w, half_h, height (axis-aligned boxes).
    buildings: jnp.ndarray
    # Traffic lights: (L, 2) positions at intersections; (L,) phase offsets s.
    lights_pos: jnp.ndarray
    lights_offset: jnp.ndarray
    # Road segments for off-road checks + rendering: (S, 4) = x0, y0, x1, y1.
    road_segments: jnp.ndarray
    road_half_width: jnp.ndarray  # scalar
    extent: jnp.ndarray  # scalar: half-size of the town square
    # Crosswalks for pedestrians: (C, 2, 2) = endpoint pairs spanning a road
    # next to an intersection (sim/pedestrians.py walks these back and forth).
    crossings: jnp.ndarray
    # Junction centers (grid nodes), (J, 2) — agents yield right-of-way here.
    junctions: jnp.ndarray
    # Sidewalk loops for strolling walkers: (K, SP, 2) closed polylines,
    # uniformly resampled (position at normalized s is a pure gather+lerp),
    # one per block just off the roadway; (K,) loop lengths in meters.
    sidewalks: jnp.ndarray
    sidewalk_total: jnp.ndarray
    # Lanes per direction (static): route r is lane r % lanes of grid cell
    # r // lanes; lanes > 1 enables agent lane changes (sim/agents.py).
    lanes: int = struct.field(pytree_node=False, default=1)
    # Lane-center spacing in meters (static): successive same-direction lane
    # loops sit this far apart; goal planning must accept goals reachable
    # from ANY lane (sim/planner.plan_to_goals auto goal_tol).
    lane_width: float = struct.field(pytree_node=False, default=3.5)
    # Junction turn fans (make_town(turn_fans=True), else None): at sample
    # point p of route r, up to K OTHER routes whose polyline runs through the
    # same world point with the same heading (shared lane-line stretches —
    # block loop vs super-block vs L-loop vs perimeter). Taking slot k
    # rewrites (route, s) -> (transfer_route[r,p,k], transfer_s[r,p,k]):
    # position-preserving by construction, only the turn taken at the next
    # junction changes. (R, P, K) int32 / f32 / bool.
    transfer_route: jnp.ndarray | None = None
    transfer_s: jnp.ndarray | None = None
    transfer_valid: jnp.ndarray | None = None
    # Goal navigation tables (sim/planner.py plan_to_goals, else None):
    # for goal g at node (route r, sample point p), nav_slot[g,r,p] is the
    # turn-fan slot to take (−1 = stay), nav_dist[g,r,p] the meters to goal,
    # nav_goals[g] the goal point. Consulted per step by pure gathers for
    # envs with WorldState.goal >= 0 (sim/world.py _apply_route_transfers).
    nav_slot: jnp.ndarray | None = None
    nav_dist: jnp.ndarray | None = None
    nav_goals: jnp.ndarray | None = None

    @property
    def n_routes(self) -> int:
        return self.routes.shape[0]

    @property
    def n_lights(self) -> int:
        return self.lights_pos.shape[0]


def _round_corners(corners: np.ndarray, radius: float,
                   pts_per_corner: int = 6) -> np.ndarray:
    """Fillet every corner of a closed polygon with a circular arc.

    Each vertex B (between neighbours P, N) is replaced by ``pts_per_corner``
    points on the tangent arc of radius ≤ ``radius`` (clamped so adjacent
    fillets never overlap). Gives CARLA-style curved intersection turns while
    keeping routes plain polylines — route_point() stays a pure gather+lerp,
    nothing downstream changes."""
    K = corners.shape[0]
    out = []
    for i in range(K):
        P, B, N = corners[(i - 1) % K], corners[i], corners[(i + 1) % K]
        u = (P - B) / (np.linalg.norm(P - B) + 1e-12)
        v = (N - B) / (np.linalg.norm(N - B) + 1e-12)
        cosang = np.clip(u @ v, -1.0, 1.0)
        theta = np.arccos(cosang)
        if theta < 1e-3 or theta > np.pi - 1e-3:  # straight/degenerate corner
            out.append(B)
            continue
        max_t = 0.4 * min(np.linalg.norm(P - B), np.linalg.norm(N - B))
        r = min(radius, max_t * np.tan(theta / 2.0))
        t = r / np.tan(theta / 2.0)
        T1, T2 = B + u * t, B + v * t
        center = B + (u + v) / (np.linalg.norm(u + v) + 1e-12) * (r / np.sin(theta / 2.0))
        a1 = np.arctan2(*(T1 - center)[::-1])
        a2 = np.arctan2(*(T2 - center)[::-1])
        da = (a2 - a1 + np.pi) % (2 * np.pi) - np.pi  # short way around
        for k in range(pts_per_corner):
            a = a1 + da * k / (pts_per_corner - 1)
            out.append(center + r * np.array([np.cos(a), np.sin(a)]))
    return np.asarray(out)


def _resample_loop(corners: np.ndarray, n_points: int) -> np.ndarray:
    """Uniformly resample a closed polygon (corners (K,2)) to n_points."""
    pts = np.concatenate([corners, corners[:1]], axis=0)
    seg = np.diff(pts, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    s = np.linspace(0.0, total, n_points, endpoint=False)
    idx = np.searchsorted(cum, s, side="right") - 1
    idx = np.clip(idx, 0, len(seg) - 1)
    frac = (s - cum[idx]) / np.maximum(seg_len[idx], 1e-9)
    return pts[idx] + frac[:, None] * seg[idx]


def _build_transfer_table(routes: np.ndarray, arclen: np.ndarray,
                          total: np.ndarray, K: int = 4, tol: float = 0.8,
                          tangent_min: float = 0.95):
    """Junction turn-fan table: for every sample point of every route, the
    other routes whose polyline passes through that point with the same
    heading.

    Two loops that share a lane line (same right-lane offset, same travel
    direction — e.g. a block loop and the super-block or L-loop covering that
    cell) are geometrically coincident along the shared stretch; swapping
    which loop the vehicle FOLLOWS there is invisible at the wheels and only
    changes the turn taken at the next junction. Candidates are matched by
    point-to-SEGMENT perpendicular distance (< ``tol`` m) — sample points of
    different loops never line up, the lane lines do — plus a tangent
    alignment test that rejects the opposite-direction lane of adjacent
    blocks. ``transfer_s`` is the exact projected arclength on the target.

    Host-side numpy, runs once per town build; the result is three static
    (R, P, K) device tables read by pure gathers (sim/world.py
    ``_apply_route_transfers``)."""
    R, P, _ = routes.shape
    seg = np.roll(routes, -1, axis=1) - routes            # (R, P, 2)
    seg_len = np.linalg.norm(seg, axis=-1)                # (R, P)
    tang = seg / np.maximum(seg_len, 1e-9)[..., None]
    tr = np.zeros((R, P, K), np.int32)
    ts = np.zeros((R, P, K), np.float32)
    tv = np.zeros((R, P, K), bool)
    flat_start = routes.reshape(R * P, 2)
    flat_tang = tang.reshape(R * P, 2)
    flat_len = seg_len.reshape(R * P)
    rough = float(np.max(seg_len)) + tol  # start-point cull radius
    for r in range(R):
        pts = routes[r]
        d0 = np.linalg.norm(pts[:, None] - flat_start[None], axis=-1)
        dot = tang[r] @ flat_tang.T
        cand_mask = (d0 < rough) & (dot > tangent_min)
        cand_mask[:, r * P:(r + 1) * P] = False           # never self
        for p in range(P):
            cand = np.nonzero(cand_mask[p])[0]
            if cand.size == 0:
                continue
            off = pts[p] - flat_start[cand]               # (C, 2)
            proj = np.einsum("cd,cd->c", off, flat_tang[cand])
            inside = (proj >= -0.25) & (proj <= flat_len[cand] + 0.25)
            perp = np.linalg.norm(
                off - proj[:, None] * flat_tang[cand], axis=-1)
            good = inside & (perp < tol)
            cand, proj, perp = cand[good], proj[good], perp[good]
            if cand.size == 0:
                continue
            seen, k = set(), 0
            for idx in np.argsort(perp):                  # nearest line first
                rr, pp = divmod(int(cand[idx]), P)
                if rr in seen or k >= K:
                    continue
                seen.add(rr)
                tr[r, p, k] = rr
                ts[r, p, k] = (arclen[rr, pp] + max(float(proj[idx]), 0.0)) \
                    % total[rr]
                tv[r, p, k] = True
                k += 1
    return tr, ts, tv


def make_town(
    blocks: int = 3,
    block_size: float = 80.0,
    lane_width: float = 3.5,
    n_buildings: int = 24,
    n_lights: int = 8,
    route_points: int = 128,
    seed: int = 0,
    corner_radius: float = 0.0,
    lanes_per_direction: int = 1,
    superblocks: bool = False,
    turn_fans: bool = False,
) -> TownMap:
    """Build a (blocks×blocks)-block grid town.

    Routes: ``lanes_per_direction`` counterclockwise loops per block at
    successive right-lane offsets, plus the same count of perimeter loops —
    fixed count R = lanes·(blocks² + 1), each resampled to ``route_points``
    points so route-following is a pure gather. Lane k of grid cell g is
    route ``g·lanes + k`` with k = 0 INNERMOST (smallest offset) — the
    driver's right lane on block loops (offset inward) and the driver's
    LEFT lane on the perimeter (offset outward); agents.step_agents handles
    the flip when choosing overtaking lanes.
    ``superblocks=True`` adds loops around every 2×1/1×2 cell pair and every
    L-shaped 3-cell union (between the single-block groups and the perimeter,
    preserving the group order contract). A super-block's long sides pass
    STRAIGHT through the grid node they straddle, and an L-loop's concave
    corner is a RIGHT turn at a junction — the route geometries behind the
    CIL 'straight' (3) and 'right' (2) navigation commands, which plain CCW
    block loops (always turning left at every node they touch) can never
    produce. Every added edge coincides with an existing lane line in the
    same travel direction, so traffic stays consistent.
    ``corner_radius > 0`` fillets every route corner with a circular arc
    (curved intersection turns: smooth steering targets for the autopilot and
    smooth vehicle trajectories; stays within the junction pavement).
    ``turn_fans=True`` builds the route-transfer table (junction turn fans —
    ``_build_transfer_table``): vehicles can re-roll which loop they follow
    wherever loops share a lane line, turning the fixed-loop network into a
    route GRAPH with genuine per-junction turn decisions. Meaningful with
    ``superblocks=True`` (plain block loops share no same-direction edges).
    """
    rng = np.random.default_rng(seed)
    size = blocks * block_size
    half_lane = lane_width / 2.0
    lanes = max(1, int(lanes_per_direction))

    # --- routes ---------------------------------------------------------
    loops = []

    def rect_loop(x0, y0, x1, y1, o):
        """CCW rectangle offset INWARD by o (right-hand traffic)."""
        return np.array([
            [x0 + o, y0 + o], [x1 - o, y0 + o],
            [x1 - o, y1 - o], [x0 + o, y1 - o],
        ])

    for bi in range(blocks):
        for bj in range(blocks):
            x0, y0 = bi * block_size, bj * block_size
            # loops around the block, offset by half a lane + k lane widths
            # (lane 0 rightmost for CCW traffic)
            for k in range(lanes):
                loops.append(rect_loop(x0, y0, x0 + block_size, y0 + block_size,
                                       half_lane + k * lane_width))
    if superblocks and blocks > 1:
        for bi in range(blocks - 1):   # horizontal 2×1 pairs
            for bj in range(blocks):
                x0, y0 = bi * block_size, bj * block_size
                for k in range(lanes):
                    loops.append(rect_loop(x0, y0, x0 + 2 * block_size,
                                           y0 + block_size,
                                           half_lane + k * lane_width))
        for bi in range(blocks):       # vertical 1×2 pairs
            for bj in range(blocks - 1):
                x0, y0 = bi * block_size, bj * block_size
                for k in range(lanes):
                    loops.append(rect_loop(x0, y0, x0 + block_size,
                                           y0 + 2 * block_size,
                                           half_lane + k * lane_width))
        for bi in range(blocks - 1):   # L-shaped 3-cell unions: cells
            for bj in range(blocks - 1):   # (bi,bj)+(bi+1,bj)+(bi+1,bj+1)
                x0, x1, x2 = (bi * block_size, (bi + 1) * block_size,
                              (bi + 2) * block_size)
                y0, y1, y2 = (bj * block_size, (bj + 1) * block_size,
                              (bj + 2) * block_size)
                for k in range(lanes):
                    o = half_lane + k * lane_width
                    # CCW inward-offset L outline; the concave corner at
                    # (x1+o, y1−o) turns RIGHT through junction (x1, y1)
                    loops.append(np.array([
                        [x0 + o, y0 + o], [x2 - o, y0 + o],
                        [x2 - o, y2 - o], [x1 + o, y2 - o],
                        [x1 + o, y1 - o], [x0 + o, y1 - o],
                    ]))
    for k in range(lanes):  # outer perimeter loops (CCW, offset outward)
        o = half_lane + k * lane_width
        loops.append(np.array([
            [-o, -o], [size + o, -o], [size + o, size + o], [-o, size + o],
        ]))
    if corner_radius > 0.0:
        loops = [_round_corners(c, corner_radius) for c in loops]
    routes = np.stack([_resample_loop(c, route_points) for c in loops])  # (R,P,2)
    diffs = np.diff(np.concatenate([routes, routes[:, :1]], axis=1), axis=1)
    seg_len = np.linalg.norm(diffs, axis=-1)  # (R,P)
    arclen = np.concatenate([np.zeros((routes.shape[0], 1)),
                             np.cumsum(seg_len, axis=1)[:, :-1]], axis=1)
    total = seg_len.sum(axis=1)

    # --- buildings -------------------------------------------------------
    margin = lanes * lane_width + 2.0  # keep facades off the (wider) roads
    bpb = max(1, -(-n_buildings // (blocks * blocks)))  # ceil; trimmed below
    buildings = []
    for bi in range(blocks):
        for bj in range(blocks):
            x0, y0 = bi * block_size + margin, bj * block_size + margin
            x1, y1 = (bi + 1) * block_size - margin, (bj + 1) * block_size - margin
            for _ in range(bpb):
                hw = rng.uniform(4.0, 12.0)
                hh = rng.uniform(4.0, 12.0)
                cx = rng.uniform(x0 + hw, max(x0 + hw, x1 - hw))
                cy = rng.uniform(y0 + hh, max(y0 + hh, y1 - hh))
                height = rng.uniform(6.0, 25.0)
                buildings.append([cx, cy, hw, hh, height])
    buildings = np.array(buildings[:n_buildings] or [[0, 0, 0, 0, 0]], dtype=np.float32)

    # --- lights at interior intersections ---------------------------------
    nodes = [(i * block_size, j * block_size)
             for i in range(1, blocks) for j in range(1, blocks)]
    if not nodes:  # degenerate 1-block town: corners
        nodes = [(0.0, 0.0)]
    nodes = (nodes * ((n_lights // len(nodes)) + 1))[:n_lights]
    lights_pos = np.array(nodes, dtype=np.float32)
    lights_offset = rng.uniform(0.0, 16.0, size=len(nodes)).astype(np.float32)

    # --- road segments (grid edges) ---------------------------------------
    segs = []
    for i in range(blocks + 1):
        c = i * block_size
        segs.append([0.0, c, size, c])   # horizontal
        segs.append([c, 0.0, c, size])   # vertical
    road_segments = np.array(segs, dtype=np.float32)

    # --- crosswalks: two per interior intersection (across the vertical and
    # across the horizontal road, offset from the junction center) -----------
    w = lanes * lane_width + 0.5  # span the full road (both directions) + curb
    off = lanes * lane_width + 2.5
    cross = []
    xnodes = [(i * block_size, j * block_size)
              for i in range(1, blocks) for j in range(1, blocks)] or [(0.0, 0.0)]
    for (cx, cy) in xnodes:
        cross.append([[cx - w, cy + off], [cx + w, cy + off]])  # over vertical rd
        cross.append([[cx + off, cy - w], [cx + off, cy + w]])  # over horizontal
    crossings = np.array(cross, dtype=np.float32)

    # --- sidewalk loops: one per block, 1.2 m beyond the roadway edge --------
    side_off = lanes * lane_width + 1.2
    side_loops = []
    for bi in range(blocks):
        for bj in range(blocks):
            x0, y0 = bi * block_size, bj * block_size
            side_loops.append(_resample_loop(
                rect_loop(x0, y0, x0 + block_size, y0 + block_size, side_off),
                64))
    sidewalks = np.stack(side_loops).astype(np.float32)  # (K, 64, 2)
    side_d = np.diff(np.concatenate([sidewalks, sidewalks[:, :1]], axis=1),
                     axis=1)
    sidewalk_total = np.linalg.norm(side_d, axis=-1).sum(axis=1)

    transfers = {}
    if turn_fans:
        tr, ts_, tv = _build_transfer_table(routes, arclen, total)
        transfers = dict(
            transfer_route=jnp.asarray(tr, jnp.int32),
            transfer_s=jnp.asarray(ts_, jnp.float32),
            transfer_valid=jnp.asarray(tv),
        )
    return TownMap(
        routes=jnp.asarray(routes, jnp.float32),
        route_arclen=jnp.asarray(arclen, jnp.float32),
        route_total=jnp.asarray(total, jnp.float32),
        buildings=jnp.asarray(buildings, jnp.float32),
        lights_pos=jnp.asarray(lights_pos, jnp.float32),
        lights_offset=jnp.asarray(lights_offset, jnp.float32),
        road_segments=jnp.asarray(road_segments, jnp.float32),
        # half-road = lanes-per-direction lane widths (one direction's lanes)
        road_half_width=jnp.float32(lanes * lane_width),
        lane_width=float(lane_width),
        extent=jnp.float32(size / 2.0),
        crossings=jnp.asarray(crossings, jnp.float32),
        sidewalks=jnp.asarray(sidewalks, jnp.float32),
        sidewalk_total=jnp.asarray(sidewalk_total, jnp.float32),
        junctions=jnp.asarray(
            [[i * block_size, j * block_size]
             for i in range(blocks + 1) for j in range(blocks + 1)],
            jnp.float32),
        lanes=lanes,
        **transfers,
    )


def town_kwargs_from_cfg(cfg, seed: int = 0) -> dict:
    """The ``make_town`` kwargs a config implies — recorded verbatim into
    episode records (training/replay.py) so a replay rebuilds the identical
    town."""
    t = cfg.sim.town
    return dict(
        blocks=int(t.blocks), block_size=float(t.block_size),
        lane_width=float(t.lane_width), n_buildings=int(t.n_buildings),
        n_lights=int(cfg.sim.n_lights), seed=seed,
        corner_radius=float(t.get("corner_radius", 0.0)),
        lanes_per_direction=int(t.get("lanes_per_direction", 1)),
        superblocks=bool(t.get("superblocks", False)),
        turn_fans=bool(t.get("turn_fans", False)),
    )


def make_town_from_cfg(cfg, seed: int = 0) -> TownMap:
    return make_town(**town_kwargs_from_cfg(cfg, seed))


def route_point(town: TownMap, route_idx, s):
    """Position + tangent yaw on route ``route_idx`` at arclength ``s``
    (wrapped). Pure gathers — vmap/jit friendly.

    Routes are uniformly resampled, so the segment index is ~s/total·P; chord
    shortening at polygon corners perturbs it by at most one segment, which a
    branchless ±1 correction fixes. This replaces a binary-search
    (searchsorted) per query — the sim fleet issues ~30 queries/env/step.

    All table reads are DIRECT 2-D element gathers (``table[r, i]``): the
    earlier row-gather form (``pts = routes[r]`` then ``pts[i]``) staged a
    full (P, 2) row per query — ~1.5 KB/env/call × ~30 calls/env/step of
    pure gather traffic the elements never needed (round-3 sim ablation)."""
    total = town.route_total[route_idx]
    s = jnp.mod(s, total)
    n = town.routes.shape[1]
    i0 = jnp.clip((s / total * n).astype(jnp.int32), 0, n - 1)
    # correct to the true bracketing segment: arclen[i] <= s < arclen[i+1]
    up = (i0 + 1 < n) & (s >= town.route_arclen[route_idx,
                                                jnp.minimum(i0 + 1, n - 1)])
    down = s < town.route_arclen[route_idx, i0]
    i = jnp.clip(i0 + up.astype(jnp.int32) - down.astype(jnp.int32), 0, n - 1)
    nxt = (i + 1) % n
    p0 = town.routes[route_idx, i]
    p1 = town.routes[route_idx, nxt]
    seg = p1 - p0
    seg_len = jnp.linalg.norm(seg) + 1e-9
    frac = jnp.clip((s - town.route_arclen[route_idx, i]) / seg_len, 0.0, 1.0)
    pos = p0 + frac * seg
    yaw = jnp.arctan2(seg[1], seg[0])
    return pos, yaw


def mirror_town(town: TownMap) -> TownMap:
    """The town reflected about the y-axis (x → −x) — every LEFT turn
    becomes a genuine RIGHT turn.

    ``make_town`` builds exclusively counterclockwise loops (left turns at
    every grid node; the only native rights are L-loop concave corners), so
    goal-directed collection starves the CIL right-turn branch (measured:
    66 of 51,200 frames — reports/route_quality.json r3). Reflection is the
    exact fix: a global isometry that flips turn handedness wholesale while
    preserving every relationship the sim depends on — arclengths, lane
    offsets, transfer-table coincidences (still position-preserving, same
    (r, p, k) indices), junction discs, and baked nav tables (the Dijkstra
    graph is pure topology + lengths, both invariant; only the goal POINTS
    move, to their mirrored positions). Collection mixed half/half across
    ``town`` and ``mirror_town(town)`` covers both turn directions with real
    rendered frames — the CIL paper's hflip trick, done in-world so labels,
    commands, and pixels stay mutually consistent by construction.

    Equivalent of: CARLA ships paired mirrored maps (Town01/Town01_Opt etc.
    differ in layout; the flip-augmentation lineage is imitation-learning
    standard practice).
    """

    def _neg_x(a, col: int = 0):
        if a is None:
            return None
        a = jnp.asarray(a)
        return a.at[..., col].multiply(-1.0 if jnp.issubdtype(
            a.dtype, jnp.floating) else -1)

    segs = None
    if town.road_segments is not None and town.road_segments.size:
        segs = town.road_segments.at[:, 0].multiply(-1.0).at[:, 2].multiply(-1.0)
    return town.replace(
        routes=_neg_x(town.routes),
        buildings=_neg_x(town.buildings),          # col 0 = cx
        lights_pos=_neg_x(town.lights_pos),
        road_segments=segs,
        crossings=_neg_x(town.crossings),
        junctions=_neg_x(town.junctions),
        sidewalks=_neg_x(town.sidewalks),
        nav_goals=_neg_x(town.nav_goals),
    )
