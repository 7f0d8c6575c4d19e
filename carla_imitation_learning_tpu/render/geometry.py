"""Scene assembly: town + world state → fixed-size triangle buffers.

All buffers are FIXED SHAPE (padded with degenerate triangles) so the whole
render composes under jit/vmap/scan. Static geometry (ground, roads,
buildings, light poles) is built once per town; per-step dynamics add traffic
vehicles and phase-colored light heads.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from carla_imitation_learning_tpu.sim.town import TownMap

# Semantic classes (CARLA-like reduced set)
(SEM_SKY, SEM_TERRAIN, SEM_ROAD, SEM_BUILDING, SEM_VEHICLE, SEM_LIGHT,
 SEM_PEDESTRIAN, SEM_ROADLINE) = 0, 1, 2, 3, 4, 5, 6, 7

SEMANTIC_PALETTE = np.array([
    [70, 130, 180],   # sky
    [107, 142, 35],   # terrain
    [128, 64, 128],   # road
    [70, 70, 70],     # building
    [0, 0, 142],      # vehicle
    [250, 170, 30],   # traffic light
    [220, 20, 60],    # pedestrian (CARLA's walker crimson)
    [157, 234, 50],   # road line (lane markings / crosswalk stripes)
], dtype=np.float32) / 255.0


class StaticScene(struct.PyTreeNode):
    tris: jnp.ndarray    # (Ts, 3, 3) world-space vertices
    colors: jnp.ndarray  # (Ts, 3) RGB in [0,1]
    classes: jnp.ndarray  # (Ts,) int32 semantic ids


def _quad(p0, p1, p2, p3) -> list:
    """Two triangles for quad p0-p1-p2-p3 (in order)."""
    return [[p0, p1, p2], [p0, p2, p3]]


def _box_tris(cx, cy, hw, hh, z0, z1) -> list:
    """Axis-aligned box: 4 walls + roof (10 triangles). Floor omitted."""
    x0, x1, y0, y1 = cx - hw, cx + hw, cy - hh, cy + hh
    c = lambda x, y, z: [x, y, z]  # noqa: E731
    tris = []
    tris += _quad(c(x0, y0, z0), c(x1, y0, z0), c(x1, y0, z1), c(x0, y0, z1))  # south
    tris += _quad(c(x1, y0, z0), c(x1, y1, z0), c(x1, y1, z1), c(x1, y0, z1))  # east
    tris += _quad(c(x1, y1, z0), c(x0, y1, z0), c(x0, y1, z1), c(x1, y1, z1))  # north
    tris += _quad(c(x0, y1, z0), c(x0, y0, z0), c(x0, y0, z1), c(x0, y1, z1))  # west
    tris += _quad(c(x0, y0, z1), c(x1, y0, z1), c(x1, y1, z1), c(x0, y1, z1))  # roof
    return tris


VEHICLE_TRIS = 10  # box walls + roof
LIGHT_HEAD_TRIS = 2
PED_TRIS = 10      # slim box walls + cap


def _box_tris_banded(cx, cy, hw, hh, z0, z1, bands: int) -> list:
    """Box walls split into ``bands`` vertical stripes (window floors) + roof."""
    zs = np.linspace(z0, z1, bands + 1)
    tris = []
    for lo, hi in zip(zs[:-1], zs[1:]):
        tris += _box_tris(cx, cy, hw, hh, lo, hi)[:8]  # walls only
    tris += _box_tris(cx, cy, hw, hh, z0, z1)[8:]      # single roof
    return tris


MARKING_Z = 0.004  # above the road plane (0.0), below blob shadows (0.01)
_MARK_WHITE = np.array([0.85, 0.85, 0.85], np.float32)   # dashes / zebra
_MARK_YELLOW = np.array([0.80, 0.70, 0.20], np.float32)  # center divider


def _line_quads(a: np.ndarray, b: np.ndarray, half_w: float,
                z: float = MARKING_Z) -> list:
    """Two triangles for a flat stripe of half-width ``half_w`` from a to b."""
    d = b - a
    n = np.array([-d[1], d[0]])
    n = n / (np.linalg.norm(n) + 1e-9) * half_w
    return _quad([a[0] - n[0], a[1] - n[1], z], [b[0] - n[0], b[1] - n[1], z],
                 [b[0] + n[0], b[1] + n[1], z], [a[0] + n[0], a[1] + n[1], z])


def _marking_geometry(town: TownMap, dash_period: float = 16.0,
                      dash_len: float = 3.0):
    """Lane markings as flat quads just above the road plane (host numpy).

    CARLA towns carry a RoadLine semantic class and visible paint; this is
    the equivalent for the procedural grid town:
      - a solid yellow center line per road segment (separates the travel
        directions),
      - dashed white lane dividers at every lane boundary when
        ``town.lanes > 1`` (one dash of ``dash_len`` meters every
        ``dash_period``),
      - white zebra stripes along every crosswalk span (the same spans
        sim/pedestrians.py walks).
    Returns (tris list, colors list). All quads carry SEM_ROADLINE but keep
    their VISUAL paint color — the semantic plane and the RGB/gray planes
    tell consistent, different stories, exactly like CARLA's cameras."""
    tris, colors = [], []

    def add(quads, color):
        for t in quads:
            tris.append(t)
            colors.append(color)

    lane_w = float(town.road_half_width) / max(1, town.lanes)
    for seg in np.asarray(town.road_segments):
        a, b = np.array(seg[:2]), np.array(seg[2:])
        d = b - a
        length = float(np.linalg.norm(d))
        u = d / (length + 1e-9)
        n = np.array([-u[1], u[0]])
        add(_line_quads(a, b, 0.12), _MARK_YELLOW)  # solid center line
        for k in range(1, town.lanes):              # dashed lane dividers
            for side in (-1.0, 1.0):
                off = side * k * lane_w * n
                s = dash_period * 0.5
                while s + dash_len < length:
                    add(_line_quads(a + off + u * s, a + off + u * (s + dash_len),
                                    0.10), _MARK_WHITE)
                    s += dash_period
    for cr in np.asarray(town.crossings):           # zebra stripes
        a, b = cr[0], cr[1]
        d = b - a
        span = float(np.linalg.norm(d))
        u = d / (span + 1e-9)
        v = np.array([-u[1], u[0]])                  # travel direction
        n_stripes = max(2, int(span / 1.2))
        for i in range(n_stripes):
            c = a + u * ((i + 0.5) / n_stripes * span)
            add(_line_quads(c - v * 1.25, c + v * 1.25, 0.30), _MARK_WHITE)
    return tris, colors


def build_static_scene(town: TownMap, seed: int = 0,
                       facade_bands: int = 0,
                       markings: bool = False) -> StaticScene:
    """Host-side (numpy) static scene build — runs once per town.

    ``facade_bands > 0`` splits building walls into that many alternating
    dark/light horizontal stripes (window floors) — richer policy inputs at
    ~(8·bands − 6) extra triangles per building (CARLA-style facade texture,
    done with geometry so every backend shades it identically).
    ``markings=True`` paints lane markings + zebra crosswalks
    (SEM_ROADLINE quads; see _marking_geometry)."""
    rng = np.random.default_rng(seed)
    size = 2.0 * float(town.extent)
    tris, colors, classes = [], [], []

    def add(t_list, color, cls, per_face_shade=True):
        for i, t in enumerate(t_list):
            tris.append(t)
            shade = 1.0 if not per_face_shade else 0.8 + 0.2 * ((i // 2) % 3) / 2.0
            colors.append(np.asarray(color) * shade)
            classes.append(cls)

    # ground plane (slightly below road to avoid z-fighting)
    m = size  # extend one town-size beyond the edges
    g = -0.02
    add(_quad([-m, -m, g], [size + m, -m, g], [size + m, size + m, g], [-m, size + m, g]),
        SEMANTIC_PALETTE[SEM_TERRAIN], SEM_TERRAIN, per_face_shade=False)

    # roads: one long quad per grid segment
    hwid = float(town.road_half_width)
    for seg in np.asarray(town.road_segments):
        x0, y0, x1, y1 = seg
        d = np.array([x1 - x0, y1 - y0])
        n = np.array([-d[1], d[0]])
        n = n / (np.linalg.norm(n) + 1e-9) * hwid
        add(_quad([x0 - n[0], y0 - n[1], 0.0], [x1 - n[0], y1 - n[1], 0.0],
                  [x1 + n[0], y1 + n[1], 0.0], [x0 + n[0], y0 + n[1], 0.0]),
            SEMANTIC_PALETTE[SEM_ROAD], SEM_ROAD, per_face_shade=False)

    # buildings
    for b in np.asarray(town.buildings):
        cx, cy, hw, hh, h = b
        tone = rng.uniform(0.6, 1.2)
        if facade_bands > 0:
            t_list = _box_tris_banded(cx, cy, hw, hh, 0.0, h, facade_bands)
            for i, t in enumerate(t_list):
                band = (i // 8) if i < 8 * facade_bands else facade_bands
                # alternate window-floor (dark) / wall (light) stripes
                stripe = 0.55 if band % 2 == 1 and band < facade_bands else 1.0
                shade = 0.8 + 0.2 * ((i // 2) % 3) / 2.0
                tris.append(t)
                colors.append(np.asarray(SEMANTIC_PALETTE[SEM_BUILDING])
                              * tone * stripe * shade)
                classes.append(SEM_BUILDING)
        else:
            add(_box_tris(cx, cy, hw, hh, 0.0, h),
                SEMANTIC_PALETTE[SEM_BUILDING] * tone, SEM_BUILDING)

    if markings:
        m_tris, m_colors = _marking_geometry(town)
        for t, c in zip(m_tris, m_colors):
            tris.append(t)
            colors.append(c)
            classes.append(SEM_ROADLINE)

    # light poles (heads are dynamic — colored by phase at render time)
    for lp in np.asarray(town.lights_pos):
        x, y = lp
        add(_quad([x - 0.15, y, 0.0], [x + 0.15, y, 0.0],
                  [x + 0.15, y, 4.5], [x - 0.15, y, 4.5]),
            np.array([0.3, 0.3, 0.3]), SEM_LIGHT, per_face_shade=False)

    return StaticScene(
        tris=jnp.asarray(np.array(tris, np.float32)),
        colors=jnp.asarray(np.clip(np.array(colors, np.float32), 0, 1)),
        classes=jnp.asarray(np.array(classes, np.int32)),
    )


def _unit_vehicle_box() -> np.ndarray:
    """(VEHICLE_TRIS, 3, 3) box for a 4.5×2.0×1.5 m vehicle centered at origin,
    front along +x."""
    return np.array(_box_tris(0.0, 0.0, 2.25, 1.0, 0.05, 1.55), np.float32)


_UNIT_VEHICLE = _unit_vehicle_box()

_LIGHT_PHASE_COLORS = np.array([
    [0.1, 0.9, 0.1],  # green
    [0.95, 0.8, 0.1],  # yellow
    [0.9, 0.1, 0.1],  # red
], dtype=np.float32)


def vehicle_triangles(pos: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """(A,2) pos + (A,) yaw → (A·10, 3, 3) world triangles (batched rotate)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)  # (A,2,2)
    base = jnp.asarray(_UNIT_VEHICLE)  # (10,3,3)
    xy = jnp.einsum("aij,tvj->atvi", rot, base[..., :2])  # (A,10,3,2)
    xy = xy + pos[:, None, None, :]
    z = jnp.broadcast_to(base[..., 2:], xy.shape[:-1] + (1,))
    return jnp.concatenate([xy, z], axis=-1).reshape(-1, 3, 3)


def _unit_ped_box() -> np.ndarray:
    """(PED_TRIS, 3, 3) slim 0.5 × 0.5 × 1.8 m box for a walker."""
    return np.array(_box_tris(0.0, 0.0, 0.25, 0.25, 0.0, 1.8), np.float32)


_UNIT_PED = _unit_ped_box()


def pedestrian_triangles(pos: jnp.ndarray) -> jnp.ndarray:
    """(P, 2) walker positions → (P·10, 3, 3) world triangles (translate
    only — walkers render orientation-free)."""
    base = jnp.asarray(_UNIT_PED)  # (10, 3, 3)
    xy = base[None, ..., :2] + pos[:, None, None, :]
    z = jnp.broadcast_to(base[None, ..., 2:], xy.shape[:-1] + (1,))
    return jnp.concatenate([xy, z], axis=-1).reshape(-1, 3, 3)


def light_head_triangles(lights_pos: jnp.ndarray, phases: jnp.ndarray):
    """(L,2) + (L,) phase → ((L·2,3,3) tris, (L·2,3) colors) emissive heads."""
    x, y = lights_pos[:, 0], lights_pos[:, 1]
    r = 0.45
    v0 = jnp.stack([x - r, y, jnp.full_like(x, 4.5)], -1)
    v1 = jnp.stack([x + r, y, jnp.full_like(x, 4.5)], -1)
    v2 = jnp.stack([x + r, y, jnp.full_like(x, 5.4)], -1)
    v3 = jnp.stack([x - r, y, jnp.full_like(x, 5.4)], -1)
    t0 = jnp.stack([v0, v1, v2], axis=1)
    t1 = jnp.stack([v0, v2, v3], axis=1)
    # pair-adjacent (q0t0, q0t1, q1t0, ...): the fast rasterizer fuses
    # even/odd coplanar triangle pairs into single quad primitives
    tris = jnp.stack([t0, t1], axis=1).reshape(-1, 3, 3)  # (2L,3,3)
    col = jnp.asarray(_LIGHT_PHASE_COLORS)[phases]  # (L,3)
    colors = jnp.repeat(col, 2, axis=0)
    return tris, colors


SHADOW_Z = 0.01  # just above the road, below every occupant
SHADOW_TONE = jnp.asarray([0.25, 0.25, 0.27])
# Penumbra ring: a wider, lighter quad UNDER the core (z slightly lower, so
# the core wins the depth test where they overlap and only the rim shows) —
# a two-tier gradient edge, the cheap version of soft shadows (+2 tris each).
PENUMBRA_Z = 0.008
PENUMBRA_TONE = jnp.asarray([0.47, 0.47, 0.50])
PENUMBRA_SCALE = 1.5


def _shadow_quads(pos: jnp.ndarray, yaw: jnp.ndarray,
                  half_len: float, half_wid: float,
                  scale: float = 1.15, z: float = SHADOW_Z) -> jnp.ndarray:
    """(A,2) + (A,) → (A·2, 3, 3) dark ground quads under rotated footprints
    (blob shadows: flat contact shadows, the cheap 90% of shadow realism)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    local = jnp.asarray([[half_len, half_wid], [-half_len, half_wid],
                         [-half_len, -half_wid], [half_len, -half_wid]]) * scale
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    corners = jnp.einsum("aij,kj->aki", rot, local) + pos[:, None, :]  # (A,4,2)
    zc = jnp.full(corners.shape[:-1] + (1,), z)
    p = jnp.concatenate([corners, zc], axis=-1)  # (A,4,3)
    t0 = jnp.stack([p[:, 0], p[:, 1], p[:, 2]], axis=1)
    t1 = jnp.stack([p[:, 0], p[:, 2], p[:, 3]], axis=1)
    # pair-adjacent for quad fusion (see light_head_triangles)
    return jnp.stack([t0, t1], axis=1).reshape(-1, 3, 3)


def assemble_scene(
    static: StaticScene,
    lights_pos: jnp.ndarray,
    phases: jnp.ndarray,
    agents_pos: jnp.ndarray,
    agents_yaw: jnp.ndarray,
    max_triangles: int,
    peds_pos: jnp.ndarray | None = None,
    shadows: bool = False,
):
    """→ (tris (T,3,3), colors (T,3), classes (T,)) padded/truncated to T.

    ``shadows=True`` adds blob contact shadows under vehicles (and walkers):
    dark quads at z=0.01 carrying SEM_ROAD so the semantic plane stays clean.
    """
    veh = vehicle_triangles(agents_pos, agents_yaw)
    lh_tris, lh_col = light_head_triangles(lights_pos, phases)
    parts_t = [static.tris, veh, lh_tris]
    parts_c = [
        static.colors,
        jnp.tile(jnp.asarray(SEMANTIC_PALETTE[SEM_VEHICLE]), (veh.shape[0], 1)),
        lh_col,
    ]
    parts_k = [
        static.classes,
        jnp.full((veh.shape[0],), SEM_VEHICLE, jnp.int32),
        jnp.full((lh_tris.shape[0],), SEM_LIGHT, jnp.int32),
    ]
    if peds_pos is not None and peds_pos.shape[0] > 0:
        ped = pedestrian_triangles(peds_pos)
        parts_t.append(ped)
        parts_c.append(jnp.tile(jnp.asarray(SEMANTIC_PALETTE[SEM_PEDESTRIAN]),
                                (ped.shape[0], 1)))
        parts_k.append(jnp.full((ped.shape[0],), SEM_PEDESTRIAN, jnp.int32))
    if shadows:
        ped_yaw = (jnp.zeros(peds_pos.shape[0])
                   if peds_pos is not None and peds_pos.shape[0] > 0 else None)
        for scale, z, tone in ((1.15, SHADOW_Z, SHADOW_TONE),
                               (PENUMBRA_SCALE, PENUMBRA_Z, PENUMBRA_TONE)):
            sh = [_shadow_quads(agents_pos, agents_yaw, 2.25, 1.0,
                                scale=scale, z=z)]
            if ped_yaw is not None:
                sh.append(_shadow_quads(peds_pos, ped_yaw, 0.25, 0.25,
                                        scale=scale, z=z))
            sh = jnp.concatenate(sh, axis=0)
            parts_t.append(sh)
            parts_c.append(jnp.tile(tone, (sh.shape[0], 1)))
            parts_k.append(jnp.full((sh.shape[0],), SEM_ROAD, jnp.int32))
    tris = jnp.concatenate(parts_t, axis=0)
    colors = jnp.concatenate(parts_c, axis=0)
    classes = jnp.concatenate(parts_k, axis=0)
    n = tris.shape[0]
    if n > max_triangles:
        raise ValueError(f"scene has {n} triangles > max_triangles={max_triangles}")
    pad = max_triangles - n
    tris = jnp.pad(tris, ((0, pad), (0, 0), (0, 0)))
    colors = jnp.pad(colors, ((0, pad), (0, 0)))
    classes = jnp.pad(classes, ((0, pad),))
    return tris, colors, classes
