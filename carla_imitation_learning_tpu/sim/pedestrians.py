"""Scripted pedestrians: crosswalk + sidewalk walkers.

The reference system's CARLA server populates towns with walker actors; this
is the TPU-native equivalent, built like the traffic agents (sim/agents.py):
a pedestrian's pose is a PURE function of (path index, normalized arclength),
so stepping a fleet of walkers is a gather + lerp with no per-walker control
flow.

Two walker modes share one flat state, selected by the path id: ids below
``town.crossings.shape[0]`` ping-pong across that crosswalk at walking speed,
pausing at the curb between crossings; higher ids stroll around sidewalk loop
``id − n_crossings`` (town.sidewalks), wrapping forever in one direction.
State per walker is just (path id, s ∈ [0,1], phase counter); everything
vmaps/scans.

Disabled by default (``SimParams.n_pedestrians = 0``): zero-length walker
arrays flow through every op (render/collision/step) at zero cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.sim.town import TownMap

WALK_SPEED = 1.4      # m/s, nominal adult walking pace
CURB_WAIT_S = 3.0     # pause at each end before re-crossing
PED_RADIUS = 0.4      # collision half-width


def _sidewalk_point(town: TownMap, loop: jnp.ndarray, s: jnp.ndarray
                    ) -> jnp.ndarray:
    """(P,) sidewalk loop ids + (P,) s∈[0,1) → (P,2). Loops are uniformly
    resampled, so s maps LINEARLY to the point index — one gather + lerp."""
    n = town.sidewalks.shape[1]
    f = jnp.mod(s, 1.0) * n
    i0 = jnp.clip(f.astype(jnp.int32), 0, n - 1)
    i1 = (i0 + 1) % n
    p0 = town.sidewalks[loop, i0]
    p1 = town.sidewalks[loop, i1]
    return p0 + (f - i0)[:, None] * (p1 - p0)


def ped_positions(town: TownMap, path: jnp.ndarray, s: jnp.ndarray
                  ) -> jnp.ndarray:
    """(P,) path ids + (P,) s∈[0,1] → (P,2) world positions (lerp).

    Path ids < n_crossings are crosswalk walkers; the rest stroll sidewalk
    loop ``path − n_crossings``."""
    n_cross = town.crossings.shape[0]
    on_side = path >= n_cross
    segs = town.crossings[jnp.minimum(path, n_cross - 1)]  # (P, 2, 2)
    cross_pos = segs[:, 0] + s[:, None] * (segs[:, 1] - segs[:, 0])
    n_loops = town.sidewalks.shape[0]
    side_pos = _sidewalk_point(
        town, jnp.clip(path - n_cross, 0, n_loops - 1), s)
    return jnp.where(on_side[:, None], side_pos, cross_pos)


def step_pedestrians(
    town: TownMap,
    path: jnp.ndarray,      # (P,) int32 path ids (see module docstring)
    s: jnp.ndarray,         # (P,) in [0,1]
    phase: jnp.ndarray,     # (P,) f32: >0 walking dir +1, <0 dir −1,
                            #            magnitude ≤1 → waiting (counts up)
    dt: float,
    speed: float = WALK_SPEED,
):
    """One fleet step → (s, phase). Crosswalk walkers ping-pong with curb
    pauses; sidewalk walkers wrap around their loop, never pausing.

    ``phase`` encodes direction and waiting in one float so the state stays a
    flat array: |phase| ≥ 1 means walking with sign(phase) direction; |phase|
    < 1 means waiting at a curb, phase decays toward ±1 over CURB_WAIT_S.
    """
    n_cross = town.crossings.shape[0]
    on_side = path >= n_cross
    seg = town.crossings[jnp.minimum(path, n_cross - 1)]
    cross_len = jnp.linalg.norm(seg[:, 1] - seg[:, 0], axis=-1)
    n_loops = town.sidewalks.shape[0]
    side_len = town.sidewalk_total[jnp.clip(path - n_cross, 0, n_loops - 1)]
    length = jnp.where(on_side, side_len, cross_len) + 1e-6
    walking = jnp.abs(phase) >= 1.0
    direction = jnp.sign(phase)
    ds = jnp.where(walking, direction * speed * dt / length, 0.0)
    s_new = s + ds
    hit_end = walking & ~on_side & ((s_new >= 1.0) | (s_new <= 0.0))
    s_new = jnp.where(on_side, jnp.mod(s_new, 1.0), jnp.clip(s_new, 0.0, 1.0))
    # reaching a crosswalk end → start waiting with reversed pending
    # direction; the counter starts at the BOTTOM of the waiting band (eps)
    # so it takes CURB_WAIT_S/dt steps to climb back to |phase| = 1 and
    # resume walking
    eps = min(dt / CURB_WAIT_S, 1.0)
    phase_new = jnp.where(hit_end, -direction * eps, phase)
    # waiting walkers count |phase| up toward 1, then resume
    waiting = ~walking
    phase_new = jnp.where(
        waiting, jnp.sign(phase_new) * jnp.minimum(jnp.abs(phase_new) + eps, 1.0),
        phase_new)
    return s_new, phase_new


def spawn_pedestrians(town: TownMap, rng, n_peds: int,
                      sidewalk_frac: float = 0.0):
    """→ (path (P,), s (P,), phase (P,)) random walkers. P may be 0.

    ``sidewalk_frac`` of the walkers (in expectation) stroll sidewalk loops
    instead of working a crosswalk; 0 keeps the historical all-crosswalk
    behavior."""
    kc, ks, kd, km, kl = jax.random.split(rng, 5)
    n_cross = town.crossings.shape[0]
    n_loops = town.sidewalks.shape[0]
    path = jax.random.randint(kc, (n_peds,), 0, n_cross)
    if sidewalk_frac > 0.0 and n_loops > 0:
        loop = jax.random.randint(kl, (n_peds,), n_cross, n_cross + n_loops)
        stroller = jax.random.bernoulli(km, sidewalk_frac, (n_peds,))
        path = jnp.where(stroller, loop, path)
    s = jax.random.uniform(ks, (n_peds,))
    direction = jnp.where(jax.random.bernoulli(kd, 0.5, (n_peds,)), 1.0, -1.0)
    return path, s, direction  # start walking (|phase| = 1)


def pedestrian_ahead(ego_pos, ego_yaw, peds_pos, stop_distance: float = 12.0,
                     half_width: float = 4.0, mask: jnp.ndarray | None = None):
    """True when any walker is inside the braking corridor: within
    ``stop_distance`` ahead of the ego AND within ``half_width`` laterally.
    ``mask`` (P,) restricts which walkers count (the autopilot passes the
    crosswalk-mode mask — sidewalk strollers never enter the roadway and must
    not trigger braking). Zero walkers → False (jnp.any over an empty axis)."""
    rel = peds_pos - ego_pos  # (P,2)
    heading = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    lateral = jnp.stack([-heading[1], heading[0]])
    fwd = rel @ heading
    side = jnp.abs(rel @ lateral)
    hit = (fwd > 0.0) & (fwd < stop_distance) & (side < half_width)
    if mask is not None:
        hit &= mask
    return jnp.any(hit)
