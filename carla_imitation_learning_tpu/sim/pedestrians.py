"""Scripted pedestrians: crosswalk walkers.

The reference system's CARLA server populates towns with walker actors; this
is the TPU-native equivalent, built like the traffic agents (sim/agents.py):
a pedestrian's pose is a PURE function of (crossing index, normalized
arclength), so stepping a fleet of walkers is a gather + lerp with no
per-walker control flow.

Each walker ping-pongs along one crosswalk segment (town.crossings) at
walking speed, pausing at the curb between crossings. State per walker is
just (crossing id, s ∈ [0,1], phase counter); everything vmaps/scans.

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


def ped_positions(town: TownMap, crossing: jnp.ndarray, s: jnp.ndarray
                  ) -> jnp.ndarray:
    """(P,) crossing ids + (P,) s∈[0,1] → (P,2) world positions (lerp)."""
    segs = town.crossings[crossing]          # (P, 2, 2)
    return segs[:, 0] + s[:, None] * (segs[:, 1] - segs[:, 0])


def step_pedestrians(
    town: TownMap,
    crossing: jnp.ndarray,  # (P,) int32
    s: jnp.ndarray,         # (P,) in [0,1]
    phase: jnp.ndarray,     # (P,) f32: >0 walking dir +1, <0 dir −1,
                            #            magnitude ≤1 → waiting (counts up)
    dt: float,
    speed: float = WALK_SPEED,
):
    """One fleet step → (s, phase). Ping-pong with curb pauses.

    ``phase`` encodes direction and waiting in one float so the state stays a
    flat array: |phase| ≥ 1 means walking with sign(phase) direction; |phase|
    < 1 means waiting at a curb, phase decays toward ±1 over CURB_WAIT_S.
    """
    seg = town.crossings[crossing]
    length = jnp.linalg.norm(seg[:, 1] - seg[:, 0], axis=-1) + 1e-6
    walking = jnp.abs(phase) >= 1.0
    direction = jnp.sign(phase)
    ds = jnp.where(walking, direction * speed * dt / length, 0.0)
    s_new = s + ds
    hit_end = walking & ((s_new >= 1.0) | (s_new <= 0.0))
    s_new = jnp.clip(s_new, 0.0, 1.0)
    # reaching an end → start waiting with reversed pending direction; the
    # counter starts at the BOTTOM of the waiting band (eps) so it takes
    # CURB_WAIT_S/dt steps to climb back to |phase| = 1 and resume walking
    eps = min(dt / CURB_WAIT_S, 1.0)
    phase_new = jnp.where(hit_end, -direction * eps, phase)
    # waiting walkers count |phase| up toward 1, then resume
    waiting = ~walking
    phase_new = jnp.where(
        waiting, jnp.sign(phase_new) * jnp.minimum(jnp.abs(phase_new) + eps, 1.0),
        phase_new)
    return s_new, phase_new


def spawn_pedestrians(town: TownMap, rng, n_peds: int):
    """→ (crossing (P,), s (P,), phase (P,)) random walkers. P may be 0."""
    kc, ks, kd = jax.random.split(rng, 3)
    n_cross = town.crossings.shape[0]
    crossing = jax.random.randint(kc, (n_peds,), 0, n_cross)
    s = jax.random.uniform(ks, (n_peds,))
    direction = jnp.where(jax.random.bernoulli(kd, 0.5, (n_peds,)), 1.0, -1.0)
    return crossing, s, direction  # start walking (|phase| = 1)


def pedestrian_ahead(ego_pos, ego_yaw, peds_pos, stop_distance: float = 12.0,
                     half_width: float = 4.0):
    """True when any walker is inside the braking corridor: within
    ``stop_distance`` ahead of the ego AND within ``half_width`` laterally.
    Zero walkers → False (jnp.any over an empty axis)."""
    rel = peds_pos - ego_pos  # (P,2)
    heading = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    lateral = jnp.stack([-heading[1], heading[0]])
    fwd = rel @ heading
    side = jnp.abs(rel @ lateral)
    return jnp.any((fwd > 0.0) & (fwd < stop_distance) & (side < half_width))
