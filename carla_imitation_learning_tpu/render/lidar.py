"""LIDAR: planar range scans by exact 2-D ray casting.

The reference system's CARLA server offered a ray-cast LIDAR sensor next to
the cameras; this is the TPU-native equivalent. The simulated world is 2.5-D
(buildings and vehicles are vertical boxes), so a horizontal scan at sensor
height is EXACT ray-segment intersection in the plane — one broadcasted
(beams × segments) solve, no sampling of the camera depth buffer and no
dependence on camera FOV. Everything is fixed-shape and fuses under
jit/vmap/scan, so adding a 360-beam scan to a fleet rollout costs a single
small einsum-shaped op per step.

Beam convention: beam 0 points along the ego's +yaw (forward), angles
increase counter-clockwise, ranges clipped to ``max_range`` (no-hit beams
return exactly ``max_range``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rect_segments(corners: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 2) corner loops → (..., 4, 2, 2) edge segments."""
    nxt = jnp.roll(corners, -1, axis=-2)
    return jnp.stack([corners, nxt], axis=-2)


def building_segments(buildings: jnp.ndarray) -> jnp.ndarray:
    """(B, 5) axis-aligned boxes (cx, cy, hw, hh, h) → (B·4, 2, 2) wall
    segments at ground level."""
    cx, cy, hw, hh = (buildings[:, 0], buildings[:, 1],
                      buildings[:, 2], buildings[:, 3])
    corners = jnp.stack([
        jnp.stack([cx - hw, cy - hh], -1), jnp.stack([cx + hw, cy - hh], -1),
        jnp.stack([cx + hw, cy + hh], -1), jnp.stack([cx - hw, cy + hh], -1),
    ], axis=-2)  # (B, 4, 2)
    return _rect_segments(corners).reshape(-1, 2, 2)


def vehicle_segments(pos: jnp.ndarray, yaw: jnp.ndarray,
                     half_len: float = 2.25, half_wid: float = 1.0
                     ) -> jnp.ndarray:
    """(A, 2) centers + (A,) yaws → (A·4, 2, 2) rotated-box outline segments
    (matches the 4.5 × 2.0 m render box, geometry._unit_vehicle_box)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    local = jnp.asarray([[half_len, half_wid], [-half_len, half_wid],
                         [-half_len, -half_wid], [half_len, -half_wid]])
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    corners = jnp.einsum("aij,kj->aki", rot, local) + pos[:, None, :]
    return _rect_segments(corners).reshape(-1, 2, 2)


def cast_rays(origin: jnp.ndarray, angles: jnp.ndarray,
              segments: jnp.ndarray, max_range: float) -> jnp.ndarray:
    """Exact first-hit distances: (2,) origin, (N,) world angles, (S, 2, 2)
    segments → (N,) ranges in (0, max_range].

    Solves o + t·d = p + u·(q−p) per (beam, segment) with 2-D cross
    products; keeps t where t > 0 and u ∈ [0, 1], min-reduces over segments.
    """
    d = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)  # (N, 2)
    p = segments[:, 0]                      # (S, 2)
    e = segments[:, 1] - segments[:, 0]     # (S, 2)
    r = p - origin                          # (S, 2)

    def cross(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    denom = cross(d[:, None, :], e[None, :, :])          # (N, S)
    safe = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    t = cross(r[None, :, :], e[None, :, :]) / safe       # (N, S)
    u = cross(r[None, :, :], d[:, None, :]) / safe
    ok = (jnp.abs(denom) >= 1e-9) & (t > 1e-6) & (u >= 0.0) & (u <= 1.0)
    t = jnp.where(ok, t, jnp.inf)
    return jnp.minimum(jnp.min(t, axis=1), max_range)


def make_lidar(town, n_beams: int = 360, max_range: float = 60.0,
               fov_deg: float = 360.0):
    """→ scan(state, agents_pos, agents_yaw) -> (n_beams,) ranges for ONE env
    (vmap for fleets). Static building walls are precomputed once; vehicle
    boxes are rebuilt per call (they move).

    ``fov_deg < 360`` gives a forward sector scan centred on the ego heading
    (beams sweep ccw from −fov/2 to +fov/2 in body frame).
    """
    b_segs = building_segments(town.buildings)

    if fov_deg >= 360.0:
        rel = jnp.arange(n_beams, dtype=jnp.float32) / n_beams * 2.0 * jnp.pi
    else:
        half = jnp.deg2rad(fov_deg) / 2.0
        rel = jnp.linspace(-half, half, n_beams)

    def scan(state, agents_pos: jnp.ndarray, agents_yaw: jnp.ndarray,
             peds_pos: jnp.ndarray | None = None):
        v_segs = vehicle_segments(agents_pos, agents_yaw)
        parts = [b_segs, v_segs]
        if peds_pos is not None and peds_pos.shape[0] > 0:
            parts.append(vehicle_segments(peds_pos, jnp.zeros(peds_pos.shape[0]),
                                          half_len=0.25, half_wid=0.25))
        segs = jnp.concatenate(parts, axis=0)
        return cast_rays(state.ego_pos, state.ego_yaw + rel, segs, max_range)

    return scan


@functools.partial(jax.jit, static_argnames=("n_beams", "max_range"))
def lidar_image(ranges: jnp.ndarray, n_beams: int = 0, max_range: float = 60.0
                ) -> jnp.ndarray:
    """(N,) ranges → (N,) normalized [0,1] inverse-depth channel (near = 1),
    the standard learning-friendly encoding of a scan."""
    return 1.0 - jnp.clip(ranges / max_range, 0.0, 1.0)
