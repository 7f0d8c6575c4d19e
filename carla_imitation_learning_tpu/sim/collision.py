"""Collision + off-road checks: pure vectorized geometry (VPU-only math)."""

from __future__ import annotations

import jax.numpy as jnp


def circle_circle(pos_a, radius_a, pos_b, radius_b):
    """pos_a (2,), pos_b (..., 2) → (...,) bool overlap."""
    d2 = jnp.sum((pos_b - pos_a) ** 2, axis=-1)
    r = radius_a + radius_b
    return d2 < r * r


def circle_aabb(pos, radius, boxes):
    """Circle vs axis-aligned boxes (B,≥4: cx, cy, half_w, half_h) → (B,) bool."""
    delta = jnp.abs(pos - boxes[:, 0:2])
    closest = jnp.maximum(delta - boxes[:, 2:4], 0.0)
    return jnp.sum(closest**2, axis=-1) < radius * radius


def point_segment_distance(p, segs):
    """p (2,) vs segments (S,4: x0,y0,x1,y1) → (S,) distances."""
    a = segs[:, 0:2]
    b = segs[:, 2:4]
    ab = b - a
    t = jnp.clip(jnp.sum((p - a) * ab, axis=-1)
                 / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-9), 0.0, 1.0)
    proj = a + t[:, None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def offroad(pos, road_segments, half_width, margin: float = 1.5):
    """True when the point is farther than half_width+margin from every road."""
    d = point_segment_distance(pos, road_segments)
    return jnp.min(d) > half_width + margin


def any_vehicle_collision(ego_pos, agents_pos, radius):
    return jnp.any(circle_circle(ego_pos, radius, agents_pos, radius))


def any_building_collision(ego_pos, buildings, radius):
    return jnp.any(circle_aabb(ego_pos, radius, buildings))
