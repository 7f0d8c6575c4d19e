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


def segment_segment_distance(p1, p2, q1, q2):
    """Min distance between segment [p1, p2] (2,) and segments [q1, q2]
    (A, 2) — Ericson's closest-point-of-two-segments, branchless
    (jnp.where), batched over the second operand."""
    d1 = p2 - p1                       # (2,)
    d2 = q2 - q1                       # (A, 2)
    r = p1 - q1                        # (A, 2)
    a = jnp.sum(d1 * d1)               # scalar > 0
    e = jnp.sum(d2 * d2, axis=-1)      # (A,) > 0
    f = jnp.sum(d2 * r, axis=-1)
    cc = jnp.sum(d1 * r, axis=-1)      # (A,)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-9, jnp.clip((b * f - cc * e)
                                         / jnp.maximum(denom, 1e-9), 0.0, 1.0),
                  0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-9)
    s = jnp.clip(jnp.where(t < 0.0, -cc / a,
                           jnp.where(t > 1.0, (b - cc) / a, s)), 0.0, 1.0)
    t = jnp.clip(t, 0.0, 1.0)
    cp1 = p1 + s[:, None] * d1         # (A, 2)
    cp2 = q1 + t[:, None] * d2
    return jnp.linalg.norm(cp1 - cp2, axis=-1)


def _heading(yaw):
    return jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)


def capsule_vehicle_collision(ego_pos, ego_yaw, agents_pos, agents_yaw,
                              half_len, radius):
    """Oriented-capsule vehicle overlap: each vehicle is a segment of
    half-length ``half_len`` along its heading, swept by ``radius``
    (≈ 2·(half_len+radius) long × 2·radius wide — a car, not a disc).

    The disc model (``any_vehicle_collision``, radius 2.2) flags ANY center
    within 4.4 m: an oncoming pass in the adjacent lane (3.5 m lateral) is a
    "collision" — measured 76% of all expert collision events on the stock
    town. Capsules keep the longitudinal reach (nose-to-tail contact at
    ~4.6 m) while giving the lateral clearance cars actually have (~2 m),
    so only real contact counts — CARLA collides oriented bounding boxes,
    sim/world.py cites the contract."""
    he = _heading(ego_yaw)
    p1 = ego_pos - half_len * he
    p2 = ego_pos + half_len * he
    ha = _heading(agents_yaw)
    q1 = agents_pos - half_len * ha
    q2 = agents_pos + half_len * ha
    d = segment_segment_distance(p1, p2, q1, q2)
    return jnp.any(d < 2.0 * radius)


def capsule_building_collision(ego_pos, ego_yaw, half_len, radius, boxes):
    """Capsule vs axis-aligned boxes: circle_aabb at 3 points along the
    axis (sample gap half_len ≤ 2·radius, and building faces are far larger
    than the gap — no tunneling)."""
    he = _heading(ego_yaw)
    hit = jnp.zeros((), bool)
    for tpar in (-1.0, 0.0, 1.0):
        hit |= jnp.any(circle_aabb(ego_pos + tpar * half_len * he,
                                   radius, boxes))
    return hit


def capsule_point_collision(ego_pos, ego_yaw, half_len, radius,
                            pts, pt_radius):
    """Capsule vs circles (pedestrians): point-to-axis-segment distance."""
    he = _heading(ego_yaw)
    a = ego_pos - half_len * he
    b = ego_pos + half_len * he
    ab = b - a
    t = jnp.clip(jnp.sum((pts - a) * ab, axis=-1)
                 / jnp.maximum(jnp.sum(ab * ab), 1e-9), 0.0, 1.0)
    proj = a + t[:, None] * ab
    return jnp.any(jnp.linalg.norm(pts - proj, axis=-1) < radius + pt_radius)
