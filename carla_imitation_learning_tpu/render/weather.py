"""Weather effects: distance fog and procedural rain.

The reference system got weather from CARLA's UnrealEngine settings (the
`WeatherParameters` the data-collection client could set); this module is the
TPU-native equivalent, designed so the closed-loop rollout cost stays flat:

- **Fog** is exponential extinction toward the sky color:
  ``out = color · e^(−β·z) + sky · (1 − e^(−β·z))``. For the exact backends
  (which return a depth plane) it is a fused post-pass; the fast rollout
  kernel (ops/raster_fast.py) fuses the same formula into its per-band
  epilogue — one transcendental per PIXEL, not per triangle pass — and uses
  the visibility limit to CULL geometry: nothing beyond the ~1%-transmittance
  distance (4.6/β) can affect a pixel, so ``far`` shrinks and the triangle
  lists get shorter. Fog makes rendering FASTER, exactly like CARLA's
  far-clip/fog coupling.
- **Rain** is stateless procedural streak noise (counter-hashed, no carried
  RNG state): diagonal streaks keyed on (pixel, step) plus a slight global
  darkening. Deterministic given (key, t) — replayable trajectories stay
  replayable.

Both are OFF by default (zero cost at trace time when disabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def visibility_far(fog_density: float, far: float) -> float:
    """Distance beyond which transmittance < 1% — safe far-plane under fog."""
    if fog_density <= 0.0:
        return far
    return min(far, 4.6 / fog_density)


def apply_fog(color: jnp.ndarray, depth: jnp.ndarray, sky: jnp.ndarray,
              fog_density: float) -> jnp.ndarray:
    """Exponential fog toward ``sky``.

    color (H,W) gray or (H,W,3) rgb; depth (H,W) metres; sky broadcastable to
    color ((H,W)/(H,W,3) gradient or scalar/3-vector)."""
    if fog_density <= 0.0:
        return color
    f = jnp.exp(-fog_density * depth)
    if color.ndim == 3:
        f = f[..., None]
    sky = jnp.broadcast_to(sky, color.shape)
    return color * f + sky * (1.0 - f)


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap integer hash (xorshift-multiply) — uniform enough for noise."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def apply_rain(img: jnp.ndarray, key: jnp.ndarray, t: jnp.ndarray,
               intensity: float) -> jnp.ndarray:
    """Diagonal rain streaks + slight darkening on a (H,W) or (H,W,3) image.

    Streaks are bright short segments falling at ~4 px/step along a fixed
    diagonal; the pattern advances with ``t`` so consecutive frames animate.
    Stateless: pixel brightness is a pure hash of (streak column, phase),
    seeded by ``key`` — identical (key, t) → identical rain.
    """
    if intensity <= 0.0:
        return img
    H, W = img.shape[:2]
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    seed = (key[0] if key.ndim else key).astype(jnp.uint32)
    tt = t.astype(jnp.int32)
    # streak identity: column drifts with y (diagonal), phase falls with t
    col = xx + yy // 3
    phase = yy - 4 * tt
    h = _hash_u32(col * jnp.int32(9173) + (phase // 24) * jnp.int32(271) + seed)
    # one streak head per 24-row cell, present with prob ~ intensity/4
    gate = (h & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    on = gate < (0.25 * intensity)
    head = jnp.mod(phase, 24)
    streak = on & (head < 6)  # 6-px long drops
    drop = streak.astype(jnp.float32) * (0.35 + 0.4 * gate)
    base = img * (1.0 - 0.18 * intensity)  # overcast darkening
    if img.ndim == 3:
        return jnp.clip(base + drop[..., None] * 0.8, 0.0, 1.0)
    return jnp.clip(base + drop * 0.8, 0.0, 1.0)
