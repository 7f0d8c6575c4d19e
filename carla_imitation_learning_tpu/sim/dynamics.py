"""Vehicle dynamics: kinematic bicycle with a tire-slip correction.

Pure functions over scalars/small vectors — vmap over the env axis gives a
batched fleet step whose math is pure VPU work (no gathers, no control flow).

Model (center-referenced kinematic bicycle, lr = lf = L/2):
    beta   = atan(0.5 · tan(delta))                       # body slip angle
    x'     = v · cos(yaw + beta)
    y'     = v · sin(yaw + beta)
    yaw'   = (v / L) · tan(delta) · cos(beta)
    v'     = throttle·a_max − brake·b_max − c_d·v²

Tire slip: the kinematic model over-rotates at high lateral acceleration.
We attenuate the effective steering by the lateral-force saturation factor
    g_sat = 1 / sqrt(1 + (a_lat / a_grip)²),  a_lat = v² tan(delta) / L
and first-order-relax the realized steering angle toward the command with
rate ``tire_stiffness`` (1/s) — a cheap stand-in for tire relaxation length.
"""

from __future__ import annotations

import jax.numpy as jnp

GRAVITY = 9.81
MU = 0.9  # road-tire friction coefficient


def bicycle_step(
    pos: jnp.ndarray,   # (2,)
    yaw: jnp.ndarray,   # ()
    v: jnp.ndarray,     # ()
    steer: jnp.ndarray,  # () realized steering angle (rad)
    steer_cmd: jnp.ndarray,  # () commanded steering angle (rad)
    throttle: jnp.ndarray,   # () in [0,1]
    brake: jnp.ndarray,      # () in [0,1]
    dt: float,
    wheelbase: float = 2.9,
    max_accel: float = 4.0,
    max_brake: float = 8.0,
    drag: float = 0.05,
    tire_stiffness: float = 9.0,
):
    """One integration step → (pos, yaw, v, steer)."""
    # steering relaxation toward command (tire + actuator lag)
    alpha = jnp.clip(tire_stiffness * dt, 0.0, 1.0)
    steer = steer + alpha * (steer_cmd - steer)

    # lateral-force saturation (tire slip at speed)
    a_lat = v * v * jnp.abs(jnp.tan(steer)) / wheelbase
    g_sat = 1.0 / jnp.sqrt(1.0 + (a_lat / (MU * GRAVITY)) ** 2)
    eff_steer = steer * g_sat

    beta = jnp.arctan(0.5 * jnp.tan(eff_steer))
    cos_b = jnp.cos(beta)
    dx = v * jnp.cos(yaw + beta)
    dy = v * jnp.sin(yaw + beta)
    dyaw = (v / wheelbase) * jnp.tan(eff_steer) * cos_b

    accel = throttle * max_accel - brake * max_brake - drag * v * v
    v_new = jnp.maximum(v + accel * dt, 0.0)

    pos_new = pos + jnp.stack([dx, dy]) * dt
    yaw_new = jnp.mod(yaw + dyaw * dt + jnp.pi, 2 * jnp.pi) - jnp.pi
    return pos_new, yaw_new, v_new, steer


def turning_radius(wheelbase: float, steer: float) -> float:
    """Analytic low-speed turning radius R = L / tan(delta) (for golden tests)."""
    return wheelbase / abs(jnp.tan(steer))
