"""Safety shield: a sensor-based emergency-brake layer over any policy.

Deployment-style supervisory controller (the reference stack has no
equivalent — CARLA deployments bolt one on next to the learned policy): a
small forward LIDAR fan (render/lidar.py exact ray caster — the same sensor
model the rollout can log) watches the lane ahead, and when time-to-collision
falls under a threshold (or anything is inside the hard standoff) the
commanded throttle is cut and full brake applied. Steering is never touched —
the policy keeps lateral authority, the shield only owns longitudinal
emergencies.

Pure and fixed-shape: one (beams × segments) ray solve per env per step,
fuses into the rollout scan; with ``shield=None`` the feature compiles out
entirely. The shield acts on the EXECUTED control only — recorded supervision
(``traj["action"]``, expert labels) stays clean, mirroring the noise-injection
contract — and every intervention is logged (``traj["shield"]``) so
evaluate_policy can report interventions/km next to collisions/km.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ShieldConfig:
    """Emergency-brake envelope.

    ttc_s: brake when (clear distance / speed) drops under this many seconds.
    hard_m: brake whenever anything is inside this clear distance, regardless
        of speed (covers creeping into a stopped car).
    fan_deg / n_beams: forward sector geometry of the watch fan.
    max_range: sensor horizon (beyond it the lane counts as clear).
    standoff: ranges are measured from the ego center; subtract the ego's
        front overhang so "distance" means bumper gap (vehicle half-length
        2.25 m, sim/world geometry).
    """

    ttc_s: float = 0.8
    hard_m: float = 3.0
    fan_deg: float = 36.0
    n_beams: int = 7
    max_range: float = 40.0
    standoff: float = 2.25


def make_shield(town, cfg: ShieldConfig):
    """→ apply(states, control) -> (control, triggered (B,) bool) for a FLEET.

    Rebuilds the moving-obstacle segments exactly like the rollout's LIDAR
    channel (agents as rotated boxes, walkers as 0.5 m squares) and casts
    ``n_beams`` rays over the forward ``fan_deg`` sector per env.
    """
    from carla_imitation_learning_tpu.render.lidar import make_lidar
    from carla_imitation_learning_tpu.sim.agents import agent_positions

    scan = make_lidar(town, n_beams=cfg.n_beams, max_range=cfg.max_range,
                      fov_deg=cfg.fan_deg)

    def _ranges_one(state):
        ap, ay = agent_positions(town, state.agents_route, state.agents_s)
        peds = None
        if state.peds_s.shape[0] > 0:
            from carla_imitation_learning_tpu.sim.pedestrians import (
                ped_positions,
            )
            peds = ped_positions(town, state.peds_crossing, state.peds_s)
        return scan(state, ap, ay, peds)

    ranges_batch = jax.vmap(_ranges_one)

    def apply(states, control):
        ranges = ranges_batch(states)                      # (B, n_beams)
        clear = jnp.min(ranges, axis=-1) - cfg.standoff    # bumper gap (B,)
        ttc = clear / jnp.maximum(states.ego_v, 0.5)
        triggered = (clear < cfg.hard_m) | (ttc < cfg.ttc_s)
        shielded = control.replace(
            throttle=jnp.where(triggered, 0.0, control.throttle),
            brake=jnp.where(triggered, 1.0, control.brake))
        return shielded, triggered

    return apply


def shield_from_cfg(cfg) -> "ShieldConfig | None":
    """Experiment-config adapter: ``safety_shield=true`` (+ optional
    ``shield_ttc_s`` / ``shield_hard_m`` / ``shield_fan_deg`` /
    ``shield_n_beams`` / ``shield_max_range`` overrides) → ShieldConfig."""
    if not bool(cfg.get("safety_shield", False)):
        return None
    d = ShieldConfig()
    return ShieldConfig(
        ttc_s=float(cfg.get("shield_ttc_s", d.ttc_s)),
        hard_m=float(cfg.get("shield_hard_m", d.hard_m)),
        fan_deg=float(cfg.get("shield_fan_deg", d.fan_deg)),
        n_beams=int(cfg.get("shield_n_beams", d.n_beams)),
        max_range=float(cfg.get("shield_max_range", d.max_range)),
        standoff=float(cfg.get("shield_standoff", d.standoff)),
    )
