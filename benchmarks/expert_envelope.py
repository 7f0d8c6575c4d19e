"""Expert safety-envelope ablation: what each longitudinal-control lever
buys the LABEL SOURCE.

r3 measured the privileged expert at 6.99 collisions/km — it never braked
for the vehicle in front, and every imitation tier inherited that ceiling
(reports/driving_quality.json r3, expert driving_score 0.545). Round 4 gave
autopilot_control a headway/TTC corridor brake, first-come junction yield,
and an optional slow-for-turn cruise cap (sim/world.py). This scores the
SAME eval fleet under each envelope stage:

    none       — r3 behavior (headway_gap=0, yield_gap=0)
    headway    — corridor time-headway braking only
    +yield     — headway + first-come junction right-of-way (the default)
    +turnspeed — the above + slow-for-turn cruise cap (stretch lever)

Usage: python benchmarks/expert_envelope.py [--envs 256] [--steps 300]
Writes reports/expert_envelope.json incrementally, prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--turn-speed", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl

    on_tpu = jax.devices()[0].platform != "cpu"
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")

    stages = {
        "none": dict(headway_gap=0.0, yield_gap=0.0),
        "headway": dict(yield_gap=0.0),
        "headway_yield": dict(),
        "headway_yield_turnspeed": dict(turn_speed=args.turn_speed),
    }
    keep = ("driving_score", "route_completion", "collisions_per_km",
            "red_violations_per_km", "mean_speed", "clean_episode_rate",
            "km_driven")

    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "expert_envelope.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform}
    t0 = time.perf_counter()
    for name, overrides in stages.items():
        params = SimParams(n_agents=15, **overrides)
        m = cl.evaluate_policy(params, town, rcfg, None,
                               jax.random.PRNGKey(100 + args.seed),
                               n_envs=args.envs, n_steps=args.steps)
        result[name] = {k: (None if m[k] is None else round(float(m[k]), 4))
                        for k in keep}
        print(f"{name}: {result[name]}", flush=True)
        out.write_text(json.dumps(result, indent=2))
    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps({
        "metric": "expert_collisions_per_km",
        "value": result["headway_yield"]["collisions_per_km"],
        "unit": "collisions/km (default envelope)",
        "r3_no_envelope": result["none"]["collisions_per_km"],
        "driving_score": result["headway_yield"]["driving_score"],
        "turnspeed_score":
            result["headway_yield_turnspeed"]["driving_score"],
    }))


if __name__ == "__main__":
    main()
