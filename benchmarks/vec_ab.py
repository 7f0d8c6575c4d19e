"""Vectorized-band-pass kernel A/B on the real chip.

Same-process marginal-cost A/B (PERFORMANCE.md protocol) of the closed-loop
rollout with the vectorized kernel (raster_fast._vec_kernel — P primitives
per loop body as (P, rows·W) VPU broadcasts from band-resident coefficient
tables, ZERO scalar loads in the pass loop) vs the scalar triangle kernel
(13 SMEM scalar loads per triangle per band).

The two kernels are bit-exact on the same setup (tests/test_vec_kernel.py),
so this is purely a machine-mapping experiment: does removing the
scalar-issue bottleneck beat the cost of the per-band coefficient gather?

Usage: python benchmarks/vec_ab.py [--envs 1024]
Writes reports/vec_ab.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    n_envs = args.envs
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    backend = "pallas" if jax.devices()[0].platform != "cpu" else "jax"

    model = PolicyCNN()
    mp_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4)))["params"]

    def policy_fn(obs):
        return jnp.argmax(model.apply({"params": mp_}, obs), axis=-1)

    def measure(rcfg) -> float:
        init_fn, rollout_fn = make_rollout(params, town, rcfg, policy_fn)
        carry = init_fn(jax.random.PRNGKey(1), n_envs)

        def run(carry, n):
            t0 = time.perf_counter()
            carry, traj = rollout_fn(carry, n)
            float(jnp.sum(traj["speed"]))  # undeniable completion
            return carry, time.perf_counter() - t0

        carry, _ = run(carry, 16)  # compile both lengths
        carry, _ = run(carry, 96)
        deltas = []
        for _ in range(3):
            carry, t16 = run(carry, 16)
            carry, t96 = run(carry, 96)
            deltas.append((t96 - t16) / 80)
        return float(np.median(deltas))

    out = {"envs": n_envs, "platform": jax.devices()[0].platform}
    for scene, kw in (
        ("standard", dict(max_triangles=512)),
        ("rich", dict(max_triangles=2048, facade_bands=3, shadows=True,
                      markings=True)),
    ):
        res = {}
        for label, vec in (("vec", True), ("tris", False)):
            rcfg = RenderConfig(height=128, width=128, backend=backend,
                                fast=True, rgb=False, vec=vec, **kw)
            per = measure(rcfg)
            res[label] = {"ms_per_fleet_step": round(per * 1e3, 2),
                          "env_steps_per_sec": round(n_envs / per, 1)}
        res["speedup"] = round(res["tris"]["ms_per_fleet_step"]
                               / res["vec"]["ms_per_fleet_step"], 3)
        out[scene] = res
        print(f"{scene}: {json.dumps(res)}", file=sys.stderr, flush=True)

    Path("reports").mkdir(exist_ok=True)
    Path("reports/vec_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({
        "metric": "vec_kernel_speedup_standard",
        "value": out["standard"]["speedup"],
        "unit": "x vs triangle kernel",
        "env_steps_per_sec": out["standard"]["vec"]["env_steps_per_sec"],
    }))


if __name__ == "__main__":
    main()
