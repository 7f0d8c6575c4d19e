"""Serving-tier benchmark on the real chip: batch-1 latency and bucket-sweep
throughput for the exported (StableHLO) policy vs the live jitted apply.

What a serving client observes is request wall time INCLUDING the device
round-trip, so latency here is per-call wall with the result fetched to host
(NOT the marginal protocol — dispatch/fetch are the product here, not noise).
Throughput additionally reports the marginal rate between two request counts
to separate steady-state capacity from per-request overhead.

Usage: python benchmarks/inference.py [--height 128] [--width 128]
       [--out reports/inference.json]
Writes incrementally (tunnel-wedge tolerant).
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
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--max-batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default="reports/inference.json")
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.serving import (
        InferenceEngine, export_policy, load_policy,
    )

    H, W = args.height, args.width
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    report: dict = {"platform": jax.devices()[0].platform,
                    "height": H, "width": W}

    def save():
        out_path.write_text(json.dumps(report, indent=1))

    model = PolicyCNN()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 4)))["params"]

    art = Path("/tmp/bench_policy_artifact")
    t0 = time.perf_counter()
    export_policy(model, params, art, height=H, width=W)
    report["export_seconds"] = round(time.perf_counter() - t0, 2)
    report["blob_bytes"] = (art / "policy.stablehlo").stat().st_size
    art_q = Path("/tmp/bench_policy_artifact_int8")
    export_policy(model, params, art_q, height=H, width=W, quantize="int8")
    report["blob_bytes_int8"] = (art_q / "policy.stablehlo").stat().st_size
    save()

    servable = load_policy(art)
    servable_int8 = load_policy(art_q)

    @jax.jit
    def live(frames_u8):
        return model.apply({"params": params},
                           frames_u8.astype(jnp.float32) / 255.0)

    rng = np.random.default_rng(0)
    buckets = []
    b = 1
    while b <= args.max_batch:
        buckets.append(b)
        b *= 4

    for name, fn in (("servable", servable.call),
                     ("servable_int8", servable_int8.call),
                     ("live_jit", live)):
        rows = {}
        for bsz in buckets:
            # distinct inputs per rep (memoization-proof), fetched results
            xs = [rng.integers(0, 256, (bsz, H, W, 4), dtype=np.uint8)
                  for _ in range(args.reps)]
            np.asarray(jax.device_get(fn(xs[0])))  # compile + warm
            lat = []
            for x in xs:
                t0 = time.perf_counter()
                r = np.asarray(jax.device_get(fn(x)))
                lat.append(time.perf_counter() - t0)
                assert r.shape == (bsz, 9)
            lat_ms = np.asarray(lat) * 1e3
            rows[bsz] = {
                "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 3),
                "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 3),
                "images_per_sec": round(bsz / float(np.median(lat)), 1),
            }
            print(f"{name} b={bsz}: p50 {rows[bsz]['latency_ms_p50']} ms, "
                  f"{rows[bsz]['images_per_sec']} img/s", flush=True)
            report[name] = rows
            save()

    # engine end-to-end: odd request sizes through the bucket ladder
    eng = InferenceEngine(servable, max_batch=args.max_batch)
    eng.warmup(H, W)
    for _ in range(args.reps):
        eng.infer(rng.integers(0, 256, (100, H, W, 4), dtype=np.uint8))
    report["engine_b100"] = eng.stats()
    save()
    print(json.dumps(report["engine_b100"]))


if __name__ == "__main__":
    main()
