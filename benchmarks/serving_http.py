"""HTTP serving-tier benchmark: does cross-request micro-batching pay?

A/B over the coalescing window with K concurrent batch-1 clients hammering
``/v1/infer`` (the worst case for a padded-bucket engine: every lone request
wastes a whole bucket and a whole device dispatch). Window ≈ 0 serves each
request as its own device call; a few-ms window drains concurrent requests
into one call. Reports requests/s, client-observed latency percentiles, and
the server's own coalescing counters, plus an in-process engine-only
baseline so HTTP/threading overhead is attributable.

On the tunneled dev chip each dispatch costs ~5-50 ms, so coalescing is the
difference between K dispatches and 1 per window — production-shaped even
though the absolute numbers carry tunnel latency.

Usage: python benchmarks/serving_http.py [--clients 8] [--requests 40]
       [--height 128] [--out reports/serving_http.json]
Writes incrementally (tunnel-wedge tolerant).
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _post(url: str, frames: np.ndarray) -> list:
    shape = ",".join(str(s) for s in frames.shape)
    req = urllib.request.Request(
        url + "/v1/infer", data=frames.tobytes(),
        headers={"Content-Type": "application/octet-stream", "X-Shape": shape},
        method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())["actions"]


def run_case(servable, *, window_ms: float, clients: int, requests: int,
             h: int, w: int, c: int, max_batch: int) -> dict:
    from carla_imitation_learning_tpu.serving import PolicyServer

    with PolicyServer(servable, window_ms=window_ms,
                      max_batch=max_batch) as srv:
        srv.engine.warmup(h, w, c)
        lat_ms: list[float] = []

        def client(i: int) -> None:
            rng = np.random.default_rng(i)
            frames = rng.integers(0, 256, (1, h, w, c), dtype=np.uint8)
            for _ in range(requests):
                t0 = time.perf_counter()
                _post(srv.url, frames)
                lat_ms.append((time.perf_counter() - t0) * 1e3)

        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(max_workers=clients) as ex:
            list(ex.map(client, range(clients)))
        wall = time.perf_counter() - t0
        b = srv._batcher
        lat = np.asarray(lat_ms)
        return {
            "window_ms": window_ms,
            "requests_per_sec": clients * requests / wall,
            "client_latency_ms_p50": float(np.percentile(lat, 50)),
            "client_latency_ms_p95": float(np.percentile(lat, 95)),
            "device_calls": b.batches_total,
            "mean_coalesced_rows": (b.rows_total / b.batches_total
                                    if b.batches_total else 0.0),
            "engine": srv.engine.stats(),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=40)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--out", default="reports/serving_http.json")
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.serving import (
        InferenceEngine, export_policy, load_policy,
    )

    h, w, c = args.height, args.width, 4
    platform = jax.devices()[0].platform
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    result: dict = {"platform": platform,
                    "config": {"clients": args.clients,
                               "requests": args.requests,
                               "height": h, "width": w,
                               "max_batch": args.max_batch}}

    def flush() -> None:
        out_path.write_text(json.dumps(result, indent=1))

    model = PolicyCNN(dtype=jnp.float32 if platform == "cpu" else jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, c)))["params"]
    art = Path("/tmp/serving_http_artifact")
    export_policy(model, params, art, height=h, width=w,
                  platforms=("tpu", "cpu") if platform != "cpu" else ("cpu",))
    servable = load_policy(art)

    # engine-only baseline: batch-1 calls with no HTTP/threads in the way
    eng = InferenceEngine(servable, max_batch=args.max_batch)
    eng.warmup(h, w, c)
    frames1 = np.random.default_rng(0).integers(0, 256, (1, h, w, c),
                                                dtype=np.uint8)
    t0 = time.perf_counter()
    n_base = 50
    for _ in range(n_base):
        eng.infer(frames1)
    result["engine_only_b1_ms"] = (time.perf_counter() - t0) / n_base * 1e3
    flush()

    for window_ms in (0.0, 2.0, 10.0):
        key = f"window_{window_ms:g}ms"
        result[key] = run_case(servable, window_ms=window_ms,
                               clients=args.clients, requests=args.requests,
                               h=h, w=w, c=c, max_batch=args.max_batch)
        flush()
        print(key, json.dumps(result[key]))

    a, b = result["window_0ms"], result["window_10ms"]
    result["coalescing_speedup"] = (b["requests_per_sec"]
                                    / a["requests_per_sec"])
    flush()
    print(json.dumps({"metric": "serving_http_requests_per_sec",
                      "value": b["requests_per_sec"],
                      "coalescing_speedup": result["coalescing_speedup"],
                      "platform": platform}))


if __name__ == "__main__":
    main()
