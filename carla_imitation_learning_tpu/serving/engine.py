"""Inference engine: bucketed batching + latency accounting over a policy.

The TPU serving problem is shape stability: XLA compiles one executable per
input shape, so serving raw request sizes would compile (and cache) an
executable per distinct batch — latency cliffs on every new size. The engine
pads every request up to a fixed bucket ladder (powers of two), so the
steady-state executable set is small and warm.

Works over either a live flax apply or a deserialized StableHLO servable
(serving/export.py LoadedPolicy) — anything ``fn(frames_u8) -> logits``.

The reference has no inference path at all beyond Lightning's test loop;
this is the deployment tier the brief's "production serving" calls for.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _default_buckets(max_batch: int) -> tuple[int, ...]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class InferenceEngine:
    """Pad-to-bucket batcher around ``policy(frames_u8) -> logits``.

    - ``infer(frames)`` → int32 actions (argmax), any request size ≤ max of
      the ladder is padded to the next bucket; larger requests are split
      into max-bucket chunks (a tail chunk pads).
    - ``infer_logits(frames)`` → float32 logits, same batching.
    - ``warmup()`` pre-compiles every bucket so first real requests don't
      pay compile latency.
    - ``stats()`` → per-call wall latency percentiles (measured around the
      device round-trip: results are fetched to host, which is what a
      serving client observes).
    """

    def __init__(
        self,
        policy_fn: Callable,
        *,
        max_batch: int = 256,
        buckets: Sequence[int] | None = None,
        stats_window: int = 4096,
        mesh=None,
    ):
        self._fn = policy_fn
        self.buckets = tuple(sorted(set(buckets or _default_buckets(max_batch))))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"bad bucket ladder {self.buckets}")
        if mesh is not None:
            # Data-parallel serving: each padded bucket shards over the mesh's
            # leading axis, so throughput scales with chips and the only
            # cross-chip traffic is the batch scatter/gather riding ICI (the
            # policy itself is replicated — it's a few hundred KB).
            # Deserialized exports compose under jit, so this wraps live
            # applies and LoadedPolicy artifacts alike.
            from jax.sharding import NamedSharding, PartitionSpec

            n = mesh.size
            # every bucket must split evenly: round the ladder up to
            # multiples of the mesh size (shape-stable set stays small)
            self.buckets = tuple(sorted({max(n, -(-b // n) * n)
                                         for b in self.buckets}))
            data = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            self._fn = jax.jit(policy_fn, in_shardings=data,
                               out_shardings=data)
        self.mesh = mesh
        # bounded windows: a long-running server must not grow stats forever
        self._latencies_ms: "deque[float]" = deque(maxlen=stats_window)
        self._padded_frac: "deque[float]" = deque(maxlen=stats_window)

    @property
    def max_batch(self) -> int:
        return self.buckets[-1]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def _run_chunk(self, frames: np.ndarray, extras=()) -> np.ndarray:
        n = frames.shape[0]
        b = self._bucket_for(n)
        if n < b:
            def _pad(a):
                pad = np.zeros((b - n,) + a.shape[1:], a.dtype)
                return np.concatenate([a, pad], axis=0)
            frames = _pad(frames)
            extras = tuple(_pad(e) for e in extras)
        logits = np.asarray(jax.device_get(self._fn(frames, *extras)))
        self._padded_frac.append(1.0 - n / b)
        return logits[:n]

    def infer_logits(self, frames, *extras) -> np.ndarray:
        """Batched logits. ``extras`` are optional per-row side inputs for
        multi-input servables (e.g. a CIL artifact's (speed, command)) —
        each must share the frames' leading dim; they pad/chunk in lockstep."""
        frames = np.asarray(frames)
        if frames.ndim != 4:
            raise ValueError(f"expected (B,H,W,C) uint8 frames, got {frames.shape}")
        extras = tuple(np.asarray(e) for e in extras)
        for e in extras:
            if e.shape[:1] != frames.shape[:1]:
                raise ValueError(f"extra input rows {e.shape[0]} != frames "
                                 f"rows {frames.shape[0]}")
        t0 = time.perf_counter()
        m = self.max_batch
        # an empty request is still one (fully padded) chunk: valid shape out
        stops = range(0, frames.shape[0], m) if frames.shape[0] else (0,)
        chunks = [self._run_chunk(frames[i:i + m],
                                  tuple(e[i:i + m] for e in extras))
                  for i in stops]
        out = np.concatenate(chunks, axis=0)
        self._latencies_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    def infer(self, frames, *extras) -> np.ndarray:
        return np.argmax(self.infer_logits(frames, *extras),
                         axis=-1).astype(np.int32)

    def warmup(self, height: int, width: int, channels: int = 4,
               dtype=np.uint8, extra_specs: Sequence[tuple] = ()) -> None:
        """Pre-compile every bucket. ``extra_specs`` are ``(shape_tail,
        dtype)`` pairs for multi-input servables (leading dim is the
        bucket), e.g. ``[((), np.float32), ((), np.int32)]`` for CIL."""
        for b in self.buckets:
            extras = tuple(np.zeros((b,) + tuple(tail), dt)
                           for tail, dt in extra_specs)
            self._fn(np.zeros((b, height, width, channels), dtype), *extras)
        # warmup calls shouldn't pollute serving stats
        self._latencies_ms.clear()
        self._padded_frac.clear()

    def stats(self) -> dict:
        lat = np.asarray(self._latencies_ms, np.float64)
        if lat.size == 0:
            return {"count": 0}
        return {
            "count": int(lat.size),
            "latency_ms_p50": float(np.percentile(lat, 50)),
            "latency_ms_p95": float(np.percentile(lat, 95)),
            "latency_ms_mean": float(lat.mean()),
            "pad_waste_frac": float(np.mean(self._padded_frac)),
        }
