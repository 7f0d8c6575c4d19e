"""CNN-vs-ViT BC training A/B on the real chip (honest marginal protocol).

PERFORMANCE.md pins the CNN's ~30% MFU on its 4-input-channel stem; the ViT
(models/vit.py) removes that stem entirely. This measures both architectures
in ONE process (the tunnel's wall clock varies ±2× across processes —
PERFORMANCE.md protocol): step-path marginal images/s at batch 256 / 256²,
plus each compiled step's XLA FLOP count so MFU is computed from measured
time × compiled work, not asserted.

    python benchmarks/vit_ab.py [--batch 256] [--hw 256] [--out reports/vit_ab.json]

Writes {cnn: {...}, vit: {...}} with images_per_sec / ms_per_step /
gflops_per_step / mfu_pct (peak via --peak-tflops, default 197 bf16 v5e).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x) -> float:
    return float(np.asarray(jax.device_get(x)))


def _fixture(model, batch: int, hw: int):
    from carla_imitation_learning_tpu.data.pipeline import (
        DeviceDataset, FrameStore,
    )
    from carla_imitation_learning_tpu.training import (
        bc_loss_fn, create_train_state, make_optimizer, make_train_step,
    )

    store = FrameStore.synthetic(n=max(2 * batch, 512), height=hw, width=hw,
                                 seed=0)
    ds = DeviceDataset(store, batch_size=batch, frame_skip=4, shuffle=True,
                       dtype="bfloat16")
    tx = make_optimizer({"LEARNING_RATE": 1e-3, "gradient_clip_val": 0.5}, 1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               model.example_input(1, hw, hw), tx)
    step = make_train_step(bc_loss_fn)
    batches = [ds.make_batch(
        np.random.default_rng(i).integers(0, ds.n_samples, batch))
        for i in range(16)]
    jax.block_until_ready(batches[-1][0])
    return state, step, batches


def _step_flops(state, batch: int, hw: int) -> float:
    """XLA's own FLOP count for one compiled (non-donated) train step."""
    from carla_imitation_learning_tpu.training import bc_loss_fn, make_train_step

    step = make_train_step(bc_loss_fn, donate=False)
    x = jnp.zeros((batch, hw, hw, 4), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    cost = jax.jit(step).lower(state, (x, y), jax.random.PRNGKey(0)
                               ).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) if cost else 0.0


def bench_arch(name: str, model, batch: int, hw: int,
               peak_tflops: float) -> dict:
    state, step, batches = _fixture(model, batch, hw)
    rng = jax.random.PRNGKey(0)

    def chain(state, n):
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batches[i % 16], rng)
        fetch(m["loss"])
        return state, time.perf_counter() - t0

    state, _ = chain(state, 4)  # compile + warm
    deltas = []
    for _ in range(3):
        state, t_small = chain(state, 8)
        state, t_big = chain(state, 40)
        deltas.append((t_big - t_small) / 32)
    per = float(np.median(deltas))
    flops = _step_flops(state, batch, hw)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    out = {
        "images_per_sec": round(batch / per, 1),
        "ms_per_step": round(per * 1e3, 3),
        "gflops_per_step": round(flops / 1e9, 2),
        "mfu_pct": round(100.0 * flops / per / (peak_tflops * 1e12), 2),
        "params": n_params,
    }
    print(f"{name}: {out['images_per_sec']:,.0f} img/s "
          f"({out['ms_per_step']} ms/step, {out['gflops_per_step']} GF/step, "
          f"MFU {out['mfu_pct']}%, {n_params:,} params)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak for the MFU column (v5e: 197)")
    ap.add_argument("--out", default="reports/vit_ab.json")
    args = ap.parse_args()

    from carla_imitation_learning_tpu.models import PolicyCNN, ViTPolicy

    print(f"devices: {jax.devices()}", flush=True)
    result = {"platform": jax.devices()[0].platform, "batch": args.batch,
              "hw": args.hw, "peak_tflops": args.peak_tflops}
    result["cnn"] = bench_arch("cnn", PolicyCNN(), args.batch, args.hw,
                               args.peak_tflops)
    result["vit"] = bench_arch("vit (192d/4L p16)", ViTPolicy(),
                               args.batch, args.hw, args.peak_tflops)
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
