"""Does auxiliary semantic-segmentation supervision move the BC driving
score? (BASELINE config #3 A/B.)

One expert collection (frames + sensors + labels + per-pixel semantic
ground truth in a single scan), two AuxNets trained at matched seeds /
epochs / budget — one plain (reference-inferred recon+traffic+action
contract), one with the seg decoder and CE against the renderer's class
plane — then both action heads drive the SAME closed-loop eval (same seed).
CIL-paper lineage says the seg signal should shape the trunk toward
driving-relevant structure; either answer is recorded.

Usage: python benchmarks/seg_ab.py [--envs 32] [--steps 600] [--epochs 6]
Writes reports/seg_ab.json incrementally and prints one JSON line.
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
    ap.add_argument("--envs", type=int, default=32, help="collection fleet")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-envs", type=int, default=64)
    ap.add_argument("--eval-steps", type=int, default=1500)
    ap.add_argument("--seg-weight", type=float, default=0.5)
    ap.add_argument("--speed-dropout", type=float, default=0.3,
                    help="train-time P(zero the sensor speed columns) — "
                         "without it the speed-conditioned net learns the "
                         "inertia shortcut and parks at spawn (measured)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import AuxNet
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl
    from carla_imitation_learning_tpu.training.losses import (
        aux_loss_fn, aux_seg_loss_fn,
    )
    from carla_imitation_learning_tpu.training.steps import (
        create_train_state, make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    town = make_town(blocks=3, n_buildings=24, n_lights=8, seed=args.seed)
    params = SimParams(n_agents=10)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")
    fs = 4

    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "seg_ab.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform}

    def save():
        out.write_text(json.dumps(result, indent=2))

    t0 = time.perf_counter()
    rng = jax.random.PRNGKey(args.seed)
    rng, kc = jax.random.split(rng)
    store, _, traj = cl.collect_dataset(params, town, rcfg, kc, args.envs,
                                        args.steps, frame_skip=fs,
                                        record_semantic=True)
    sem = cl.semantic_stream(traj)
    del traj
    result["dataset_frames"] = len(store)
    result["collect_seconds"] = round(time.perf_counter() - t0, 1)
    save()

    def train(with_seg: bool):
        model = AuxNet(obs_size=fs, image_hw=rcfg.height,
                       seg_classes=8 if with_seg else 0, dtype=jnp.bfloat16)
        base = pipe.DeviceDataset(store, args.batch, frame_skip=fs,
                                  shuffle=True, aux=True, seed=args.seed)
        if with_seg:
            ds = pipe.AuxSegDataset(base, sem,
                                    speed_dropout=args.speed_dropout,
                                    seed=args.seed)
        else:
            # identical speed-dropout on the plain arm (fair A/B)
            def _dropped(base=base, p=args.speed_dropout, seed=args.seed):
                drop = np.random.default_rng(seed)
                for (frames, sensor), y in base:
                    if p > 0.0:
                        keep = drop.random(sensor.shape[0]) >= p
                        mask = jnp.asarray(np.concatenate(
                            [np.ones((sensor.shape[0], 1)),
                             np.repeat(keep[:, None], 2, axis=1)], axis=1),
                            sensor.dtype)
                        sensor = sensor * mask
                    yield (frames, sensor), y

            class _Plain:
                def __iter__(self):
                    return _dropped()

                def __len__(self):
                    return len(base)

            ds = _Plain()
        loss = (aux_seg_loss_fn(0.0, 0.0, 1.0, args.seg_weight) if with_seg
                else aux_loss_fn(0.0, 0.0, 1.0))
        step = make_train_step(loss, donate=False)
        state = create_train_state(model, jax.random.PRNGKey(args.seed),
                                   (model.example_input(1),),
                                   optax.adam(1e-3))
        key = jax.random.PRNGKey(args.seed + 1)
        last = {}
        tt = time.perf_counter()
        for _ in range(args.epochs):
            for batch in ds:
                key, sk = jax.random.split(key)
                state, last = step(state, batch, sk)
        jax.block_until_ready(last["loss"])
        metrics = {k: round(float(v), 4) for k, v in last.items()}
        metrics["train_seconds"] = round(time.perf_counter() - tt, 1)
        return model, state, metrics

    for name, with_seg in (("plain", False), ("seg", True)):
        model, state, metrics = train(with_seg)
        ev = cl.evaluate_policy(params, town, rcfg,
                                model.as_policy_fn(state.params),
                                jax.random.PRNGKey(777),
                                n_envs=args.eval_envs,
                                n_steps=args.eval_steps, frame_skip=fs)
        result[name] = {"train": metrics,
                        "eval": {k: (None if v is None else round(float(v), 4))
                                 for k, v in ev.items()}}
        print(f"{name}: score={result[name]['eval'].get('driving_score')} "
              f"train={metrics}", flush=True)
        save()

    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()
    print(json.dumps({
        "metric": "seg_aux_driving_score_delta",
        "value": (result["seg"]["eval"]["driving_score"]
                  - result["plain"]["eval"]["driving_score"]),
        "unit": "driving score (seg - plain)",
        "plain": result["plain"]["eval"]["driving_score"],
        "seg": result["seg"]["eval"]["driving_score"],
        "seg_miou": result["seg"]["train"].get("seg_miou"),
    }))


if __name__ == "__main__":
    main()
