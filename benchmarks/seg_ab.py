"""Aux-family diagnosis + seg A/B at MATRIX budget (BASELINE config #3).

Round-4 measured the seg delta at 1/10 budget and its plain-aux control
scored 0.181 — less than half of plain BC's 0.387 at matrix budget — so the
whole A/B was inconclusive (VERDICT r4 weak #4). This harness re-runs at the
SAME budget as the quality matrix (64 envs × 500 collect, 8 epochs, batch
256, 256-env eval) and adds the arms that LOCALIZE any aux-family gap:

- ``bc``        PolicyCNN + bc_loss on the SAME frames — the matrix control.
- ``plain``     AuxNet, action-head-only loss (the reference-inferred
                contract, train.py:131-165 / imitation.py:11-24): isolates
                the ARCHITECTURE (trunk + sensor fusion + idle recon head).
- ``nosensor``  AuxNet with the sensor input zeroed at train AND eval:
                isolates the SENSOR PATHWAY (if nosensor ≈ bc but plain is
                low, the sensor shortcut is the problem; if nosensor is low
                too, the fusion architecture is).
- ``seg``       AuxNet + the seg decoder supervised by the renderer's
                per-pixel class plane — the actual config #3 measurement,
                now on top of a meaningful control.

All arms train on one shared collection per seed and drive the SAME eval
fleet. ``--seeds N`` repeats everything under N seeds with a summary.

Usage: python benchmarks/seg_ab.py [--collect-envs 64] [--collect-steps 500]
         [--epochs 8] [--batch 256] [--eval-envs 256] [--eval-steps 300]
         [--seeds 1]
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
    ap.add_argument("--collect-envs", type=int, default=64)
    ap.add_argument("--collect-steps", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--eval-envs", type=int, default=256)
    ap.add_argument("--eval-steps", type=int, default=300)
    ap.add_argument("--seg-weight", type=float, default=0.5)
    ap.add_argument("--speed-dropout", type=float, default=0.3,
                    help="train-time P(zero the sensor speed columns) — "
                         "without it the speed-conditioned net learns the "
                         "inertia shortcut and parks at spawn (measured)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--arms", default="bc,plain,nosensor,seg",
                    help="comma list from {bc, plain, nosensor, seg}")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.models import AuxNet, PolicyCNN
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl
    from carla_imitation_learning_tpu.training.losses import (
        aux_loss_fn, aux_seg_loss_fn, bc_loss_fn,
    )
    from carla_imitation_learning_tpu.training.steps import (
        create_train_state, make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    # the MATRIX town/fleet (driving_quality.py), so ``bc`` here is directly
    # comparable with the quality ladder's BC tier
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=15)
    rcfg = RenderConfig(height=128, width=128,
                        backend="pallas" if on_tpu else "jax")
    fs = 4
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]

    out = (Path(args.out) if args.out else
           Path(__file__).resolve().parents[1] / "reports" / "seg_ab.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    result: dict = {"config": vars(args),
                    "platform": jax.devices()[0].platform, "runs": {}}

    def save():
        out.write_text(json.dumps(result, indent=2) + "\n")

    t0 = time.perf_counter()

    def run_seed(seed: int) -> dict:
        r: dict = {}
        result["runs"][str(seed)] = r
        rng = jax.random.PRNGKey(seed)
        rng, kc = jax.random.split(rng)
        tc = time.perf_counter()
        store, _, traj = cl.collect_dataset(
            params, town, rcfg, kc, args.collect_envs, args.collect_steps,
            frame_skip=fs, record_semantic=("seg" in arms))
        sem = cl.semantic_stream(traj) if "seg" in arms else None
        del traj
        r["dataset_frames"] = len(store)
        r["collect_seconds"] = round(time.perf_counter() - tc, 1)
        save()

        def eval_policy(policy_fn):
            m = cl.evaluate_policy(params, town, rcfg, policy_fn,
                                   jax.random.PRNGKey(1000 * seed + 102),
                                   n_envs=args.eval_envs,
                                   n_steps=args.eval_steps, frame_skip=fs)
            return {k: (None if v is None else round(float(v), 4))
                    for k, v in m.items()}

        def sensor_mask_iter(base, drop_speed: float, zero_all: bool,
                             seed: int):
            """Yield aux batches with the train-time sensor treatment:
            ``zero_all`` kills the whole vector (nosensor arm);
            ``drop_speed`` zeroes the speed columns per-row with prob p
            (anti-inertia-shortcut, commit 671d60f)."""
            gen = np.random.default_rng(seed)
            for (frames, sensor), y in base:
                if zero_all:
                    sensor = jnp.zeros_like(sensor)
                elif drop_speed > 0.0:
                    keep = gen.random(sensor.shape[0]) >= drop_speed
                    mask = jnp.asarray(np.concatenate(
                        [np.ones((sensor.shape[0], 1)),
                         np.repeat(keep[:, None], 2, axis=1)], axis=1),
                        sensor.dtype)
                    sensor = sensor * mask
                yield (frames, sensor), y

        def train_bc():
            model = PolicyCNN(dtype=jnp.bfloat16)
            ds = pipe.DeviceDataset(store, args.batch, frame_skip=fs,
                                    shuffle=True, seed=seed)
            step = make_train_step(bc_loss_fn, donate=False)
            state = create_train_state(
                model, jax.random.PRNGKey(seed),
                jnp.zeros((1, rcfg.height, rcfg.width, fs)), optax.adam(1e-3))
            key, last = jax.random.PRNGKey(seed + 1), {}
            tt = time.perf_counter()
            for _ in range(args.epochs):
                for batch in ds:
                    key, sk = jax.random.split(key)
                    state, last = step(state, batch, sk)
            jax.block_until_ready(last["loss"])
            metrics = {k: round(float(v), 4) for k, v in last.items()}
            metrics["train_seconds"] = round(time.perf_counter() - tt, 1)

            def policy_fn(obs):
                return jnp.argmax(model.apply(
                    {"params": state.params}, obs), axis=-1)
            return policy_fn, metrics

        def train_aux(with_seg: bool, zero_sensor: bool):
            model = AuxNet(obs_size=fs, image_hw=rcfg.height,
                           seg_classes=8 if with_seg else 0,
                           dtype=jnp.bfloat16)
            base = pipe.DeviceDataset(store, args.batch, frame_skip=fs,
                                      shuffle=True, aux=True, seed=seed)
            if with_seg:
                ds = pipe.AuxSegDataset(base, sem,
                                        speed_dropout=args.speed_dropout,
                                        seed=seed)
            else:
                base_ds = base

                class _Wrapped:
                    def __iter__(self):
                        return sensor_mask_iter(
                            base_ds, args.speed_dropout, zero_sensor, seed)

                    def __len__(self):
                        return len(base_ds)

                ds = _Wrapped()
            loss = (aux_seg_loss_fn(0.0, 0.0, 1.0, args.seg_weight)
                    if with_seg else aux_loss_fn(0.0, 0.0, 1.0))
            step = make_train_step(loss, donate=False)
            state = create_train_state(model, jax.random.PRNGKey(seed),
                                       (model.example_input(1),),
                                       optax.adam(1e-3))
            key, last = jax.random.PRNGKey(seed + 1), {}
            tt = time.perf_counter()
            for _ in range(args.epochs):
                for batch in ds:
                    key, sk = jax.random.split(key)
                    state, last = step(state, batch, sk)
            jax.block_until_ready(last["loss"])
            metrics = {k: round(float(v), 4) for k, v in last.items()}
            metrics["train_seconds"] = round(time.perf_counter() - tt, 1)

            if zero_sensor:
                def policy_fn(obs, extras):
                    outs = model.apply(
                        {"params": state.params},
                        (obs, jnp.zeros_like(extras["sensor"])))
                    return jnp.argmax(outs[2], axis=-1)
            else:
                policy_fn = model.as_policy_fn(state.params)
            return policy_fn, metrics

        builders = {
            "bc": lambda: train_bc(),
            "plain": lambda: train_aux(False, False),
            "nosensor": lambda: train_aux(False, True),
            "seg": lambda: train_aux(True, False),
        }
        for name in arms:
            pf, metrics = builders[name]()
            r[name] = {"train": metrics, "eval": eval_policy(pf)}
            print(f"[seed {seed}] {name}: "
                  f"score={r[name]['eval'].get('driving_score')} "
                  f"train={metrics}", flush=True)
            save()
        return r

    seeds = [args.seed + i for i in range(max(1, args.seeds))]
    for seed in seeds:
        ts = time.perf_counter()
        run_seed(seed)
        result["runs"][str(seed)]["seed_seconds"] = round(
            time.perf_counter() - ts, 1)
        save()

    summary: dict = {}
    for name in arms:
        vals = [result["runs"][str(s)][name]["eval"]["driving_score"]
                for s in seeds if name in result["runs"][str(s)]]
        if vals:
            summary[name] = {"mean": round(float(np.mean(vals)), 4),
                             "min": round(float(np.min(vals)), 4),
                             "max": round(float(np.max(vals)), 4),
                             "values": vals}
    result["summary"] = summary
    # compat: seed-0 arm dicts at top level
    for name in arms:
        if name in result["runs"][str(seeds[0])]:
            result[name] = result["runs"][str(seeds[0])][name]
    result["wall_seconds"] = round(time.perf_counter() - t0, 1)
    save()

    def mean(name):
        return summary.get(name, {}).get("mean")

    line = {
        "metric": "seg_aux_driving_score_delta",
        "value": (None if mean("seg") is None or mean("plain") is None
                  else round(mean("seg") - mean("plain"), 4)),
        "unit": "driving score (seg - plain)",
        "seeds": args.seeds,
        "bc": mean("bc"),
        "plain": mean("plain"),
        "nosensor": mean("nosensor"),
        "seg": mean("seg"),
    }
    if "seg" in arms:
        line["seg_miou"] = result["runs"][str(seeds[0])]["seg"]["train"].get(
            "seg_miou")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
