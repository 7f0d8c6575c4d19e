"""Measured control run of the REFERENCE's BC input recipe (verdict item 2).

Re-creates the reference's hot loop shape torch-free on this host, so the
"BC ≥10× reference images/sec" target has a MEASURED denominator instead of a
first-principles estimate:

- per SAMPLE: decode the window's 4 image files from disk, luminance dot
  [0.299, 0.587, 0.114] / 255 → float32 (4, H, W)
  (reference src/dataset/imitation_dataset.py:115-122 — imread_collection of
  the last frame_skip files inside DataLoader worker processes),
- batch 64, sequential order, NUM_WORKERS=4 worker processes
  (reference configs/model/imitation.yaml BATCH_SIZE; NUM_WORKERS is read at
  imitation_dataset.py:266 and set to 4 in our configs),
- each batch feeds a train step of the same CNN capability shape
  (4×256×256 → 9 logits) on the default device; device work overlaps the
  next batch's decode exactly as torch's async dispatch would.

Decode uses PIL, which benchmarks FASTER than the reference's
skimage.io.imread — the control is conservative (generous to the reference).

Usage:  python benchmarks/reference_control.py [--frames 1200] [--format jpeg]
Writes reports/reference_control.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

LUMA = np.array([0.299, 0.587, 0.114])  # imitation_dataset.py:121
_DIR = None  # worker-process state


def _init_worker(directory: str):
    global _DIR
    _DIR = Path(directory)


def _decode_window(start: int) -> np.ndarray:
    """The reference's per-sample work: 4 file decodes + luminance dot
    (imitation_dataset.py:115-122; files are 1-based <idx>.<ext>)."""
    from PIL import Image

    frames = []
    for i in range(start, start + 4):
        path = next(_DIR.glob(f"{i + 1}.*"))
        with Image.open(path) as im:
            arr = np.asarray(im)
        if arr.ndim == 3:
            arr = arr[..., :3] @ LUMA
        frames.append(arr / 255.0)
    return np.stack(frames).astype(np.float32)  # (4, H, W)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1200)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--format", default="jpeg", choices=["jpeg", "png"])
    ap.add_argument("--max-seconds", type=float, default=120.0)
    args = ap.parse_args()

    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.data import frame_log as fl
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.training import (
        bc_loss_fn, create_train_state, make_optimizer, make_train_step,
    )

    # --- write a reference-contract raw log --------------------------------
    root = Path("/tmp/reference_control_data")
    cam_dir = root / "raw" / "Log1" / "camera"
    n_have = len(list(cam_dir.glob(f"*.{args.format}"))) if cam_dir.is_dir() else 0
    if n_have < args.frames:
        print(f"writing {args.frames} synthetic {args.format} frames...",
              file=sys.stderr)
        fl.write_synthetic_log(root, log="Log1", cameras=("camera",),
                               n_frames=args.frames, height=args.hw,
                               width=args.hw, image_format=args.format)
    state_log = fl.load_state_csv(root / "raw" / "state.csv")
    from carla_imitation_learning_tpu.data.actions import continuous_to_discrete

    labels = np.asarray(continuous_to_discrete(
        state_log.steer, state_log.throttle, state_log.brake)).astype(np.int32)

    # --- the reference-shape trainer (same CNN capability, jit'd) ----------
    model = PolicyCNN()
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer({"LEARNING_RATE": 1e-3, "gradient_clip_val": 0.5}, 1)
    tstate = create_train_state(model, rng,
                                model.example_input(1, args.hw, args.hw), tx)
    step = make_train_step(bc_loss_fn, donate=False)

    n_samples = args.frames - 4
    window_starts = np.arange(n_samples)  # sequential, shuffle=False

    def epoch(tstate, pool, budget_t0):
        """One epoch of the reference recipe; returns (state, images, wall)."""
        n_img = 0
        t0 = time.perf_counter()
        it = pool.imap(_decode_window, window_starts, chunksize=8)
        batch_x = []
        m = None
        for k, x in enumerate(it):
            batch_x.append(x)
            if len(batch_x) == args.batch:
                xb = jnp.asarray(np.stack(batch_x).transpose(0, 2, 3, 1))
                yb = jnp.asarray(labels[window_starts[k - args.batch + 1:k + 1] + 4])
                tstate, m = step(tstate, (xb, yb), rng)
                n_img += args.batch
                batch_x = []
                if time.perf_counter() - budget_t0 > args.max_seconds:
                    break
        if m is not None:
            float(jnp.sum(m["loss"]))  # undeniable completion
        return tstate, n_img, time.perf_counter() - t0

    with mp.Pool(args.workers, initializer=_init_worker,
                 initargs=(str(cam_dir),)) as pool:
        # warm epoch (compiles the step; touches the page cache like a real
        # second-epoch steady state)
        budget_t0 = time.perf_counter()
        tstate, _, _ = epoch(tstate, pool, budget_t0)
        rates = []
        for _ in range(2):
            tstate, n_img, wall = epoch(tstate, pool, budget_t0)
            if n_img:
                rates.append(n_img / wall)
        # decode-only rate: proves the path is input-bound
        probe = window_starts[:512]
        t0 = time.perf_counter()
        for _ in pool.imap(_decode_window, probe, chunksize=8):
            pass
        decode_rate = len(probe) / (time.perf_counter() - t0)

    rate = float(np.median(rates)) if rates else float("nan")
    result = {
        "metric": "reference_recipe_bc_images_per_sec",
        "value": round(rate, 1),
        "unit": "images/sec",
        "decode_only_images_per_sec": round(decode_rate, 1),
        "config": {"frames": args.frames, "hw": args.hw, "batch": args.batch,
                   "workers": args.workers, "format": args.format,
                   "decoder": "PIL (faster than reference's skimage)"},
    }
    out = Path(__file__).resolve().parents[1] / "reports" / "reference_control.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
