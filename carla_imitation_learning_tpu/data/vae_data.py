"""VAE datasets: pooled and leave-one-out splits over resized grayscale frames.

Reference: src/dataset/vae_dataset.py —
- reads ``raw/<log>/<camera>_resized_224_bw/*.png`` for cameras FL/FR/RR/SL/SR
  (vae_dataset.py:90-92; configs/model/vae.yaml:4),
- 'pooled_data': all train_logs pooled, two random train_test_splits
  (:86-117; its VAL_SIZE/VALID_SIZE key bug §5.5 is fixed here),
- 'leave_one_out_data': random train/val split of train_logs, test = test_logs
  (:120-145; the dict-vs-tuple return bug §5.4 is fixed here).

Returns the same {'train_dataloader','val_dataloader','test_dataloader'} dict
shape; batches are (B, H, W, 1) float arrays in [0, 1].
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

import jax.numpy as jnp

from carla_imitation_learning_tpu.data import frame_log as fl


class ImageDataset:
    """Unlabeled image iterator over a packed (N, H, W) uint8 array."""

    def __init__(self, frames: np.ndarray, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, sharding=None):
        self.frames = jnp.asarray(frames)
        self.batch_size = batch_size
        self.shuffle = shuffle
        # a sharded partial batch whose remainder doesn't divide the mesh's
        # 'data' axis fails device_put mid-epoch — sharded loaders drop it
        # (same rule as pipeline._loaders_from_stores for BC train loaders)
        self.drop_last = drop_last or sharding is not None
        self._rng = np.random.default_rng(seed)
        self.n = len(frames)
        self._sharding = sharding  # batch sharding over the mesh 'data' axis

    def __len__(self) -> int:
        if self.drop_last and self.n >= self.batch_size:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator:
        order = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(order)
        import jax

        for b in range(len(self)):
            idx = jnp.asarray(order[b * self.batch_size:(b + 1) * self.batch_size])
            x = self.frames[idx].astype(jnp.float32) / 255.0
            x = x[..., None]  # (B, H, W, 1)
            if self._sharding is not None:
                x = jax.device_put(x, self._sharding)
            yield x


def _camera_dir(data_dir: Path, log: str, camera: str, image_size) -> Path:
    """Prefer the reference's '<camera>_resized_224_bw' layout; fall back to
    the raw camera folder."""
    h = image_size[1] if isinstance(image_size, (list, tuple)) else 224
    resized = data_dir / "raw" / log / f"{camera}_resized_{h}_bw"
    return resized if resized.is_dir() else data_dir / "raw" / log / camera


def _load_frames(cfg, logs, camera) -> np.ndarray:
    data_dir = Path(cfg["data_dir"])
    parts = []
    h = (cfg.get("image_size") or [1, 224, 224])
    h = h[1] if isinstance(h, (list, tuple)) else 224
    for log in logs:
        # The reference's '<camera>_resized_<h>_bw' layout wins when present:
        # it is the only tier guaranteed to match cfg image_size (the packed
        # framestore stores collection-resolution frames). Packed tier next
        # (collect_multicamera writes <cam>.tpuilfs at memcpy speed — no PNG
        # decode on load either), raw per-file folder last.
        resized = data_dir / "raw" / log / f"{camera}_resized_{h}_bw"
        packed = data_dir / "raw" / log / f"{camera}.tpuilfs"
        if packed.exists() and not resized.is_dir():
            try:
                from carla_imitation_learning_tpu.native import NativeFrameStore

                nfs = NativeFrameStore(packed)
                parts.append(np.array(nfs.frames))
                nfs.close()
                continue
            except Exception:
                pass  # fall through to the per-file layout
        flog = fl.FrameLog(_camera_dir(data_dir, log, camera, cfg.get("image_size")))
        parts.append(flog.read_all_gray_u8())
    return np.concatenate(parts, axis=0)


def get_pooled_data(cfg, camera: str) -> dict[str, np.ndarray]:
    """Pooled random splits (reference vae_dataset.py:86-117 intent)."""
    frames = _load_frames(cfg, cfg["train_logs"], camera)
    rng = np.random.default_rng(int(cfg.get("data_seed", 0)))
    idx = rng.permutation(len(frames))
    t = float(cfg["TEST_SIZE"])
    v = float(cfg["VALID_SIZE"])
    n_test = int(t * len(frames))
    n_val = int(v * len(frames))
    test_id, val_id, train_id = np.split(idx, [n_test, n_test + n_val])
    return {"train": frames[train_id], "val": frames[val_id], "test": frames[test_id]}


def get_leave_out_data(cfg, camera: str) -> dict[str, np.ndarray]:
    """train/val from train_logs, test = held-out test_logs
    (reference vae_dataset.py:120-145 intent)."""
    frames = _load_frames(cfg, cfg["train_logs"], camera)
    rng = np.random.default_rng(int(cfg.get("data_seed", 0)))
    idx = rng.permutation(len(frames))
    n_val = int(float(cfg["VALID_SIZE"]) * len(frames))
    val_id, train_id = np.split(idx, [n_val])
    test = _load_frames(cfg, cfg["test_logs"], camera)
    return {"train": frames[train_id], "val": frames[val_id], "test": test}


def train_val_test_iterator(cfg, data_split_type: str = "pooled_data",
                            sharding=None) -> dict:
    """Public factory mirroring reference vae_dataset.train_val_test_iterator
    (vae_dataset.py:42-83). ``sharding`` batch-shards training batches over
    the mesh 'data' axis (the uniform gpus= treatment of reference train.py)."""
    camera = cfg["camera"] if isinstance(cfg["camera"], str) else cfg["camera"][0]
    get_data = {"pooled_data": get_pooled_data,
                "leave_one_out_data": get_leave_out_data}
    data = get_data[data_split_type](cfg, camera)
    bs = int(cfg["BATCH_SIZE"])
    seed = int(cfg.get("seed", 0))
    return {
        "train_dataloader": ImageDataset(data["train"], bs, shuffle=True,
                                         seed=seed, sharding=sharding),
        "val_dataloader": ImageDataset(data["val"], bs),
        "test_dataloader": ImageDataset(data["test"], bs),
    }
