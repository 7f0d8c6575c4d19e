"""Offline ETL: frame-folder compression/export + resize preprocessing.

Reference: src/data/create_data.py:6-18 (``compress_data``: imread_collection
a camera folder → int8 ndarray → deepdish h5). Here: npz by default (no
deepdish in the image), h5 via h5py when available, plus the resize-to-NxN
grayscale preprocessing that produces the reference's
``<camera>_resized_224_bw`` folders (vae_dataset.py:90-92).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from carla_imitation_learning_tpu.data import frame_log as fl


def compress_data(cfg, log: str | None = None, camera: str | None = None,
                  out_path: str | None = None) -> Path:
    """Pack a camera folder into one compressed array file.

    Equivalent of reference compress_data (create_data.py:6-18), minus the
    int8-overflow it inherits from casting uint8 images to int8.
    """
    log = log or cfg["train_logs"][0]
    camera = camera or (cfg["camera"] if isinstance(cfg["camera"], str)
                        else cfg["camera"][0])
    data_dir = Path(cfg["data_dir"])
    flog = fl.FrameLog(data_dir / "raw" / log / camera)
    frames = flog.read_all_gray_u8()
    out = Path(out_path) if out_path else data_dir / "processed" / f"{log}_{camera}.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.suffix in (".h5", ".hdf5"):
        try:
            import h5py

            with h5py.File(out, "w") as f:
                f.create_dataset("images", data=frames, compression="gzip")
            return out
        except ImportError:
            out = out.with_suffix(".npz")
    np.savez_compressed(out, images=frames, file_idx=flog.file_idx)
    return out


def load_compressed(path: str | Path) -> np.ndarray:
    path = Path(path)
    if path.suffix in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            return np.asarray(f["images"])
    return np.load(path)["images"]


def resize_camera_folder(cfg, log: str, camera: str, size: int = 224) -> Path:
    """Produce the ``<camera>_resized_<size>_bw`` folder the reference's VAE
    path consumes (vae_dataset.py:90-92): grayscale, size×size PNGs."""
    from PIL import Image

    data_dir = Path(cfg["data_dir"])
    src = fl.FrameLog(data_dir / "raw" / log / camera)
    dst = data_dir / "raw" / log / f"{camera}_resized_{size}_bw"
    dst.mkdir(parents=True, exist_ok=True)
    for i, name in enumerate(src.names):
        img = src.read(i)
        if img.ndim == 3:
            img = np.round(img[..., :3] @ fl.LUMA).astype(np.uint8)
        im = Image.fromarray(img).resize((size, size), Image.BILINEAR)
        im.save(dst / f"{Path(name).stem}.png")
    return dst
