"""Sharded framestores: the beyond-one-file / beyond-RAM streaming tier.

One packed ``.tpuilfs`` file (native/framestore.cpp) holds a whole dataset in
a single mmap; past host-RAM scale that stops fitting in one file and one
shuffle domain. This module shards a dataset across N files — the same
two-level layout every large-scale input pipeline uses (tfrecord shards,
WebDataset tars):

- ``save_sharded_framestore``  — split a FrameStore into ~equal shard files,
  CUTTING ONLY AT EPISODE STARTS when the store carries them, so no training
  window can ever straddle a shard boundary (the shard cut IS an episode
  boundary). Each shard also carries the v2 starts bitmap, so IN-shard
  resets are boundary-masked by the C++ reader too. Writes an
  ``index.json`` manifest.
- ``ShardedFrameStore``        — manifest view: shapes, per-shard counts,
  lazy mmap access to any shard.
- ``ShardedPrefetchReader``    — two-level shuffled iteration: shard order
  reshuffles every epoch (seed+epoch), windows shuffle inside each shard via
  the existing multi-threaded C++ prefetcher. Only ONE shard is mmap'd at a
  time, so host memory stays O(shard), not O(dataset).

Reference note: the reference's LargeTorchDataset (imitation_dataset.py:49-87)
is its beyond-RAM answer — per-sample imread from disk; this tier replaces it
with mmap'd packed shards + native prefetch at ~1000× the throughput.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from carla_imitation_learning_tpu.native.framestore import (
    NativeFrameStore, PrefetchReader, save_framestore,
)

INDEX_NAME = "index.json"


def _cut_points(n: int, starts: np.ndarray | None, target: int
                ) -> tuple[list[int], bool]:
    """→ (shard cut indices (ascending, excluding 0 and n), aligned).

    Each cut is the largest episode start ≤ the ~target multiple; when a
    single episode exceeds the shard size (no start in range) the cut falls
    back to the raw multiple and ``aligned`` comes back False — the manifest
    must not claim window-safety it doesn't have."""
    cuts = []
    prev = 0
    aligned = starts is not None
    start_idx = (np.nonzero(np.asarray(starts, bool))[0]
                 if starts is not None else np.empty(0, np.int64))
    while n - prev > target:
        want = prev + target
        cands = start_idx[(start_idx > prev) & (start_idx <= want)]
        if len(cands):
            cut = int(cands[-1])
        else:
            cut = want
            aligned = False
        cuts.append(cut)
        prev = cut
    return cuts, aligned


def save_sharded_framestore(out_dir: str | os.PathLike, store,
                            shard_frames: int = 4096) -> Path:
    """Write ``store`` as shard files + manifest under ``out_dir``.

    Cuts align to ``store.starts`` when present (windows never cross shards);
    each shard is a self-contained single-file framestore readable on its own.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(store.frames)
    starts = getattr(store, "starts", None)
    cuts, aligned = _cut_points(n, starts, int(shard_frames))
    bounds = [0] + cuts + [n]
    shards = []
    for i, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        fname = f"shard-{i:05d}.tpuilfs"
        save_framestore(out / fname, store.slice(lo, hi))
        shards.append({"file": fname, "n": int(hi - lo)})
    manifest = {
        "version": 1,
        "height": int(store.frames.shape[1]),
        "width": int(store.frames.shape[2]),
        "n_frames": int(n),
        "aligned_to_starts": bool(aligned),
        "shards": shards,
    }
    (out / INDEX_NAME).write_text(json.dumps(manifest, indent=1))
    return out


class ShardedFrameStore:
    """Manifest view over a shard directory (no shard is opened until asked)."""

    def __init__(self, path: str | os.PathLike):
        self.dir = Path(path)
        manifest = json.loads((self.dir / INDEX_NAME).read_text())
        if manifest.get("version") != 1:
            raise ValueError(f"unknown shard manifest version: {manifest.get('version')}")
        self.height = manifest["height"]
        self.width = manifest["width"]
        self.n_frames = manifest["n_frames"]
        self.aligned_to_starts = manifest.get("aligned_to_starts", False)
        self.shards = manifest["shards"]

    @property
    def n_shards(self) -> int:
        return len(self.shards)

    def open_shard(self, i: int) -> NativeFrameStore:
        """mmap shard ``i`` (caller closes)."""
        return NativeFrameStore(self.dir / self.shards[i]["file"])

    def shard_frames(self, i: int) -> int:
        return self.shards[i]["n"]


class DeviceShardStreamer:
    """Direct framestore→device streaming (no host window hop).

    The host-gather tier (PrefetchReader → numpy window batches → device_put)
    moves every window's pixels over H2D — ``frame_skip``× the unique bytes,
    re-assembled by host threads first. This tier instead uploads each
    shard's RAW frame block to the device ONCE (one async H2D straight from
    the mmap — zero host transform, zero copy beyond the DMA itself) and
    performs the window gather ON DEVICE per batch, exactly like the in-HBM
    DeviceDataset path. The next shard's upload is issued before the current
    shard's batches finish, so the DMA rides under training compute
    (double-buffered shard residency: device memory stays O(2 shards)).

    Yields ``(x (B, H, W, frame_skip) dtype in [0,1], y (B,) int32)`` device
    batches — the train-step contract, not the host uint8 contract. Window
    starts respect the shard's episode-start bitmap (windows and their label
    never cross a boundary — same rule as DeviceDataset).
    """

    def __init__(self, store: "ShardedFrameStore | str | os.PathLike",
                 batch: int, frame_skip: int = 4, dtype: str = "float32",
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        if not isinstance(store, ShardedFrameStore):
            p = Path(store)
            if p.is_file():  # single-file framestore = one shard
                self._single = p
                self.store = None
            else:
                self.store = ShardedFrameStore(p)
                self._single = None
        else:
            self.store = store
            self._single = None
        self.batch = batch
        self.frame_skip = frame_skip
        self.dtype = dtype
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def _shard_paths(self) -> list[Path]:
        if self._single is not None:
            return [self._single]
        return [self.store.dir / s["file"] for s in self.store.shards]

    @staticmethod
    def _valid_starts(n: int, starts: np.ndarray | None, span: int) -> np.ndarray:
        from carla_imitation_learning_tpu.data.pipeline import valid_window_starts

        return valid_window_starts(n, starts, span)

    def _load_shard(self, path: Path):
        """mmap → (async device frames, device actions, valid starts)."""
        import jax

        nfs = NativeFrameStore(path)
        try:
            # one contiguous memcpy out of the mmap (the view must not outlive
            # the close — device_put's DMA is async), then an async H2D of the
            # raw frame block; no window assembly anywhere on the host
            frames = np.array(nfs.frames)
            actions = np.array(nfs.actions).astype(np.int32)
            valid = self._valid_starts(
                len(frames), nfs.starts, self.frame_skip)
        finally:
            nfs.close()
        return jax.device_put(frames), jax.device_put(actions), valid

    def device_shards(self):
        """Yield ``(dev_frames, dev_actions, shuffled_window_starts)`` per
        shard in epoch order, with the NEXT shard's DMA already issued —
        the building block for shard-fused training (one lax.scan dispatch
        per shard instead of one per batch)."""
        paths = self._shard_paths()
        order = np.arange(len(paths))
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1
        pending = self._load_shard(paths[order[0]])
        for pos, si in enumerate(order):
            dev_frames, dev_actions, valid = pending
            if pos + 1 < len(order):  # issue the next shard's DMA now
                pending = self._load_shard(paths[order[pos + 1]])
            if len(valid) == 0:
                continue
            widx = valid.copy()
            if self.shuffle:
                rng.shuffle(widx)
            yield dev_frames, dev_actions, widx

    def __iter__(self):
        import jax.numpy as jnp

        from carla_imitation_learning_tpu.data.pipeline import gather_windows

        for dev_frames, dev_actions, widx in self.device_shards():
            # drop_last is strict per shard: a short batch mid-epoch would
            # force a jit recompile per unique shape (expensive remotely)
            nb = (len(widx) // self.batch if self.drop_last
                  else -(-len(widx) // self.batch))
            for b in range(nb):
                idx = jnp.asarray(widx[b * self.batch:(b + 1) * self.batch],
                                  jnp.int32)
                x = gather_windows(dev_frames, idx, self.frame_skip, self.dtype)
                yield x, dev_actions[idx + self.frame_skip]

    def __len__(self) -> int:
        total = 0
        for p in self._shard_paths():
            nfs = NativeFrameStore(p)
            try:
                v = len(self._valid_starts(len(nfs.frames), nfs.starts,
                                           self.frame_skip))
            finally:
                nfs.close()
            if v:
                total += (v // self.batch if self.drop_last
                          else -(-v // self.batch))
        return total


class ShardedPrefetchReader:
    """Two-level shuffled window-batch iterator over a shard directory.

    Epoch e visits shards in a seed+e permutation; inside a shard the C++
    prefetcher gathers shuffled window batches. Yields the same
    (frames uint8 (B, fs, H, W), labels i32 (B,)) contract as PrefetchReader.
    Host memory: one mmap'd shard at a time.
    """

    def __init__(self, store: ShardedFrameStore, batch: int,
                 frame_skip: int = 4, n_threads: int = 4,
                 shuffle: bool = True, seed: int = 0, max_queue: int = 4):
        self.store = store
        self.batch = batch
        self.frame_skip = frame_skip
        self.n_threads = n_threads
        self.shuffle = shuffle
        self.seed = seed
        self.max_queue = max_queue
        self._epoch = 0

    def __len__(self) -> int:
        # valid-window counts respect in-shard episode boundaries (v2 stores
        # carry the starts bitmap; the C++ reader masks crossing windows)
        total = 0
        for i in range(self.store.n_shards):
            if self.store.shard_frames(i) <= self.frame_skip:
                continue
            nfs = self.store.open_shard(i)
            try:
                v = nfs.n_valid_windows(self.frame_skip)
            finally:
                nfs.close()
            if v > 0:
                total += max(1, v // self.batch)
        return total

    def __iter__(self):
        order = np.arange(self.store.n_shards)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        for si in order:
            if self.store.shard_frames(int(si)) <= self.frame_skip:
                continue  # shard too small for one window
            nfs = self.store.open_shard(int(si))
            try:
                if nfs.n_valid_windows(self.frame_skip) == 0:
                    continue  # every window would cross a boundary
                reader = PrefetchReader(
                    nfs, batch=self.batch, frame_skip=self.frame_skip,
                    n_threads=self.n_threads, shuffle=self.shuffle,
                    seed=self.seed + 1000 * self._epoch + int(si),
                    max_queue=self.max_queue)
                yield from reader
            finally:
                nfs.close()
