"""On-device input pipeline: packed frame stores + jit'd window gather.

The reference's hot loop decodes 4 image files from disk per *sample* inside
DataLoader worker processes (reference src/dataset/imitation_dataset.py:115-122)
— it is blatantly input-bound (SURVEY.md §3.1). The TPU-native design packs
each split's grayscale frames ONCE into a contiguous uint8 array that lives in
HBM; every training batch is then a pure on-device gather:

    x = frames[idx[:, None] + arange(frame_skip)]  →  (B, H, W, frame_skip)

fused by XLA with the /255 normalization and any augmentation into the train
step. Zero host work, zero H2D traffic per step (only the index vector).

Semantics preserved from the reference (SequentialTorchDataset,
imitation_dataset.py:90-136): sorted numeric frame files, luminance grayscale,
window = frames[k : k+frame_skip], label = action[k + frame_skip],
len = N - frame_skip. The reference hardcodes ``index + 4`` (defect §5.7); we
use ``frame_skip`` everywhere.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.data import actions as action_lib
from carla_imitation_learning_tpu.data import frame_log as fl


@dataclasses.dataclass
class FrameStore:
    """Packed frames + aligned targets for one split.

    frames:  (N, H, W) uint8 luminance (or float32 in [0,1] when exactness is
             needed — tests).
    actions: (N,) int32 discrete action per frame.
    traffic: (N,) int32 red-light status per frame.
    sensors: (N, 3) float32 ``(current_steer, speed_long, speed)``.
    """

    frames: np.ndarray
    actions: np.ndarray
    traffic: np.ndarray
    sensors: np.ndarray
    commands: np.ndarray | None = None  # (N,) CIL navigation commands, optional
    # (N,) bool, True where a frame BEGINS a new episode/stream (env stream
    # starts, auto-resets, aggregation-round boundaries). None = one single
    # uninterrupted stream (the reference's per-log layout). DeviceDataset
    # uses this to never sample a window that crosses a boundary.
    starts: np.ndarray | None = None
    # (N,) int — 0-based raw-log frame id of each frame (file name − 1,
    # reference imitation_dataset.py:103-105). Lets paired streams (e.g. the
    # raw↔semantic cameras of bc_raw_segment) align frame-for-frame even
    # after the 80/10/10 sequential split re-bases positions. None for
    # simulator-collected stores (position IS the id within the stream).
    file_idx: np.ndarray | None = None
    # (N, 2) float32 EXPERT (steer, accel) per frame — the continuous-control
    # tier's regression targets (accel = throttle − brake). Filled by
    # collect_dataset from the autopilot regardless of who DRIVES, so
    # continuous DAgger aggregation works exactly like the discrete
    # ``actions`` labels. None for reference-layout stores (derive from the
    # state log instead).
    controls: np.ndarray | None = None

    def __len__(self) -> int:
        return len(self.frames)

    @property
    def height(self) -> int:
        return self.frames.shape[1]

    @property
    def width(self) -> int:
        return self.frames.shape[2]

    @classmethod
    def from_arrays(cls, frames: np.ndarray, state: fl.StateLog, file_idx=None,
                    starts: np.ndarray | None = None) -> "FrameStore":
        """Align a (N,H,W) frame array with a StateLog via 1-based file indices."""
        if file_idx is None:
            file_idx = np.arange(len(frames))
        acts = np.asarray(
            action_lib.continuous_to_discrete(state.steer, state.throttle, state.brake)
        ).astype(np.int32)
        return cls(
            frames=frames,
            actions=acts[file_idx],
            traffic=np.asarray(state.trafficlight).astype(np.int32)[file_idx],
            sensors=state.sensors[file_idx],
            starts=starts,
            file_idx=np.asarray(file_idx),
        )

    @classmethod
    def from_processed_dir(cls, cfg, split: str, log: str | None = None) -> "FrameStore":
        """Load the reference's processed-sequential layout:
        ``<data_dir>/processed/<log>/<split>/<log>/`` frames + ``raw/state.csv``
        (reference imitation_dataset.py:94-110)."""
        log = log or cfg["train_logs"][0]
        data_dir = Path(cfg["data_dir"])
        frame_dir = data_dir / "processed" / log / split / log
        if not frame_dir.is_dir():
            # fall back to the configured camera's folder, else the sole
            # frame subfolder under the split
            camera = cfg.get("camera")
            camera = camera[0] if isinstance(camera, list) else camera
            cam_dir = data_dir / "processed" / log / split / str(camera)
            if cam_dir.is_dir():
                frame_dir = cam_dir
            else:
                subdirs = [p for p in (data_dir / "processed" / log / split).iterdir()
                           if p.is_dir()]
                if len(subdirs) != 1:
                    raise FileNotFoundError(
                        f"expected {frame_dir}, {cam_dir}, or exactly one frame "
                        f"folder, got {subdirs}")
                frame_dir = subdirs[0]
        flog = fl.FrameLog(frame_dir)
        state_path = data_dir / "raw" / log / "state.csv"
        if not state_path.exists():
            state_path = data_dir / "raw" / "state.csv"
        state = fl.load_state_csv(state_path)
        return cls.from_arrays(flog.read_all_gray_u8(), state, flog.file_idx)

    @classmethod
    def from_raw_camera(cls, cfg, log: str, camera: str) -> "FrameStore":
        """Load straight from ``raw/<log>/<camera>/`` (pooled/large paths,
        reference imitation_dataset.py:49-87, 342-381)."""
        data_dir = Path(cfg["data_dir"])
        flog = fl.FrameLog(data_dir / "raw" / log / camera)
        state_path = data_dir / "raw" / log / "state.csv"
        if not state_path.exists():
            state_path = data_dir / "raw" / "state.csv"
        state = fl.load_state_csv(state_path)
        return cls.from_arrays(flog.read_all_gray_u8(), state, flog.file_idx)

    @classmethod
    def synthetic(cls, n: int = 64, height: int = 64, width: int = 64, seed: int = 0) -> "FrameStore":
        state = fl.make_synthetic_state(n, seed)
        rgb = fl.synthetic_frames(n, height, width, seed)
        gray = np.round(rgb[..., :3].astype(np.float64) @ fl.LUMA).astype(np.uint8)
        return cls.from_arrays(gray, state)

    def slice(self, start: int, stop: int) -> "FrameStore":
        starts = None
        if self.starts is not None:
            starts = self.starts[start:stop].copy()
            if len(starts):
                starts[0] = True
        return FrameStore(
            self.frames[start:stop], self.actions[start:stop],
            self.traffic[start:stop], self.sensors[start:stop],
            None if self.commands is None else self.commands[start:stop],
            starts,
            None if self.file_idx is None else self.file_idx[start:stop],
            None if self.controls is None else self.controls[start:stop],
        )

    @classmethod
    def concat(cls, stores: list["FrameStore"]) -> "FrameStore":
        """Concatenate stores (e.g. DAgger aggregation rounds), marking each
        store's first frame as an episode start so windows never straddle an
        aggregation boundary."""
        starts = []
        for s in stores:
            st = (s.starts.copy() if s.starts is not None
                  else np.zeros(len(s), bool))
            if len(st):
                st[0] = True
            starts.append(st)
        any_cmd = all(s.commands is not None for s in stores)
        any_ctl = all(s.controls is not None for s in stores)
        return cls(
            frames=np.concatenate([s.frames for s in stores]),
            actions=np.concatenate([s.actions for s in stores]),
            traffic=np.concatenate([s.traffic for s in stores]),
            sensors=np.concatenate([s.sensors for s in stores]),
            commands=(np.concatenate([s.commands for s in stores])
                      if any_cmd else None),
            starts=np.concatenate(starts),
            controls=(np.concatenate([s.controls for s in stores])
                      if any_ctl else None),
        )


def _normalize(frames_u8: jnp.ndarray, dtype) -> jnp.ndarray:
    if frames_u8.dtype == jnp.uint8:
        return frames_u8.astype(dtype) * (1.0 / 255.0)
    return frames_u8.astype(dtype)


@functools.partial(jax.jit, static_argnames=("frame_skip", "dtype_name"))
def gather_windows(frames, idx, frame_skip: int, dtype_name: str = "float32"):
    """(N,H,W) + (B,) start indices → (B, H, W, frame_skip) NHWC window stack.

    NHWC is the TPU-native conv layout; the reference's channel-first stacking
    (imitation_dataset.py:115-122) is a torch convention, not a data semantic.

    A trailing camera axis — frames (N,H,W,K) — yields (B, H, W, frame_skip·K)
    with channel index t·K + c (time-major, camera-minor): EXACTLY the layout
    the surround-view rollout framebuf maintains (closed_loop.update_framebuf
    shifts by K and appends the K current views), so offline surround training
    and the closed loop see identical observations by construction.
    """
    dtype = jnp.dtype(dtype_name)
    windows = frames[idx[:, None] + jnp.arange(frame_skip)[None, :]]  # (B, fs, H, W[, K])
    if windows.ndim == 5:
        x = jnp.transpose(windows, (0, 2, 3, 1, 4))  # (B, H, W, fs, K)
        x = x.reshape(x.shape[:3] + (frame_skip * windows.shape[-1],))
        return _normalize(x, dtype)
    return _normalize(jnp.transpose(windows, (0, 2, 3, 1)), dtype)


def valid_window_starts(n_frames: int, starts: np.ndarray | None, span: int,
                        n_starts: int | None = None) -> np.ndarray:
    """Window-start indices whose span stays inside one episode.

    A window starting at i touches frames (i, i+span]; it is dropped if any
    of those frames BEGINS a new episode/stream (``starts`` bitmap). The ONE
    boundary rule shared by DeviceDataset (span = window ∪ label),
    SequenceDataset (span = seq_len-1) and DeviceShardStreamer — fix it here,
    it applies everywhere.
    """
    n = n_starts if n_starts is not None else n_frames - span
    base = np.arange(max(n, 0), dtype=np.int32)
    if starts is None or span <= 0 or len(base) == 0:
        return base
    st = np.asarray(starts, bool)
    crosses = np.zeros(len(base), bool)
    for d in range(1, span + 1):
        crosses |= st[d:d + len(base)]
    return base[~crosses]


class DeviceDataset:
    """Iterator over on-device batches from a FrameStore.

    Yields ``(x, y)`` with x:(B,H,W,frame_skip) and y:(B,) int32, or with
    ``aux=True`` yields ``((x, sensor), (traffic, action))`` matching the
    reference's SequentialAuxTorchDataset contract (imitation_dataset.py:139-194).
    With ``continuous_labels`` (an (n_frames, d) float array), y is the
    labeled frame's float row instead — regression targets for the
    continuous-control tier.
    """

    def __init__(
        self,
        store: FrameStore,
        batch_size: int,
        frame_skip: int = 4,
        shuffle: bool = False,
        seed: int = 0,
        aux: bool = False,
        drop_last: bool = True,
        dtype: str = "float32",
        sharding=None,
        label_offset: int | None = None,
        cil: bool = False,
        sample_mask: np.ndarray | None = None,
        balanced: bool = False,
        balance_key: str = "action",
        continuous_labels: np.ndarray | None = None,
        extra_frames: "list[np.ndarray] | None" = None,
    ):
        self.store = store
        self.batch_size = batch_size
        self.frame_skip = frame_skip
        self.shuffle = shuffle
        self.aux = aux
        self.cil = cil
        self.drop_last = drop_last
        self.dtype = dtype
        self._rng = np.random.default_rng(seed)
        # Sequential windows label the frame AFTER the window (reference
        # imitation_dataset.py:124-131: x = frames[k:k+4], y = y[k+4]);
        # single-frame paths label the same frame (LargeTorchDataset :77-84).
        self.label_offset = frame_skip if label_offset is None else label_offset
        span = max(frame_skip - 1, self.label_offset)
        n_starts = len(store) - span
        if n_starts <= 0:
            raise ValueError(
                f"store with {len(store)} frames too small for frame_skip={frame_skip}"
            )
        # Valid window starts: the window AND its label must lie within one
        # episode — no episode boundary strictly inside (i, i+span]. The
        # reference's windows are single-stream by construction
        # (imitation_dataset.py:115-131); collected/aggregated stores mark
        # their stream/reset boundaries in store.starts.
        valid = valid_window_starts(len(store), store.starts, span,
                                    n_starts=n_starts)
        if len(valid) == 0:
            raise ValueError("no episode is long enough for a full window")
        if sample_mask is not None:
            # per-frame gate on the LABELED frame (e.g. uncertainty-gated
            # DAgger trains only windows whose queried state was uncertain);
            # windows stay contiguous — the mask selects starts, not frames
            mask = np.asarray(sample_mask, bool)
            if mask.shape[0] != len(store):
                raise ValueError(
                    f"sample_mask has {mask.shape[0]} entries for a "
                    f"{len(store)}-frame store")
            valid = valid[mask[valid + self.label_offset]]
            if len(valid) == 0:
                raise ValueError("sample_mask excludes every training window")
        self.n_samples = len(valid)
        self._all_valid = len(valid) == n_starts
        # Inverse-frequency class balancing (driving data is dominated by
        # the cruise action — CIL's known steering-imbalance problem): each
        # epoch draws n_samples windows WITH replacement, weighted 1/freq of
        # the balance key, so every class contributes ~equally.
        # ``balance_key`` picks the key: "action" (the reference-era
        # steering-imbalance fix), "command" (CIL branch starvation — the
        # goal-nav histogram is dominated by follow; measured r3:
        # right-turn got 0.13% of frames), or "action_command" (joint:
        # every (branch, action) cell the data contains draws ~equally).
        self._balance_p = None
        if balanced:
            labeled = valid + self.label_offset
            actions_l = np.asarray(store.actions, np.int64)[labeled]
            if balance_key != "action":
                cmds = (np.asarray(store.commands, np.int64)[labeled]
                        if store.commands is not None
                        else np.zeros(len(labeled), np.int64))
            if balance_key == "action":
                keys = actions_l
            elif balance_key == "command":
                keys = cmds
            elif balance_key == "action_command":
                _, keys = np.unique(
                    np.stack([actions_l, cmds], axis=1), axis=0,
                    return_inverse=True)
            else:
                raise ValueError(
                    f"balance_key={balance_key!r}: expected 'action', "
                    "'command', or 'action_command'")
            counts = np.bincount(keys)
            w = 1.0 / counts[keys]
            self._balance_p = w / w.sum()
        # Device-resident packed arrays (replicated under a mesh; batches are
        # sharded by sharding the index vector).
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(sharding.mesh, PartitionSpec())
            device_put = lambda a: jax.device_put(a, replicated)  # noqa: E731
        else:
            device_put = jnp.asarray
        # sample index → frame start index (identity when every start is
        # valid; a tiny device gather otherwise, fused into the batch gather)
        self._valid_starts = None if self._all_valid else device_put(valid)
        # Surround view: extra per-camera streams, frame-aligned with the
        # store (same ids, same starts bitmap — they come from ONE
        # collect_multicamera trajectory). Stacked as a trailing camera axis;
        # gather_windows then emits the time-major/camera-minor channel
        # layout the rollout framebuf maintains.
        if extra_frames:
            for i, ef in enumerate(extra_frames):
                if ef.shape != store.frames.shape:
                    raise ValueError(
                        f"extra_frames[{i}] has shape {ef.shape}; must match "
                        f"the base store's {store.frames.shape}")
            self.frames = device_put(
                np.stack([store.frames, *extra_frames], axis=-1))
        else:
            self.frames = device_put(store.frames)
        self.actions = device_put(store.actions.astype(np.int32))
        self.traffic = device_put(store.traffic.astype(np.int32))
        self.sensors = device_put(store.sensors.astype(np.float32))
        commands = (store.commands if store.commands is not None
                    else np.zeros(len(store), np.int32))
        self.commands = device_put(commands.astype(np.int32))
        # Continuous regression targets (e.g. (steer, accel) for
        # ContinuousPolicyCNN): per-FRAME float rows aligned with the store;
        # when given, y is the labeled frame's row instead of the discrete
        # action id. Window/boundary semantics are identical.
        self._cont = None
        if continuous_labels is not None:
            if aux or cil:
                raise ValueError(
                    "continuous_labels is exclusive with aux/cil batches")
            cont = np.asarray(continuous_labels, np.float32)
            if cont.ndim != 2 or cont.shape[0] != len(store):
                raise ValueError(
                    f"continuous_labels must be (n_frames, d); got "
                    f"{cont.shape} for a {len(store)}-frame store")
            self._cont = device_put(cont)
        self._idx_sharding = sharding

    def __len__(self) -> int:
        if self.drop_last and self.n_samples >= self.batch_size:
            return self.n_samples // self.batch_size
        # never silently produce zero batches: fall back to a partial batch
        return -(-self.n_samples // self.batch_size)

    def epoch_indices(self) -> np.ndarray:
        if self._balance_p is not None:
            return self._rng.choice(self.n_samples, size=self.n_samples,
                                    replace=True, p=self._balance_p)
        order = np.arange(self.n_samples)
        if self.shuffle:
            self._rng.shuffle(order)
        return order

    def pure_batch(self, idx):
        """Batch from a traced SAMPLE-index vector in [0, n_samples) —
        jit/scan-safe (used by the fused-epoch trainer: the whole epoch runs
        as one lax.scan). Sample indices map to episode-valid window starts."""
        if self._valid_starts is not None:
            idx = self._valid_starts[idx]
        x = gather_windows(self.frames, idx, self.frame_skip, self.dtype)
        if self._cont is not None:
            return x, self._cont[idx + self.label_offset]
        y = self.actions[idx + self.label_offset]
        if self.cil:
            speed = self.sensors[idx + self.label_offset, 2]
            command = self.commands[idx + self.label_offset]
            return x, speed, command, y
        if not self.aux:
            return x, y
        sensor = self.sensors[idx + self.label_offset]
        traffic = self.traffic[idx + self.label_offset]
        return (x, sensor), jnp.stack([traffic, y], axis=-1)

    def make_batch(self, idx: np.ndarray):
        idx = jnp.asarray(idx, dtype=jnp.int32)
        if self._idx_sharding is not None:
            idx = jax.device_put(idx, self._idx_sharding)
        return self.pure_batch(idx)

    def fork(self, seed: int) -> "DeviceDataset":
        """Shallow copy with FRESH shuffle/PRNG state sharing the same device
        arrays — per-trial loader isolation for concurrent HPO (threaded
        trials each iterate their own fork; zero extra HBM)."""
        import copy

        forked = copy.copy(self)
        forked._rng = np.random.default_rng(seed)
        return forked

    def start_indices(self, idx: np.ndarray) -> jnp.ndarray:
        """SAMPLE indices → episode-valid window START indices, as a device
        array (sharded like a batch index vector). Paired-stream loaders
        (e.g. bc_raw_segment's semantic stream) MUST map through this — raw
        sample positions skip episode-crossing windows, so feeding them to
        gather_windows directly would misalign the streams."""
        idx = jnp.asarray(idx, dtype=jnp.int32)
        if self._idx_sharding is not None:
            idx = jax.device_put(idx, self._idx_sharding)
        if self._valid_starts is not None:
            idx = self._valid_starts[idx]
        return idx

    def __iter__(self) -> Iterator:
        order = self.epoch_indices()
        nb = len(self)
        for b in range(nb):
            yield self.make_batch(order[b * self.batch_size:(b + 1) * self.batch_size])


class PairedStreamDataset:
    """Zip a DeviceDataset with a second, frame-aligned camera stream.

    Yields ``(x, x_seg, y)`` for the dual-stream policy (reference
    ConvNetRawSegment, nets.py:42-78): both windows are gathered with the SAME
    episode-valid start indices, so raw and semantic pixels always come from
    the same frame ids. ``seg_frames`` must already be re-based to the base
    store's positions (see ``paired_sequential_iterator``)."""

    def __init__(self, base: DeviceDataset, seg_frames: np.ndarray):
        if len(seg_frames) != len(base.store):
            raise ValueError(
                f"paired stream has {len(seg_frames)} frames for a "
                f"{len(base.store)}-frame base store")
        self.base = base
        self.seg = jnp.asarray(seg_frames)
        self.batch_size = base.batch_size

    def __len__(self) -> int:
        return len(self.base)

    def __iter__(self) -> Iterator:
        order = self.base.epoch_indices()
        for b in range(len(self.base)):
            idx = order[b * self.base.batch_size:(b + 1) * self.base.batch_size]
            x, y = self.base.make_batch(idx)
            # sample index → episode-valid window START (never the raw sample
            # position: stores with boundaries skip crossing windows)
            sidx = self.base.start_indices(idx)
            xs = gather_windows(self.seg, sidx, self.base.frame_skip,
                                self.base.dtype)
            yield x, xs, y


class AuxSegDataset:
    """Zip an aux DeviceDataset with per-pixel semantic ground truth.

    Yields ``((frames, sensor), (traffic, action), seg_labels)`` for the
    seg-headed AuxNet (BASELINE config #3): ``seg_frames`` is the (N, H, W)
    uint8 class-id stream the same collection recorded
    (closed_loop.semantic_stream), frame-aligned with the base store. The
    seg label is the LAST OBSERVED frame of each window (start +
    frame_skip − 1) — the decoder segments what the trunk just saw, while
    the action label keeps its own offset contract.

    ``speed_dropout``: train-time probability of zeroing the speed columns
    (speed_long, speed) of each sample's sensor vector. Speed-conditioned
    BC learns the INERTIA shortcut — the expert's stopped-at-light frames
    teach speed≈0 → brake, so the deployed policy parks at spawn forever
    (measured: mean_speed 0.0, agreement 0.03 on-chip). Dropout forces the
    action head to read the pixels; the CIL-paper remedy."""

    def __init__(self, base: DeviceDataset, seg_frames: np.ndarray,
                 speed_dropout: float = 0.0, seed: int = 0):
        if len(seg_frames) != len(base.store):
            raise ValueError(
                f"semantic stream has {len(seg_frames)} frames for a "
                f"{len(base.store)}-frame base store")
        if not base.aux:
            raise ValueError("AuxSegDataset requires an aux=True base")
        self.base = base
        seg = np.asarray(seg_frames, np.int32)
        if base._idx_sharding is not None:
            # replicate over the base's mesh (same placement contract as the
            # DeviceDataset arrays): gathering a single-device operand with
            # MESH-SHARDED indices deadlocks the backend's collectives (one
            # device never joins the rendezvous — measured as an XLA
            # AllReduce 40 s termination abort on the 8-device CPU mesh)
            from jax.sharding import NamedSharding, PartitionSpec

            self.seg = jax.device_put(
                seg, NamedSharding(base._idx_sharding.mesh, PartitionSpec()))
        else:
            self.seg = jnp.asarray(seg)
        self.batch_size = base.batch_size
        self.speed_dropout = float(speed_dropout)
        self._drop_rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.base)

    def __iter__(self) -> Iterator:
        order = self.base.epoch_indices()
        for b in range(len(self.base)):
            idx = order[b * self.base.batch_size:(b + 1) * self.base.batch_size]
            (frames, sensor), y = self.base.make_batch(idx)
            if self.speed_dropout > 0.0:
                keep = (self._drop_rng.random(sensor.shape[0])
                        >= self.speed_dropout)
                mask = jnp.asarray(
                    np.concatenate([np.ones((sensor.shape[0], 1)),
                                    np.repeat(keep[:, None], 2, axis=1)],
                                   axis=1), sensor.dtype)
                sensor = sensor * mask
            sidx = self.base.start_indices(idx)
            yield ((frames, sensor), y,
                   self.seg[sidx + self.base.frame_skip - 1])


def rebase_stream(frames: np.ndarray, frames_file_idx: np.ndarray,
                  target_file_idx: np.ndarray | None) -> np.ndarray:
    """Select from a full-log frame array the frames whose raw-log ids match
    ``target_file_idx``, in that order — pairs a second camera stream with a
    split store frame-for-frame (the sequential split stores val/test at the
    80–90%/90–100% positions of the log, so position-based pairing is wrong
    for them)."""
    if target_file_idx is None:
        return frames[:]
    pos = np.searchsorted(frames_file_idx, target_file_idx)
    pos = np.clip(pos, 0, len(frames_file_idx) - 1)
    if not np.array_equal(np.asarray(frames_file_idx)[pos], target_file_idx):
        raise ValueError("paired stream is missing frames present in the "
                         "base camera log")
    return frames[pos]


def paired_sequential_iterator(cfg, sharding=None) -> dict:
    """Loaders for the dual-stream experiment (reference train.py:205-239):
    raw sequential-split stores zipped with the 'semantic' camera of the same
    log, aligned by raw frame id through FrameStore.file_idx."""
    stores = _sequential_stores(cfg)
    sem_dir = Path(cfg["data_dir"]) / "raw" / cfg["train_logs"][0] / "semantic"
    sem_full = sem_file_idx = None
    if sem_dir.is_dir():
        sem_log = fl.FrameLog(sem_dir)
        sem_full = sem_log.read_all_gray_u8()
        sem_file_idx = sem_log.file_idx
    out = {}
    for split, name in (("train", "train_dataloader"), ("val", "val_dataloader"),
                        ("test", "test_dataloader")):
        base = DeviceDataset(
            stores[split], int(cfg["BATCH_SIZE"]),
            frame_skip=int(cfg["frame_skip"]), drop_last=(split == "train"),
            dtype=str(cfg.get("compute_dtype_input", "float32")),
            sharding=(sharding if split == "train" else None))
        if sem_full is None:
            seg = stores[split].frames  # no semantic camera: degenerate pair
        else:
            seg = rebase_stream(sem_full, sem_file_idx, stores[split].file_idx)
        out[name] = PairedStreamDataset(base, seg)
    return out


class SequenceDataset:
    """(frames_seq (B, T, H, W, 1), actions_seq (B, T)) batches for latent
    world-model training (reports/Results.xlsx plan). Window starts respect
    ``episode_len`` boundaries when given (env-major collected streams) AND
    ``store.starts`` (mid-stream auto-resets marked by collect_dataset) —
    a training sequence never spans a crash-and-respawn, exactly like
    DeviceDataset's window masking."""

    def __init__(self, store: FrameStore, batch_size: int, seq_len: int = 8,
                 episode_len: int | None = None, shuffle: bool = True,
                 seed: int = 0, sharding=None,
                 continuous_actions: bool = False):
        """``continuous_actions=True`` yields the EXPERT's continuous
        (steer, accel) rows (store.controls) as the action sequences —
        (B, T, 2) float32 — for continuous-conditioned world models."""
        if continuous_actions and store.controls is None:
            raise ValueError(
                "continuous_actions=True needs store.controls (collected "
                "stores carry them; reference-layout stores do not)")
        self._sharding = sharding
        self.store = store
        self.batch_size = batch_size
        self.seq_len = seq_len
        self._rng = np.random.default_rng(seed)
        self.shuffle = shuffle
        n = len(store)
        starts = np.arange(n - seq_len)
        if episode_len:
            keep = (starts % episode_len) <= episode_len - seq_len
            starts = starts[keep]
        if store.starts is not None and seq_len > 1:
            # sequence i covers frames [i, i+seq_len) — drop it if any frame
            # in (i, i+seq_len) begins a new episode
            ok = valid_window_starts(n, store.starts, seq_len - 1,
                                     n_starts=n - seq_len)
            starts = starts[np.isin(starts, ok)]
        if len(starts) == 0:
            raise ValueError(f"no length-{seq_len} sequences in store of {n}")
        self.starts = starts
        acts = (store.controls.astype(np.float32) if continuous_actions
                else store.actions.astype(np.int32))
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(sharding.mesh, PartitionSpec())
            self.frames = jax.device_put(store.frames, rep)
            self.actions = jax.device_put(acts, rep)
        else:
            self.frames = jnp.asarray(store.frames)
            self.actions = jnp.asarray(acts)

    def __len__(self) -> int:
        return max(1, len(self.starts) // self.batch_size)

    def make_batch(self, idx: np.ndarray):
        idx = jnp.asarray(idx, jnp.int32)
        if self._sharding is not None:
            idx = jax.device_put(idx, self._sharding)
        gather = idx[:, None] + jnp.arange(self.seq_len)[None, :]  # (B, T)
        frames = self.frames[gather].astype(jnp.float32) / 255.0
        return frames[..., None], self.actions[gather]

    def __iter__(self):
        order = self.starts.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        for b in range(len(self)):
            yield self.make_batch(order[b * self.batch_size:(b + 1) * self.batch_size])


# ---------------------------------------------------------------------------
# Iterator factories, mirroring the reference's public API
# (imitation_dataset.py:197-314). Each returns the same dict shape:
# {'train_dataloader', 'val_dataloader', 'test_dataloader'}.
# ---------------------------------------------------------------------------

def _loaders_from_stores(cfg, stores: dict[str, FrameStore], aux: bool, frame_skip: int,
                         sharding=None, label_offset: int | None = None) -> dict:
    batch = int(cfg["BATCH_SIZE"])
    shuffle = bool(cfg.get("shuffle_train", False))
    seed = int(cfg.get("seed", 0))
    out = {}
    for split, name in (("train", "train_dataloader"), ("val", "val_dataloader"), ("test", "test_dataloader")):
        out[name] = DeviceDataset(
            stores[split], batch, frame_skip=frame_skip,
            shuffle=(shuffle and split == "train"), seed=seed, aux=aux,
            # train drops the remainder for a single static shape; eval splits
            # keep the partial final batch (torch DataLoader default) so small
            # val/test splits still produce metrics. Only train batches are
            # sharded (partial eval batches may not divide the mesh).
            drop_last=(split == "train"),
            dtype=str(cfg.get("compute_dtype_input", "float32")),
            sharding=(sharding if split == "train" else None),
            label_offset=label_offset,
            # inverse-frequency action balancing, train split only — eval
            # metrics must reflect the true label distribution
            balanced=(bool(cfg.get("balanced_sampling", False))
                      and split == "train"),
        )
    return out


def _sequential_stores(cfg) -> dict[str, FrameStore]:
    return {s: FrameStore.from_processed_dir(cfg, s) for s in ("train", "val", "test")}


def sequential_train_val_test_iterator(cfg, stores: dict[str, FrameStore] | None = None,
                                       sharding=None) -> dict:
    """BC loaders over 4-frame windows (reference imitation_dataset.py:263-288)."""
    stores = stores or _sequential_stores(cfg)
    return _loaders_from_stores(cfg, stores, aux=False, frame_skip=int(cfg["frame_skip"]), sharding=sharding)


def sequential_aux_train_val_test_iterator(cfg, stores: dict[str, FrameStore] | None = None,
                                           sharding=None) -> dict:
    """Aux multi-task loaders: ((frames, sensor), (traffic, action))
    (reference imitation_dataset.py:291-314)."""
    stores = stores or _sequential_stores(cfg)
    return _loaders_from_stores(cfg, stores, aux=True, frame_skip=int(cfg["frame_skip"]), sharding=sharding)


def _pooled_split(cfg, store: FrameStore) -> dict[str, FrameStore]:
    """Sequential (1-2t, t, t) split over pooled frames — reference
    get_pooled_data uses np.split on an arange (imitation_dataset.py:363-368)."""
    t = float(cfg["TEST_SIZE"])
    n = len(store)
    i1, i2 = int((1 - 2 * t) * n), int((1 - t) * n)
    return {"train": store.slice(0, i1), "val": store.slice(i1, i2), "test": store.slice(i2, n)}


def train_val_test_iterator(cfg, data_split_type: str = "pooled_data", sharding=None) -> dict:
    """Pooled per-frame loaders (reference imitation_dataset.py:197-238).

    Single-frame samples (frame_skip handled as a 1-frame window): the pooled
    path in the reference trains on individual grayscale frames.
    """
    camera = cfg["camera"][0] if isinstance(cfg["camera"], list) else cfg["camera"]
    stores_per_log = [FrameStore.from_raw_camera(cfg, log, camera) for log in cfg["train_logs"]]
    pooled = FrameStore(
        frames=np.concatenate([s.frames for s in stores_per_log]),
        actions=np.concatenate([s.actions for s in stores_per_log]),
        traffic=np.concatenate([s.traffic for s in stores_per_log]),
        sensors=np.concatenate([s.sensors for s in stores_per_log]),
    )
    stores = _pooled_split(cfg, pooled)
    return _loaders_from_stores(cfg, stores, aux=False, frame_skip=1, sharding=sharding,
                                label_offset=0)


def large_train_val_test_iterator(cfg, sharding=None) -> dict:
    """Per-file lazy path of the reference (imitation_dataset.py:241-260).

    On TPU the packed store already makes 'large' logs cheap; this factory
    exists for API parity and loads the processed per-camera layout
    ``processed/<log>/<split>/<camera>/`` (reference LargeTorchDataset :49-87).
    """
    log = cfg["train_logs"][0]
    camera = cfg["camera"][0] if isinstance(cfg["camera"], list) else cfg["camera"]
    data_dir = Path(cfg["data_dir"])
    state_path = data_dir / "raw" / log / "state.csv"
    if not state_path.exists():
        state_path = data_dir / "raw" / "state.csv"
    state = fl.load_state_csv(state_path)
    stores = {}
    for split in ("train", "val", "test"):
        flog = fl.FrameLog(data_dir / "processed" / log / split / camera)
        stores[split] = FrameStore.from_arrays(flog.read_all_gray_u8(), state, flog.file_idx)
    return _loaders_from_stores(cfg, stores, aux=False, frame_skip=1, sharding=sharding,
                                label_offset=0)


def device_prefetch(iterator, size: int = 2, transform=None):
    """Overlap host→device transfer with device compute.

    Wraps any host-batch iterator (e.g. the native ShardedPrefetchReader):
    keeps ``size`` batches in flight by issuing ``jax.device_put`` for
    upcoming batches BEFORE the consumer asks for them — JAX transfers are
    async, so the H2D DMA of batch i+1 rides under the training step of
    batch i instead of serializing after it. This is the device end of the
    streaming tier (host end: native/framestore.cpp's threaded gather).

    ``transform(batch) -> pytree`` runs host-side before the put (e.g. the
    NCHW→NHWC transpose for native window batches).
    """
    import collections

    queue = collections.deque()
    it = iter(iterator)

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in it:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
