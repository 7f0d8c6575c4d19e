"""ctypes bindings + lazy g++ build for native/framestore.cpp."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "framestore.cpp"
_LIB_DIR = Path(os.environ.get("TPUIL_NATIVE_DIR",
                               Path.home() / ".cache" / "tpuil_native"))
_LIB = _LIB_DIR / "libframestore.so"
_lock = threading.Lock()
_lib_handle = None


def build_library(force: bool = False, tsan: bool = False) -> Path | None:
    """Compile the shared library once (g++ -O3); cached across runs.

    ``tsan=True`` builds a ThreadSanitizer instrumented variant (race
    detection for the multi-threaded prefetcher — the only mutable shared
    state in the framework; the JAX side is pure/functional)."""
    lib = _LIB_DIR / ("libframestore_tsan.so" if tsan else "libframestore.so")
    if lib.exists() and not force and lib.stat().st_mtime >= _SRC.stat().st_mtime:
        return lib
    if not _SRC.exists():
        return None
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", str(_SRC), "-o", str(lib)]
    if tsan:
        cmd[1:1] = ["-fsanitize=thread", "-g"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return lib
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load():
    global _lib_handle
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        path = build_library()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.fs_write.restype = ctypes.c_int
        lib.fs_open.restype = ctypes.c_void_p
        lib.fs_open.argtypes = [ctypes.c_char_p]
        lib.fs_info.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 3
        for name in ("fs_frames", "fs_actions", "fs_traffic", "fs_sensors",
                     "fs_commands", "fs_starts"):
            getattr(lib, name).restype = ctypes.c_void_p
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.fs_close.argtypes = [ctypes.c_void_p]
        lib.fs_reader_create.restype = ctypes.c_void_p
        lib.fs_reader_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
        lib.fs_reader_n_batches.restype = ctypes.c_int64
        lib.fs_reader_n_batches.argtypes = [ctypes.c_void_p]
        lib.fs_reader_next.restype = ctypes.c_int
        lib.fs_reader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
        lib.fs_reader_destroy.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
        return lib


NATIVE_AVAILABLE = _SRC.exists()


def save_framestore(path: str | os.PathLike, store) -> Path:
    """Write a data.pipeline.FrameStore to the packed native format (v2:
    includes the episode-start bitmap, so the C++ reader never samples a
    window across an env-stream/reset boundary)."""
    lib = _load()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames = np.ascontiguousarray(store.frames, dtype=np.uint8)
    n, h, w = frames.shape
    actions = np.ascontiguousarray(store.actions, dtype=np.int32)
    traffic = np.ascontiguousarray(store.traffic, dtype=np.int32)
    sensors = np.ascontiguousarray(store.sensors, dtype=np.float32)
    commands = np.ascontiguousarray(
        store.commands if store.commands is not None else np.zeros(n, np.int32),
        dtype=np.int32)
    starts_src = getattr(store, "starts", None)
    starts = np.ascontiguousarray(
        starts_src if starts_src is not None else np.zeros(n, bool),
        dtype=np.uint8)
    if lib is None:  # numpy fallback, same v2 layout
        with open(path, "wb") as f:
            header = np.array([0x3253464C49555054, n, h, w], dtype=np.int64)
            f.write(header.tobytes())
            f.write(frames.tobytes())
            f.write(actions.tobytes())
            f.write(traffic.tobytes())
            f.write(sensors.tobytes())
            f.write(commands.tobytes())
            f.write(starts.tobytes())
        return path
    rc = lib.fs_write(
        str(path).encode(), frames.ctypes.data_as(ctypes.c_void_p),
        actions.ctypes.data_as(ctypes.c_void_p),
        traffic.ctypes.data_as(ctypes.c_void_p),
        sensors.ctypes.data_as(ctypes.c_void_p),
        commands.ctypes.data_as(ctypes.c_void_p),
        starts.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n), ctypes.c_int64(h), ctypes.c_int64(w))
    if rc != 0:
        raise IOError(f"fs_write failed with code {rc}")
    return path


# keep fs_write argtypes permissive (void_p data + int64 dims set at call time)


class NativeFrameStore:
    """mmap-backed zero-copy view of a packed framestore file."""

    def __init__(self, path: str | os.PathLike):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native framestore library unavailable (g++ missing?)")
        self._handle = self._lib.fs_open(str(path).encode())
        if not self._handle:
            raise IOError(f"cannot open framestore {path}")
        n = ctypes.c_int64()
        h = ctypes.c_int64()
        w = ctypes.c_int64()
        self._lib.fs_info(self._handle, ctypes.byref(n), ctypes.byref(h),
                          ctypes.byref(w))
        self.n, self.h, self.w = n.value, h.value, w.value

    def _view(self, fn, dtype, shape):
        ptr = fn(self._handle)
        size = int(np.prod(shape))
        buf = (ctypes.c_char * (size * np.dtype(dtype).itemsize)).from_address(ptr)
        return np.frombuffer(buf, dtype=dtype).reshape(shape)

    @property
    def frames(self) -> np.ndarray:
        return self._view(self._lib.fs_frames, np.uint8, (self.n, self.h, self.w))

    @property
    def actions(self) -> np.ndarray:
        return self._view(self._lib.fs_actions, np.int32, (self.n,))

    @property
    def traffic(self) -> np.ndarray:
        return self._view(self._lib.fs_traffic, np.int32, (self.n,))

    @property
    def sensors(self) -> np.ndarray:
        return self._view(self._lib.fs_sensors, np.float32, (self.n, 3))

    @property
    def commands(self) -> np.ndarray:
        return self._view(self._lib.fs_commands, np.int32, (self.n,))

    @property
    def starts(self) -> np.ndarray | None:
        """Episode-start bitmap (bool) — None for legacy TPUILFS1 files."""
        ptr = self._lib.fs_starts(self._handle)
        if not ptr:
            return None
        return self._view(self._lib.fs_starts, np.uint8, (self.n,)).astype(bool)

    def n_valid_windows(self, frame_skip: int) -> int:
        """Window starts the reader will actually sample (boundary-masked)."""
        n_starts = self.n - frame_skip
        if n_starts <= 0:
            return 0
        starts = self.starts
        if starts is None:
            return n_starts
        crosses = np.zeros(n_starts, bool)
        for d in range(1, frame_skip + 1):
            crosses |= starts[d:d + n_starts]
        return int((~crosses).sum())

    def to_frame_store(self):
        from carla_imitation_learning_tpu.data.pipeline import FrameStore

        return FrameStore(frames=self.frames, actions=self.actions,
                          traffic=self.traffic, sensors=self.sensors,
                          commands=self.commands, starts=self.starts)

    def close(self) -> None:
        if self._handle:
            self._lib.fs_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class PrefetchReader:
    """Threaded window-batch iterator over a NativeFrameStore.

    Yields (frames uint8 (B, frame_skip, H, W), labels i32 (B,)) with the
    sequential-window label contract; C++ workers memcpy-gather ahead of the
    training loop. Normalize on device (x.astype(f32)/255) — shipping uint8
    keeps host work and H2D traffic 4× smaller.
    """

    def __init__(self, store: NativeFrameStore, batch: int, frame_skip: int = 4,
                 n_threads: int = 4, shuffle: bool = False, seed: int = 0,
                 max_queue: int = 4):
        self._store = store
        self._lib = store._lib
        self.batch = batch
        self.frame_skip = frame_skip
        self._args = (batch, frame_skip, n_threads, int(shuffle), seed, max_queue)

    def __iter__(self):
        lib = self._lib
        reader = lib.fs_reader_create(self._store._handle, *map(int, (
            self._args[0], self._args[1], self._args[2], self._args[3])),
            ctypes.c_uint64(self._args[4]), int(self._args[5]))
        if not reader:
            raise RuntimeError("fs_reader_create failed (store too small?)")
        n_batches = lib.fs_reader_n_batches(reader)
        frames = np.empty((self.batch, self.frame_skip, self._store.h, self._store.w),
                          np.uint8)
        labels = np.empty((self.batch,), np.int32)
        try:
            for _ in range(n_batches):
                rc = lib.fs_reader_next(
                    reader, frames.ctypes.data_as(ctypes.c_void_p),
                    labels.ctypes.data_as(ctypes.c_void_p))
                if rc != 0:
                    break
                yield frames.copy(), labels.copy()
        finally:
            lib.fs_reader_destroy(reader)

    def __len__(self):
        return max(1, self._store.n_valid_windows(self.frame_skip) // self.batch)
