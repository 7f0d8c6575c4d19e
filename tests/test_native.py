"""Native C++ framestore: build, roundtrip, threaded prefetch correctness."""

import numpy as np
import pytest

from carla_imitation_learning_tpu.data.pipeline import FrameStore
from carla_imitation_learning_tpu.native import (
    NativeFrameStore, PrefetchReader, build_library, save_framestore,
)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    assert build_library() is not None, "g++ build failed"
    store = FrameStore.synthetic(n=50, height=32, width=32, seed=0)
    path = tmp_path_factory.mktemp("fs") / "log1.tpuilfs"
    save_framestore(path, store)
    return path, store


def test_roundtrip_zero_copy(packed):
    path, store = packed
    nfs = NativeFrameStore(path)
    assert (nfs.n, nfs.h, nfs.w) == (50, 32, 32)
    np.testing.assert_array_equal(nfs.frames, store.frames)
    np.testing.assert_array_equal(nfs.actions, store.actions)
    np.testing.assert_allclose(nfs.sensors, store.sensors, rtol=1e-6)
    rt = nfs.to_frame_store()
    np.testing.assert_array_equal(rt.traffic, store.traffic)
    nfs.close()


def test_open_garbage_file(tmp_path):
    bad = tmp_path / "bad.fs"
    bad.write_bytes(b"not a framestore at all")
    with pytest.raises(IOError):
        NativeFrameStore(bad)


def test_prefetch_matches_window_contract(packed):
    path, store = packed
    nfs = NativeFrameStore(path)
    reader = PrefetchReader(nfs, batch=8, frame_skip=4, n_threads=3, shuffle=False)
    batches = list(reader)
    assert len(batches) == (50 - 4) // 8
    frames, labels = batches[0]
    assert frames.shape == (8, 4, 32, 32)
    assert frames.dtype == np.uint8
    # sequential order: sample k = frames[k:k+4], label = action[k+4]
    for k in range(8):
        np.testing.assert_array_equal(frames[k], store.frames[k:k + 4])
        assert labels[k] == store.actions[k + 4]
    nfs.close()


def test_prefetch_shuffled_covers_epoch(packed):
    path, store = packed
    nfs = NativeFrameStore(path)
    reader = PrefetchReader(nfs, batch=4, frame_skip=4, n_threads=2,
                            shuffle=True, seed=7)
    seen = []
    for frames, labels in reader:
        seen.extend(labels.tolist())
    assert len(seen) == ((50 - 4) // 4) * 4
    # against the device pipeline: same windows exist
    from carla_imitation_learning_tpu.data.pipeline import DeviceDataset

    ds = DeviceDataset(store, batch_size=4, frame_skip=4)
    all_labels = [int(store.actions[k + 4]) for k in range(ds.n_samples)]
    assert set(seen) <= set(all_labels)
    nfs.close()


def test_reader_reusable(packed):
    path, _ = packed
    nfs = NativeFrameStore(path)
    reader = PrefetchReader(nfs, batch=8, frame_skip=4, n_threads=2)
    n1 = sum(1 for _ in reader)
    n2 = sum(1 for _ in reader)  # fresh epoch each __iter__
    assert n1 == n2 == len(reader)
    nfs.close()


def test_thread_sanitizer_clean(tmp_path):
    """Race detection: the threaded prefetcher runs clean under TSan
    (the only mutable shared state in the framework — JAX code is pure)."""
    import subprocess
    from carla_imitation_learning_tpu.native.framestore import _SRC

    exe = tmp_path / "fs_tsan_test"
    build = subprocess.run(
        ["g++", "-fsanitize=thread", "-g", "-O1", "-std=c++17", "-pthread",
         "-DFS_TEST_MAIN", str(_SRC), "-o", str(exe)],
        capture_output=True, text=True)
    assert build.returncode == 0, build.stderr
    run = subprocess.run([str(exe)], capture_output=True, text=True, timeout=120)
    assert run.returncode == 0, (run.stdout, run.stderr)
    assert "ThreadSanitizer" not in run.stderr, run.stderr
