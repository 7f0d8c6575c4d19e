"""Paired-stream and sequence alignment integrity (round-3 verdict item 1).

- bc_raw_segment's semantic stream must pair raw and semantic windows by raw
  frame id across EVERY split — the sequential 80/10/10 split stores val/test
  frames from the 80-90%/90-100% positions of the log, so position-based
  pairing is wrong there (reference windows are single-stream by construction,
  imitation_dataset.py:115-131).
- SequenceDataset must never emit a sequence that spans an auto-reset marked
  in store.starts (the leakage class DeviceDataset already prevents).
"""

import numpy as np
import pytest
from PIL import Image

from carla_imitation_learning_tpu.data import frame_log as fl
from carla_imitation_learning_tpu.data.pipeline import (
    DeviceDataset, FrameStore, PairedStreamDataset, SequenceDataset,
    paired_sequential_iterator, rebase_stream,
)

N_FRAMES = 60
H = W = 16


def _cam_val(i):  # raw camera pixel value encodes the raw frame id
    return i % 251


def _sem_val(i):  # semantic pixel value is a distinct function of the id
    return (i * 7 + 3) % 251


@pytest.fixture()
def paired_log(tmp_path):
    data_dir = tmp_path / "data"
    raw = data_dir / "raw" / "Log1"
    for cam, val in (("camera", _cam_val), ("semantic", _sem_val)):
        d = raw / cam
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            Image.fromarray(np.full((H, W), val(i), np.uint8)).save(
                d / f"{i + 1}.png")
    state = fl.make_synthetic_state(N_FRAMES, seed=0)
    fl.save_state_csv(data_dir / "raw" / "state.csv", state)
    fl.save_state_csv(raw / "state.csv", state)
    fl.split_frames(raw, data_dir / "processed" / "Log1",
                    ratio=(0.8, 0.1, 0.1), shuffle=False)
    return data_dir


def _decode(x, channel):
    """Pixel [0,0] of window channel → encoded value."""
    return np.asarray(np.round(np.asarray(x)[:, 0, 0, channel] * 255)).astype(int)


def test_raw_segment_pairs_by_frame_id_every_split(paired_log):
    cfg = {"data_dir": str(paired_log), "train_logs": ["Log1"],
           "BATCH_SIZE": 2, "frame_skip": 4, "camera": "camera"}
    loaders = paired_sequential_iterator(cfg)
    # the split must actually re-base val/test (first val frame id != 0),
    # otherwise this test couldn't catch position-based pairing
    val_store = loaders["val_dataloader"].base.store
    assert val_store.file_idx is not None and val_store.file_idx[0] > 0
    for name in ("train_dataloader", "val_dataloader", "test_dataloader"):
        for x, xs, y in loaders[name]:
            for ch in range(4):
                ids = _decode(x, ch)          # raw ids straight off the pixels
                np.testing.assert_array_equal(
                    _decode(xs, ch), np.array([_sem_val(i) for i in ids]),
                    err_msg=f"{name} channel {ch} pairs the wrong frames")
            # windows are consecutive raw frames
            np.testing.assert_array_equal(_decode(x, 1), _decode(x, 0) + 1)


def test_rebase_stream_exact_and_missing():
    frames = np.arange(10, dtype=np.uint8)[:, None, None].repeat(2, 1).repeat(2, 2)
    fidx = np.arange(10)
    np.testing.assert_array_equal(
        rebase_stream(frames, fidx, np.array([7, 8, 9]))[:, 0, 0], [7, 8, 9])
    with pytest.raises(ValueError):
        rebase_stream(frames[:5], fidx[:5], np.array([7]))


def test_paired_stream_maps_through_valid_starts():
    n, fs = 40, 4
    frames = (np.arange(n, dtype=np.uint8)[:, None, None]
              .repeat(8, 1).repeat(8, 2))
    state = fl.make_synthetic_state(n, seed=0)
    store = FrameStore.from_arrays(frames, state)
    starts = np.zeros(n, bool)
    starts[[0, 13, 26]] = True
    store.starts = starts
    base = DeviceDataset(store, batch_size=4, frame_skip=fs)
    assert base._valid_starts is not None  # boundaries prune some windows
    ds = PairedStreamDataset(base, frames)
    for x, xs, y in ds:
        # both streams gathered with the SAME mapped starts → identical
        np.testing.assert_array_equal(np.asarray(x), np.asarray(xs))
        ids = _decode(x, 0)
        for i in ids:  # and no window crosses a boundary
            assert not starts[i + 1: i + fs + 1].any()


def test_sequence_dataset_respects_store_starts():
    n, T = 48, 6
    store = FrameStore.synthetic(n=n, height=8, width=8)
    starts = np.zeros(n, bool)
    starts[[0, 11, 29]] = True
    store.starts = starts
    ds = SequenceDataset(store, batch_size=4, seq_len=T, shuffle=False)
    for s in ds.starts:
        assert not starts[s + 1: s + T].any(), f"sequence at {s} spans a reset"
    # exact: every non-crossing start is kept
    expected = [s for s in range(n - T) if not starts[s + 1: s + T].any()]
    np.testing.assert_array_equal(np.sort(ds.starts), expected)


def test_sequence_dataset_combines_episode_len_and_starts():
    n, T, ep = 40, 5, 10
    store = FrameStore.synthetic(n=n, height=8, width=8)
    starts = np.zeros(n, bool)
    starts[17] = True  # mid-episode auto-reset inside episode [10, 20)
    store.starts = starts
    ds = SequenceDataset(store, batch_size=4, seq_len=T, episode_len=ep,
                         shuffle=False)
    for s in ds.starts:
        assert (s % ep) <= ep - T
        assert not starts[s + 1: s + T].any()
    assert 13 not in ds.starts and 15 not in ds.starts  # would span frame 17
    assert 10 in ds.starts  # [10,15) is clean
