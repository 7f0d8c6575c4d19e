"""Input-pipeline semantics: window stacking, label alignment, splits, file IO."""

import numpy as np
import pytest

from carla_imitation_learning_tpu.data import frame_log as fl
from carla_imitation_learning_tpu.data.pipeline import (
    DeviceDataset, FrameStore, sequential_train_val_test_iterator,
    sequential_aux_train_val_test_iterator,
)


def test_window_and_label_alignment(synthetic_store):
    """Sample k = frames[k:k+4] stacked NHWC, label = action[k+4]
    (reference imitation_dataset.py:115-131)."""
    fs = 4
    ds = DeviceDataset(synthetic_store, batch_size=3, frame_skip=fs, shuffle=False)
    x, y = next(iter(ds))
    assert x.shape == (3, 64, 64, fs)
    for b in range(3):
        for c in range(fs):
            expected = synthetic_store.frames[b + c].astype(np.float32) / 255.0
            np.testing.assert_allclose(np.asarray(x[b, :, :, c]), expected, atol=1e-6)
        assert int(y[b]) == int(synthetic_store.actions[b + fs])


def test_dataset_len(synthetic_store):
    ds = DeviceDataset(synthetic_store, batch_size=4, frame_skip=4)
    # len = N - frame_skip (reference imitation_dataset.py:135-136)
    assert ds.n_samples == len(synthetic_store) - 4
    assert len(ds) == ds.n_samples // 4


def test_aux_batch_contract(synthetic_store):
    ds = DeviceDataset(synthetic_store, batch_size=2, frame_skip=4, aux=True)
    (x, sensor), y = next(iter(ds))
    assert x.shape == (2, 64, 64, 4)
    assert sensor.shape == (2, 3)
    assert y.shape == (2, 2)  # (trafficlight, action) stacked
    assert int(y[0, 0]) == int(synthetic_store.traffic[4])
    assert int(y[0, 1]) == int(synthetic_store.actions[4])
    np.testing.assert_allclose(np.asarray(sensor[0]), synthetic_store.sensors[4], rtol=1e-6)


def test_shuffle_is_deterministic_per_seed(synthetic_store):
    d1 = DeviceDataset(synthetic_store, batch_size=4, shuffle=True, seed=7)
    d2 = DeviceDataset(synthetic_store, batch_size=4, shuffle=True, seed=7)
    np.testing.assert_array_equal(d1.epoch_indices(), d2.epoch_indices())


@pytest.fixture(scope="module")
def synthetic_data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    fl.write_synthetic_log(root, log="Log1", cameras=("camera",), n_frames=30,
                           height=48, width=48, seed=3)
    fl.split_frames(root / "raw" / "Log1", root / "processed" / "Log1",
                    ratio=(0.8, 0.1, 0.1), shuffle=False)
    # split_frames splits the camera subfolder; the sequential contract expects
    # processed/<log>/<split>/<log>/ so re-split the log folder itself:
    return root


def test_split_frames_sequential(synthetic_data_dir):
    root = synthetic_data_dir
    train = sorted((root / "processed" / "Log1" / "train" / "camera").iterdir(),
                   key=lambda p: int(p.stem))
    val = sorted((root / "processed" / "Log1" / "val" / "camera").iterdir(),
                 key=lambda p: int(p.stem))
    test = sorted((root / "processed" / "Log1" / "test" / "camera").iterdir(),
                  key=lambda p: int(p.stem))
    assert len(train) == 24 and len(val) == 3 and len(test) == 3
    # sequential: train gets the first frames, val the next, test the last
    assert int(train[-1].stem) < int(val[0].stem) < int(test[0].stem)


def test_state_csv_roundtrip(tmp_path):
    state = fl.make_synthetic_state(20, seed=1)
    fl.save_state_csv(tmp_path / "state.csv", state)
    loaded = fl.load_state_csv(tmp_path / "state.csv")
    np.testing.assert_allclose(loaded.steer, state.steer, atol=1e-5)
    np.testing.assert_allclose(loaded.speed, state.speed, atol=1e-4)


def test_sequential_iterator_from_files(tmp_path):
    """End-to-end: synthetic raw log → folder split → iterator factory."""
    from carla_imitation_learning_tpu import compose

    fl.write_synthetic_log(tmp_path, log="Log1", cameras=("camera",), n_frames=30,
                           height=48, width=48, seed=5)
    # sequential contract: processed/<log>/<split>/<frames>/ (imitation_dataset.py:96-97)
    fl.split_frames(tmp_path / "raw" / "Log1", tmp_path / "processed" / "Log1",
                    ratio=(0.6, 0.2, 0.2), shuffle=False)
    cfg = compose("config", overrides=[
        "model=imitation", "BATCH_SIZE=2", f"data_dir={tmp_path}/",
        "train_logs=['Log1']",
    ])
    loaders = sequential_train_val_test_iterator(cfg)
    x, y = next(iter(loaders["train_dataloader"]))
    assert x.shape == (2, 48, 48, 4)
    assert y.dtype.name == "int32"
    aux = sequential_aux_train_val_test_iterator(cfg)
    (x2, s2), y2 = next(iter(aux["train_dataloader"]))
    assert s2.shape == (2, 3) and y2.shape == (2, 2)


def test_luminance_matches_reference_formula():
    rgb = np.random.default_rng(0).integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    gray = rgb.astype(np.float64) @ fl.LUMA / 255.0  # imitation_dataset.py:121
    packed = np.round(rgb.astype(np.float64) @ fl.LUMA).astype(np.uint8) / 255.0
    assert np.abs(gray - packed).max() <= 0.5 / 255 + 1e-9


def test_balanced_sampling_flattens_label_histogram():
    """balanced=True draws each epoch inverse-frequency over the LABELED
    action, so a 90/10-imbalanced store yields a ~uniform training stream."""
    n = 400
    store = FrameStore.synthetic(n=n, height=8, width=8, seed=0)
    # heavy imbalance: 90% action 4 ("cruise"), 10% action 0
    actions = np.full(n, 4, np.int32)
    actions[::10] = 0
    store = FrameStore(store.frames, actions, store.traffic, store.sensors)
    ds = DeviceDataset(store, batch_size=16, frame_skip=4, seed=7, balanced=True)
    labels = actions[ds.epoch_indices() + 4]
    frac0 = float((labels == 0).mean())
    assert 0.35 < frac0 < 0.65  # ~0.5 expected; unbalanced would be ~0.1
    # deterministic per seed, fresh draw per epoch
    ds2 = DeviceDataset(store, batch_size=16, frame_skip=4, seed=7, balanced=True)
    np.testing.assert_array_equal(ds2.epoch_indices(), DeviceDataset(
        store, batch_size=16, frame_skip=4, seed=7, balanced=True).epoch_indices())
    assert not np.array_equal(ds.epoch_indices(), ds.epoch_indices())


def test_balanced_respects_episode_boundaries():
    """Balanced draws must still come only from episode-valid window starts."""
    n = 60
    store = FrameStore.synthetic(n=n, height=8, width=8, seed=1)
    starts = np.zeros(n, bool)
    starts[0] = starts[30] = True
    store = FrameStore(store.frames, store.actions, store.traffic,
                       store.sensors, starts=starts)
    ds = DeviceDataset(store, batch_size=8, frame_skip=4, seed=3, balanced=True)
    # sample indices must all be < n_samples (they map through _valid_starts)
    idx = ds.epoch_indices()
    assert idx.min() >= 0 and idx.max() < ds.n_samples
    x, y = ds.make_batch(idx[:8])
    assert x.shape == (8, 8, 8, 4)
