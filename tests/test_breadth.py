"""Tests for augmentation, VAE data paths, ETL, stats, callbacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.data import frame_log as fl
from carla_imitation_learning_tpu.data import stats as stats_lib
from carla_imitation_learning_tpu.data import vae_data
from carla_imitation_learning_tpu.data.etl import (
    compress_data, load_compressed, resize_camera_folder,
)
from carla_imitation_learning_tpu.ops.augment import (
    augment_batch, random_hflip_with_labels,
)


def test_hflip_relabels_steer(rng):
    x = jnp.zeros((8, 16, 16, 4)).at[:, :, 0, :].set(1.0)  # marker on left edge
    actions = jnp.array([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)
    x_f, a_f = random_hflip_with_labels(rng, x, actions)
    flipped = np.asarray(x_f[:, 0, -1, 0] == 1.0)  # marker moved to right edge
    a, af = np.asarray(actions), np.asarray(a_f)
    # acc class invariant, steer class mirrored only where flipped
    np.testing.assert_array_equal(af // 3, a // 3)
    np.testing.assert_array_equal(af[flipped] % 3, 2 - (a[flipped] % 3))
    np.testing.assert_array_equal(af[~flipped], a[~flipped])


def test_augment_batch_shapes_and_range(rng):
    x = jax.random.uniform(rng, (4, 32, 32, 4))
    a = jnp.array([0, 4, 8, 5], jnp.int32)
    x2, a2 = augment_batch(rng, x, a)
    assert x2.shape == x.shape
    assert float(x2.min()) >= 0.0 and float(x2.max()) <= 1.0
    assert a2.shape == a.shape


@pytest.fixture(scope="module")
def vae_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("vae_data")
    for i, log in enumerate(["Log1", "Log2"]):
        fl.write_synthetic_log(root, log=log, cameras=("SL",), n_frames=20,
                               height=32, width=32, seed=i)
    return root


def test_vae_pooled_iterator(vae_dirs):
    from carla_imitation_learning_tpu import compose

    cfg = compose("config", overrides=[
        f"data_dir={vae_dirs}/", "BATCH_SIZE=8", "camera=SL",
        "train_logs=['Log1','Log2']", "image_size=[1,32,32]",
    ])
    loaders = vae_data.train_val_test_iterator(cfg, "pooled_data")
    x = next(iter(loaders["train_dataloader"]))
    assert x.shape == (8, 32, 32, 1)
    assert float(x.max()) <= 1.0
    n = sum(len(loaders[k].frames) for k in
            ("train_dataloader", "val_dataloader", "test_dataloader"))
    assert n == 40  # all frames used exactly once


def test_vae_leave_one_out_iterator(vae_dirs):
    from carla_imitation_learning_tpu import compose

    cfg = compose("config", overrides=[
        f"data_dir={vae_dirs}/", "BATCH_SIZE=4", "camera=SL",
        "train_logs=['Log1']", "test_logs=['Log2']", "image_size=[1,32,32]",
    ])
    loaders = vae_data.train_val_test_iterator(cfg, "leave_one_out_data")
    assert len(loaders["test_dataloader"].frames) == 20  # the held-out log


def test_compress_and_resize(vae_dirs):
    from carla_imitation_learning_tpu import compose

    cfg = compose("config", overrides=[
        f"data_dir={vae_dirs}/", "train_logs=['Log1']", "camera=SL"])
    out = compress_data(cfg)
    images = load_compressed(out)
    assert images.shape == (20, 32, 32) and images.dtype == np.uint8
    resized = resize_camera_folder(cfg, "Log1", "SL", size=16)
    assert resized.name == "SL_resized_16_bw"
    img = fl.FrameLog(resized).read(0)
    assert img.shape == (16, 16)


def test_stats_golden():
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0])
    cm = stats_lib.confusion_matrix(labels, preds, 3)
    np.testing.assert_array_equal(cm, [[1, 1, 0], [0, 2, 0], [1, 0, 1]])
    p, r, f1 = stats_lib.per_class_prf(labels, preds, 3)
    np.testing.assert_allclose(r, [0.5, 1.0, 0.5])
    np.testing.assert_allclose(p, [0.5, 2 / 3, 1.0])
    hist = stats_lib.action_histogram(labels, 3)
    np.testing.assert_array_equal(hist, [2, 2, 2])


def test_calculate_accuracy_and_save_predictions(tmp_path, rng):
    from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.training import create_train_state, make_optimizer

    store = FrameStore.synthetic(n=20, height=64, width=64)
    loaders = {"val_dataloader": DeviceDataset(store, 8, drop_last=False)}
    model = PolicyCNN(dtype=jnp.float32)
    state = create_train_state(model, rng, model.example_input(1, 64, 64),
                               make_optimizer({"LEARNING_RATE": 1e-3}, 1))
    acc = stats_lib.calculate_accuracy(state.apply_fn, state.params, loaders)
    assert 0.0 <= acc <= 1.0
    out = stats_lib.save_predictions(state.apply_fn, state.params,
                                     loaders["val_dataloader"],
                                     str(tmp_path / "predWlabels.npy"))
    data = np.load(out, allow_pickle=True).item()
    assert set(data) == {"predicted", "labels"}
    assert len(data["predicted"]) == 16


def test_callbacks(tmp_path, rng):
    from carla_imitation_learning_tpu.callbacks import (
        SaveBestMetricScores, SaveCodeSnapshot, SaveConfusionMatrix,
        UnfreezeModelCallback,
    )

    cb = UnfreezeModelCallback(wait_epochs=2)
    assert cb.frozen
    cb.on_epoch_end(None, None, 0, {}, None)
    assert cb.frozen
    cb.on_epoch_end(None, None, 1, {}, None)
    assert not cb.frozen

    snap = SaveCodeSnapshot(tmp_path)
    snap.on_fit_start(None, None)
    assert (tmp_path / "code_snapshot.zip").stat().st_size > 10_000

    best = SaveBestMetricScores()

    class FakeTrainer:
        logger = None

    best.on_epoch_end(FakeTrainer(), None, 0, {"val_loss": 2.0, "val_accuracy": 0.3}, None)
    best.on_epoch_end(FakeTrainer(), None, 1, {"val_loss": 1.0, "val_accuracy": 0.2}, None)
    assert best.best["best_val_loss"] == 1.0
    assert best.best["best_val_accuracy"] == 0.3


def test_bc_with_augmentation_experiment(tmp_path):
    """BASELINE config #3: BC with fused on-device augmentation trains."""
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import behavior_cloning

    cfg = compose("config", overrides=[
        "model=imitation", "NUM_EPOCHS=1", "BATCH_SIZE=8", "synthetic_frames=60",
        "image_height=64", "image_width=64", "compute_dtype=float32",
        "trainer.num_sanity_val_steps=0", "augment=true",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ])
    r = behavior_cloning(cfg, cameras=("camera",))
    h = r["camera"]["history"][-1]
    assert np.isfinite(h["train_loss"]) and np.isfinite(h["val_loss"])
