"""Auxiliary subsystems: NaN failure detection/rollback, vmapped HPO, tracing."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu import compose
from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore
from carla_imitation_learning_tpu.models import PolicyCNN
from carla_imitation_learning_tpu.training import (
    Trainer, bc_loss_fn, create_train_state, make_optimizer,
)

F32 = jnp.float32


def test_nan_rollback(rng, tiny_cfg):
    """A poisoned loss must trigger restore of the last good state."""
    store = FrameStore.synthetic(n=24, height=64, width=64, seed=0)

    class PoisonLoader:
        """Injects NaN inputs during epoch 2 only (host-side, so it ticks)."""

        def __init__(self, base):
            self.base = base
            self.epoch = 0
            self.batch_size = base.batch_size

        def __len__(self):
            return len(self.base)

        def __iter__(self):
            self.epoch += 1
            for x, y in self.base:
                yield (x * jnp.nan if self.epoch == 2 else x), y

    loaders = {
        "train_dataloader": PoisonLoader(DeviceDataset(store, 8, frame_skip=4)),
        "val_dataloader": DeviceDataset(store, 8, frame_skip=4),
    }
    model = PolicyCNN(dtype=F32)
    tx = make_optimizer({"LEARNING_RATE": 1e-3}, 1)
    state = create_train_state(model, rng, model.example_input(1, 64, 64), tx)

    trainer = Trainer(tiny_cfg)
    result = trainer.fit(state, bc_loss_fn, loaders, rng, max_epochs=3)
    assert trainer.nan_events == 1
    assert result.history[1].get("nan_rollback") == 1.0
    # post-rollback params are finite
    leaves = jax.tree_util.tree_leaves(result.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_hpo_vmap_experiment(tmp_path):
    from carla_imitation_learning_tpu.experiments import hpo_vmap

    cfg = compose("config", overrides=[
        "model=imitation", "BATCH_SIZE=8", "synthetic_frames=60",
        "image_height=64", "image_width=64", "compute_dtype=float32",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ])
    result = hpo_vmap(cfg, lrs=(1e-4, 1e-3), epochs=1)
    assert result["n_trials"] == 2
    assert len(result["accuracies"]) == 2
    assert all(np.isfinite(result["val_losses"]))
    assert result["best_lr"] in (1e-4, 1e-3)


def test_trace_profiler_writes_trace(rng, tmp_path, tiny_cfg):
    cfg = tiny_cfg.copy()
    cfg.set_dotted("trainer.profiler", "trace")
    cfg.set_dotted("trainer.trace_dir", str(tmp_path / "trace"))
    store = FrameStore.synthetic(n=16, height=64, width=64, seed=0)
    loaders = {"train_dataloader": DeviceDataset(store, 8, frame_skip=4)}
    model = PolicyCNN(dtype=F32)
    tx = make_optimizer({"LEARNING_RATE": 1e-3}, 1)
    state = create_train_state(model, rng, model.example_input(1, 64, 64), tx)
    Trainer(cfg).fit(state, bc_loss_fn, loaders, rng, max_epochs=1)
    trace_files = list((tmp_path / "trace").rglob("*"))
    assert trace_files, "no jax.profiler trace written"
