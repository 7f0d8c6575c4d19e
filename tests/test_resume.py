"""Checkpoint → resume continuity through the experiment surface."""

import jax
import numpy as np

from carla_imitation_learning_tpu import compose
from carla_imitation_learning_tpu.experiments import behavior_cloning


def _cfg(tmp_path, extra=()):
    return compose("config", overrides=[
        "model=imitation", "NUM_EPOCHS=1", "BATCH_SIZE=8", "synthetic_frames=60",
        "image_height=64", "image_width=64", "compute_dtype=float32",
        "trainer.num_sanity_val_steps=0", "trainer.checkpoint.save_last=true",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ] + list(extra))


def test_resume_continues_from_checkpoint(tmp_path):
    r1 = behavior_cloning(_cfg(tmp_path, ["NUM_EPOCHS=3"]), cameras=("camera",))
    best = r1["camera"]["best_path"]
    assert best is not None
    step1 = int(r1["camera"]["state"].step)

    r2 = behavior_cloning(
        _cfg(tmp_path, [f"resume_checkpoint={best}", "seed=999"]),
        cameras=("camera",))
    # resumed run starts from the saved optimizer step, not zero
    assert int(r2["camera"]["state"].step) > step1
    # and from trained params (despite the different seed): its first-epoch
    # loss continues run 1's curve instead of restarting near scratch
    assert (r2["camera"]["history"][0]["train_loss"]
            < r1["camera"]["history"][0]["train_loss"] - 0.05)


def test_restore_params_shape_mismatch_raises(tmp_path):
    """A checkpoint whose head/stem shapes disagree with the model being
    restored into must fail LOUDLY (e.g. a 9-action checkpoint into an
    n_actions=5 eval) — silent loading would emit garbage actions."""
    import jax
    import jax.numpy as jnp
    import pytest

    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.utils.checkpoint import (
        restore_params, save_pytree,
    )

    p9 = PolicyCNN(n_actions=9).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    save_pytree(tmp_path / "ck", {"params": p9})
    restored = restore_params(tmp_path / "ck", p9)  # matching template: fine
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(p9)
    p5 = PolicyCNN(n_actions=5).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    with pytest.raises(ValueError, match="shape"):
        restore_params(tmp_path / "ck", p5)
