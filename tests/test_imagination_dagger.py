"""World-model imagination rollouts + uncertainty-gated DAgger tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models.world_model import LatentWorldModel


# ------------------------------------------------------------- imagination

@pytest.fixture(scope="module")
def wm():
    model = LatentWorldModel(z_size=16, rnn="gru", height=32, width=32,
                             hidden_size=32, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), *model.example_input(2, 4))
    return model, variables["params"]


def test_imagine_shapes_and_bounds(wm):
    model, params = wm
    z0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (3, 16)))
    actions = jax.random.randint(jax.random.PRNGKey(2), (3, 7), 0, 9)
    zs = model.apply({"params": params}, z0, actions,
                     method=LatentWorldModel.imagine)
    assert zs.shape == (3, 7, 16)
    assert float(jnp.abs(zs).max()) <= 1.0  # clipped to the encoder's range


def test_imagine_deterministic_and_action_sensitive(wm):
    model, params = wm
    z0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (2, 16)))
    a1 = jnp.zeros((2, 6), jnp.int32)
    a2 = jnp.full((2, 6), 5, jnp.int32)
    f = jax.jit(lambda z, a: model.apply({"params": params}, z, a,
                                         method=LatentWorldModel.imagine))
    z_a = f(z0, a1)
    z_b = f(z0, a1)
    z_c = f(z0, a2)
    np.testing.assert_array_equal(np.asarray(z_a), np.asarray(z_b))
    assert np.abs(np.asarray(z_a) - np.asarray(z_c)).max() > 1e-6


def test_imagine_first_step_matches_teacher_forced(wm):
    """Step 0 of the open-loop rollout must equal the teacher-forced one-step
    prediction from the same (z0, a0) — same cell, same params."""
    model, params = wm
    z0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(3), (2, 16)))
    a = jax.random.randint(jax.random.PRNGKey(4), (2, 5), 0, 9)
    zs = model.apply({"params": params}, z0, a,
                     method=LatentWorldModel.imagine)
    z_tf = model.apply({"params": params}, z0[:, None], a[:, :1],
                       method=LatentWorldModel.predict_latents)
    np.testing.assert_allclose(np.asarray(zs[:, 0]),
                               np.clip(np.asarray(z_tf[:, 0]), -1, 1),
                               atol=1e-5)


def test_imagine_frames(wm):
    model, params = wm
    frames0 = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32, 1))
    actions = jnp.zeros((2, 4), jnp.int32)
    zs, imag = model.apply({"params": params}, frames0, actions,
                           method=LatentWorldModel.imagine_frames)
    assert zs.shape == (2, 4, 16)
    assert imag.shape == (2, 4, 32, 32, 1)
    assert float(imag.min()) >= 0.0 and float(imag.max()) <= 1.0


# ------------------------------------------------ uncertainty-gated dagger

def test_device_dataset_sample_mask():
    from carla_imitation_learning_tpu.data.pipeline import (
        DeviceDataset, FrameStore,
    )

    store = FrameStore.synthetic(n=64, height=8, width=8, seed=0)
    full = DeviceDataset(store, batch_size=4, frame_skip=4, drop_last=False)
    mask = np.zeros(64, bool)
    mask[10:20] = True
    ds = DeviceDataset(store, batch_size=4, frame_skip=4, drop_last=False,
                       sample_mask=mask)
    assert 0 < ds.n_samples < full.n_samples
    # every sampled window's LABEL index lands inside the mask
    starts = np.asarray(ds._valid_starts)
    assert mask[starts + ds.label_offset].all()
    with pytest.raises(ValueError):
        DeviceDataset(store, batch_size=4, frame_skip=4,
                      sample_mask=np.zeros(64, bool))
    with pytest.raises(ValueError):
        DeviceDataset(store, batch_size=4, frame_skip=4,
                      sample_mask=np.ones(10, bool))


def test_rollout_records_policy_extra():
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=4)

    def policy_fn(obs):
        action = jnp.zeros(obs.shape[0], jnp.int32)
        return action, jnp.full(obs.shape[0], 0.5)  # constant "disagreement"

    init_fn, rollout_fn = make_rollout(
        params, town, RenderConfig(height=32, width=32, backend="jax"),
        policy_fn)
    carry = init_fn(jax.random.PRNGKey(0), 3)
    _, traj = rollout_fn(carry, 4)
    assert traj["policy_extra"].shape == (4, 3)
    np.testing.assert_allclose(np.asarray(traj["policy_extra"]), 0.5)


def test_dagger_uncertain_experiment(tmp_path):
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import dagger_uncertain

    cfg = compose(overrides=[
        "model=imitation", f"log_dir={tmp_path}", f"data_dir={tmp_path}/data",
        "render.height=32", "render.width=32", "BATCH_SIZE=16",
        "sim.town.blocks=2", "sim.town.n_buildings=8", "sim.n_lights=4",
        "sim.n_agents=4", "sim.n_envs=4",
    ])
    out = dagger_uncertain(cfg, rounds=2, n_envs=4, n_steps=40,
                           epochs_per_round=1, ensemble=3, tau=0.2)
    rounds = out["rounds"]
    assert len(rounds) == 2
    assert rounds[0]["ensemble"] == 3
    assert np.isnan(rounds[0]["mean_disagreement"])      # bootstrap round
    assert 0.0 <= rounds[1]["mean_disagreement"] <= 1.0  # measured afterwards
    assert rounds[1]["dataset_frames"] == 2 * 4 * 40
    assert 0 < rounds[1]["trained_windows"] <= rounds[1]["dataset_frames"]
    for r in rounds:
        assert np.isfinite(r["train_loss"])


def test_world_model_imagine_experiment(tmp_path):
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import world_model_imagine

    # NOTE deliberately sets the MODEL-GROUP z_size (lifted into world_model's
    # kwarg by the @experiment decorator) and NO wm_z_size override — the
    # imagine stage must rebuild from the trained architecture (wm_config),
    # not re-derive cfg defaults (round-2 review finding: ScopeParamShapeError)
    cfg = compose(overrides=[
        "model=imitation", f"log_dir={tmp_path}", f"data_dir={tmp_path}/data",
        "render.height=32", "render.width=32",
        "sim.town.blocks=2", "sim.town.n_buildings=8", "sim.n_lights=4",
        "sim.n_agents=4", "NUM_EPOCHS=1", "wm_batch=4", "z_size=16",
        "trainer.max_epochs=1",
    ])
    out = world_model_imagine(cfg, horizon=4, n_envs=4, n_steps=24,
                              eval_envs=2)
    assert len(out["mse_per_step"]) == 4
    assert len(out["ssim_per_step"]) == 4
    assert all(np.isfinite(v) for v in out["mse_per_step"])
    assert all(-1.0 <= v <= 1.0 for v in out["ssim_per_step"])
    import os

    assert os.path.exists(out["strip_path"])
