"""Imagination-trained policy (training/imagination.py): latent-dynamics
consistency with LatentWorldModel.imagine, reward-head regression, imagined
return actually increasing, and the dream_policy experiment end-to-end."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.models.world_model import LatentWorldModel
from carla_imitation_learning_tpu.training import imagination as imag


def _tiny_wm(rng, z=8, hw=16):
    wm = LatentWorldModel(z_size=z, rnn="gru", height=hw, width=hw,
                          hidden_size=32, dtype=jnp.float32)
    frames, actions = wm.example_input(2, 3)
    params = wm.init(rng, frames, actions)["params"]
    return wm, params


def test_wm_step_matches_imagine():
    """The imagination trainer's functional unroll (_wm_carry/_wm_step) must
    reproduce LatentWorldModel.imagine EXACTLY for one-hot actions — the
    policy trains against the same dynamics the model exposes."""
    wm, params = _tiny_wm(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    z0 = jnp.tanh(jax.random.normal(rng, (4, wm.z_size)))
    actions = jax.random.randint(jax.random.PRNGKey(2), (4, 6), 0, 9)
    want = wm.apply({"params": params}, z0, actions,
                    method=LatentWorldModel.imagine)

    carry = wm.apply({"params": params}, 4, method=imag._wm_carry)
    z, zs = z0, []
    onehot = jax.nn.one_hot(actions, wm.n_actions)
    for t in range(6):
        carry, z = wm.apply({"params": params}, carry, z, onehot[:, t],
                            method=imag._wm_step)
        zs.append(z)
    got = jnp.stack(zs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_reward_head_fits_linear_reward():
    rng = np.random.default_rng(0)
    zs = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    rewards = zs @ w
    _, params, hist = imag.train_reward_head(
        zs, rewards, jax.random.PRNGKey(3), steps=400)
    assert hist[-1] < 0.05 * hist[0]  # regression actually fits


def test_reward_head_ensemble_trains_stacked_members():
    """ensemble=E returns params with a leading member axis; the vmapped
    bootstrap training fits every member (mean mse drops) and distinct
    inits stay distinct (the disagreement signal exists)."""
    rng = np.random.default_rng(1)
    zs = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    rewards = zs @ w
    head, params, hist = imag.train_reward_head(
        zs, rewards, jax.random.PRNGKey(3), steps=400, ensemble=3)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(leaf.shape[0] == 3 for leaf in leaves)
    assert hist[-1] < 0.05 * hist[0]
    # members agree on-manifold, disagree off-manifold (epistemic signal)
    on = jax.vmap(lambda p: head.apply({"params": p}, zs[:64]))(params)
    far = jax.vmap(lambda p: head.apply({"params": p}, zs[:64] * 50.0))(params)
    assert float(jnp.std(far, axis=0).mean()) > float(jnp.std(on, axis=0).mean())


def test_train_latent_bc_fits_and_anchors():
    """Latent BC fits a synthetic z→action map, and an imagination run
    KL-anchored to it stays near the BC policy's action distribution even
    when the (random) reward head pulls elsewhere."""
    rng = np.random.default_rng(2)
    zs = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(8, 9)).astype(np.float32))
    actions = jnp.argmax(zs @ W, axis=-1).astype(jnp.int32)
    policy = imag.LatentPolicy(n_actions=9, hidden=16)
    bc_params, hist = imag.train_latent_bc(
        policy, zs, actions, jax.random.PRNGKey(4), steps=500)
    assert hist[-1] < 0.5 * hist[0]
    logits = policy.apply({"params": bc_params}, zs)
    acc = float((jnp.argmax(logits, -1) == actions).mean())
    assert acc > 0.5

    wm, params = _tiny_wm(jax.random.PRNGKey(5))
    head = imag.RewardHead(hidden=16)
    rh_params = head.init(jax.random.PRNGKey(6),
                          jnp.zeros((1, wm.z_size)))["params"]
    _, anchored, h = imag.imagination_train(
        wm, params, head, rh_params, zs, jax.random.PRNGKey(7),
        updates=120, batch=64, horizon=6, lr=3e-3, hidden=16,
        anchor_params=bc_params, anchor_coef=50.0, init_params=bc_params)
    a_logits = policy.apply({"params": anchored}, zs)
    agree = float((jnp.argmax(a_logits, -1) == jnp.argmax(logits, -1)).mean())
    assert agree > 0.8          # the KL ball held
    assert h[-1]["anchor_kl"] < 1.0


def test_disagreement_penalty_and_uncertainty_stop():
    """With an UNTRAINED (random-init) ensemble — maximal epistemic
    uncertainty everywhere — the disagreement-penalized return is lower
    than the bare mean-return, and uncertainty_stop terminates rollouts
    (alive_frac < 1)."""
    wm, params = _tiny_wm(jax.random.PRNGKey(8))
    zs = jnp.tanh(jax.random.normal(jax.random.PRNGKey(9), (256, wm.z_size)))
    head = imag.RewardHead(hidden=16)
    rh_stack = jax.vmap(
        lambda k: head.init(k, jnp.zeros((1, wm.z_size)))["params"])(
        jax.random.split(jax.random.PRNGKey(10), 4))
    _, _, h = imag.imagination_train(
        wm, params, head, rh_stack, zs, jax.random.PRNGKey(11),
        updates=30, batch=64, horizon=6, lr=3e-3,
        ensemble=4, disagree_coef=1.0, uncertainty_stop=1e-3)
    assert h[-1]["reward_std"] > 0.0
    assert h[-1]["alive_frac"] < 1.0   # untrained members disagree > 1e-3
    assert np.isfinite(h[-1]["loss"])


def test_imagination_training_increases_imagined_return():
    """Against a FROZEN (randomly initialized) reward head and world model,
    the policy must learn to steer imagination toward high-reward latents —
    the imagined return strictly improves over training."""
    wm, params = _tiny_wm(jax.random.PRNGKey(4))
    head = imag.RewardHead(hidden=16)
    rh_params = head.init(jax.random.PRNGKey(5),
                          jnp.zeros((1, wm.z_size)))["params"]
    zs = jnp.tanh(jax.random.normal(jax.random.PRNGKey(6), (256, wm.z_size)))
    _, _, hist = imag.imagination_train(
        wm, params, head, rh_params, zs, jax.random.PRNGKey(7),
        updates=150, batch=64, horizon=8, lr=3e-3)
    assert hist[-1]["imagined_return"] > hist[0]["imagined_return"]
    assert np.isfinite(hist[-1]["loss"])


def test_latent_policy_fn_contract():
    wm, params = _tiny_wm(jax.random.PRNGKey(8))
    policy = imag.LatentPolicy(n_actions=9, hidden=16)
    p_params = policy.init(jax.random.PRNGKey(9),
                           jnp.zeros((1, wm.z_size)))["params"]
    pf = imag.latent_policy_fn(wm, params, policy, p_params)
    obs = jnp.zeros((3, 16, 16, 4))
    a = pf(obs)
    assert a.shape == (3,) and a.dtype == jnp.int32
    assert 0 <= int(a.min()) and int(a.max()) < 9


def test_cli_dream_policy_end_to_end(tmp_path, capsys):
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = []
    for o in ["NUM_EPOCHS=1", "wm_batch=4", "compute_dtype=float32",
              "trainer.num_sanity_val_steps=0", "sim.n_agents=3",
              "render.height=32", "render.width=32",
              "render.max_triangles=256", "sim.town.blocks=2",
              "sim.town.n_buildings=6", "sim.n_lights=4",
              "n_envs=4", "n_steps=30", "seq_len=4", "horizon=6",
              "imag_updates=30", "imag_batch=32", "reward_steps=50",
              "eval_envs=4", "eval_steps=10",
              f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs"]:
        overrides += ["-o", o]
    rc = cli_main(["run", "dream_policy", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert np.isfinite(result["wm_val_loss"])
    assert result["reward_head_mse"][-1] <= result["reward_head_mse"][0]
    assert np.isfinite(result["imagined_return_last"])
    assert 0.0 <= result["eval"]["driving_score"] <= 1.0
    assert 0.0 <= result["expert"]["driving_score"] <= 1.0


def _tiny_wm_cont(rng, z=8, hw=16):
    wm = LatentWorldModel(z_size=z, rnn="gru", height=hw, width=hw,
                          hidden_size=32, dtype=jnp.float32,
                          action_space="continuous")
    frames, actions = wm.example_input(2, 3)
    assert actions.shape == (2, 3, 2)  # continuous conditioning
    params = wm.init(rng, frames, actions)["params"]
    return wm, params


def test_continuous_wm_forward_and_imagine():
    wm, params = _tiny_wm_cont(jax.random.PRNGKey(10))
    frames, actions = wm.example_input(3, 5)
    recon, z, z_pred, frames_pred = wm.apply({"params": params}, frames, actions)
    assert z.shape == (3, 5, 8) and z_pred.shape == (3, 4, 8)
    plan = jnp.zeros((3, 6, 2))
    zs = wm.apply({"params": params}, z[:, 0], plan,
                  method=LatentWorldModel.imagine)
    assert zs.shape == (3, 6, 8)
    assert np.isfinite(np.asarray(zs)).all()


def test_continuous_imagination_increases_return_and_eval_adapter():
    wm, params = _tiny_wm_cont(jax.random.PRNGKey(11))
    head = imag.RewardHead(hidden=16)
    rh_params = head.init(jax.random.PRNGKey(12),
                          jnp.zeros((1, wm.z_size)))["params"]
    zs = jnp.tanh(jax.random.normal(jax.random.PRNGKey(13), (256, wm.z_size)))
    policy, p_params, hist = imag.imagination_train(
        wm, params, head, rh_params, zs, jax.random.PRNGKey(14),
        updates=150, batch=64, horizon=8, lr=3e-3)
    assert isinstance(policy, imag.ContinuousLatentPolicy)
    assert hist[-1]["imagined_return"] > hist[0]["imagined_return"]
    # real-sim adapter emits bounded float controls
    pf = imag.latent_policy_fn(wm, params, policy, p_params)
    out = pf(jnp.zeros((3, 16, 16, 4)))
    assert out.shape == (3, 2)
    assert float(jnp.abs(out).max()) <= 1.0


def test_sequence_dataset_continuous_actions():
    from carla_imitation_learning_tpu.data import pipeline as pipe
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import (
        collect_dataset,
    )

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=4, episode_len=1000)
    rcfg = RenderConfig(height=16, width=16, max_triangles=256, backend="jax")
    store, _, _ = collect_dataset(params, town, rcfg, jax.random.PRNGKey(15),
                                  n_envs=3, n_steps=20)
    ds = pipe.SequenceDataset(store, batch_size=2, seq_len=4, episode_len=20,
                              shuffle=False, continuous_actions=True)
    frames, actions = next(iter(ds))
    assert actions.shape == (2, 4, 2) and actions.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(actions[0]),
                               store.controls[ds.starts[0]:ds.starts[0] + 4],
                               atol=1e-6)
    # reference-layout stores (no controls) reject the flag clearly
    import dataclasses as _dc

    bare = _dc.replace(store, controls=None)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pipe.SequenceDataset(bare, batch_size=2, seq_len=4,
                             continuous_actions=True)


def test_cli_dream_policy_continuous(tmp_path, capsys):
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = []
    for o in ["NUM_EPOCHS=1", "wm_batch=4", "compute_dtype=float32",
              "trainer.num_sanity_val_steps=0", "sim.n_agents=3",
              "render.height=32", "render.width=32",
              "render.max_triangles=256", "sim.town.blocks=2",
              "sim.town.n_buildings=6", "sim.n_lights=4",
              "policy_family=continuous",
              "n_envs=4", "n_steps=30", "seq_len=4", "horizon=6",
              "imag_updates=30", "imag_batch=32", "reward_steps=50",
              "eval_envs=4", "eval_steps=10",
              f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs"]:
        overrides += ["-o", o]
    rc = cli_main(["run", "dream_policy", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert np.isfinite(result["wm_val_loss"])
    assert np.isfinite(result["imagined_return_last"])
    assert 0.0 <= result["eval"]["driving_score"] <= 1.0
