"""PPO fine-tuning tests (training/rl.py): GAE vs a numpy reference, exact
observation-window reconstruction against update_framebuf, reward wiring,
BC warm-start equivalence, and a tiny end-to-end run through the CLI."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models import PolicyCNN
from carla_imitation_learning_tpu.training.closed_loop import update_framebuf
from carla_imitation_learning_tpu.training.rl import (
    ActorCriticCNN,
    PPOConfig,
    actor_policy_params_from,
    compute_gae,
    gather_windows,
    reward_from_traj,
    warm_start_from_policy,
    window_sources,
)


def test_gae_matches_numpy_reference():
    rng = np.random.default_rng(0)
    T, B = 17, 5
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = rng.random((T, B)) < 0.15
    last_value = rng.normal(size=(B,)).astype(np.float32)
    gamma, lam = 0.97, 0.9

    adv_np = np.zeros((T, B), np.float64)
    gae = np.zeros(B, np.float64)
    v_next = last_value.astype(np.float64)
    for t in range(T - 1, -1, -1):
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + gamma * v_next * nonterm - values[t]
        gae = delta + gamma * lam * nonterm * gae
        adv_np[t] = gae
        v_next = values[t]

    adv, ret = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                           jnp.asarray(dones), jnp.asarray(last_value),
                           gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), adv_np + values,
                               rtol=1e-5, atol=1e-5)


def test_window_reconstruction_matches_framebuf():
    """window_sources + gather_windows reproduce EXACTLY the observation the
    rollout's update_framebuf built at every step (slide + refill-on-reset),
    including a forced refill at t=0 (ppo_train's rollout-start contract)."""
    rng = np.random.default_rng(1)
    T, B, H, W, k = 12, 3, 4, 4, 4
    gray = rng.integers(0, 256, (T, B, H, W), dtype=np.uint8)
    dones = rng.random((T, B)) < 0.25

    # replay the rollout's framebuf evolution: just_reset[t] = done[t-1],
    # with the forced refill at t=0
    fbs = []
    fb = jnp.zeros((B, H, W, k), jnp.uint8)
    just_reset = jnp.ones((B,), bool)
    for t in range(T):
        fb = update_framebuf(fb, jnp.asarray(gray[t]), just_reset)
        fbs.append(np.asarray(fb))
        just_reset = jnp.asarray(dones[t])
    want = np.stack(fbs).astype(np.float32) / 255.0     # (T, B, H, W, k)

    src = window_sources(jnp.asarray(dones), k)
    flat = jnp.arange(T * B)
    got = np.asarray(gather_windows(jnp.asarray(gray), src, flat))
    np.testing.assert_allclose(got.reshape(T, B, H, W, k), want, atol=1e-6)


def test_reward_wiring():
    cfg = PPOConfig(w_progress=2.0, w_collision=5.0, w_red=3.0, w_offroad=1.0)
    traj = {
        "route_ds": jnp.asarray([[0.5, 0.0]]),
        "collision": jnp.asarray([[False, True]]),
        "red_light": jnp.asarray([[True, True]]),
        "speed": jnp.asarray([[1.0, 3.0]]),   # only env 1 is a violation
        "offroad": jnp.asarray([[False, True]]),
    }
    r = np.asarray(reward_from_traj(traj, cfg))
    np.testing.assert_allclose(r, [[1.0, -5.0 - 3.0 - 1.0]], atol=1e-6)


def test_reward_red_penalty_is_per_event():
    """Sustained red-exposure while moving costs w_red ONCE (rising edge),
    matching the evaluator's discrete run-the-light events."""
    cfg = PPOConfig(w_progress=0.0, w_collision=0.0, w_red=3.0, w_offroad=0.0)
    f, t = False, True
    traj = {
        "route_ds": jnp.zeros((5, 1)),
        "collision": jnp.zeros((5, 1), bool),
        "offroad": jnp.zeros((5, 1), bool),
        "red_light": jnp.asarray([[t], [t], [f], [t], [t]]),
        "speed": jnp.full((5, 1), 3.0),
    }
    r = np.asarray(reward_from_traj(traj, cfg))[:, 0]
    # two crossings (steps 0 and 3) → two penalties, not four
    np.testing.assert_allclose(r, [-3.0, 0.0, 0.0, -3.0, 0.0], atol=1e-6)


def test_warm_start_actor_matches_policy():
    """A BC PolicyCNN warm-started into the ActorCritic gives IDENTICAL
    action logits (the critic head is the only fresh part)."""
    H = W = 32
    pol = PolicyCNN(dtype=jnp.float32)
    p_bc = pol.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 4)))["params"]
    ac = ActorCriticCNN(dtype=jnp.float32)
    p_ac = ac.init(jax.random.PRNGKey(2), ac.example_input(1, H, W))["params"]
    p_ac = warm_start_from_policy(p_ac, p_bc)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, H, W, 4))
    logits_ac, value = ac.apply({"params": p_ac}, x)
    logits_bc = pol.apply({"params": p_bc}, x)
    np.testing.assert_allclose(np.asarray(logits_ac), np.asarray(logits_bc),
                               rtol=1e-6, atol=1e-6)
    assert value.shape == (2,)
    # and the projection back round-trips
    back = actor_policy_params_from(p_ac)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)), back, p_bc))


def test_gaussian_logp_matches_numpy():
    from carla_imitation_learning_tpu.training.rl import gaussian_logp

    rng = np.random.default_rng(5)
    a = rng.normal(size=(7, 2)).astype(np.float32)
    mean = rng.normal(size=(7, 2)).astype(np.float32)
    log_std = rng.normal(size=(2,)).astype(np.float32) * 0.3
    std = np.exp(log_std)
    want = (-0.5 * ((a - mean) / std) ** 2
            - np.log(std) - 0.5 * np.log(2 * np.pi)).sum(-1)
    got = np.asarray(gaussian_logp(jnp.asarray(a), jnp.asarray(mean),
                                   jnp.asarray(log_std)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warm_start_continuous_actor_matches_policy():
    """A bc_continuous checkpoint warm-starts the Gaussian actor: the
    deterministic mean IS the BC policy's output; log_std stays fresh."""
    from carla_imitation_learning_tpu.models import ContinuousPolicyCNN

    H = W = 32
    pol = ContinuousPolicyCNN(dtype=jnp.float32)
    p_bc = pol.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 4)))["params"]
    ac = ActorCriticCNN(dtype=jnp.float32, continuous=True)
    p_ac = ac.init(jax.random.PRNGKey(2), ac.example_input(1, H, W))["params"]
    p_ac = warm_start_from_policy(p_ac, p_bc)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, H, W, 4))
    (mean, log_std), value = ac.apply({"params": p_ac}, x)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(pol.apply({"params": p_bc}, x)),
                               rtol=1e-6, atol=1e-6)
    assert log_std.shape == (2,) and value.shape == (2,)
    # projection back is ContinuousPolicyCNN-shaped (log_std is actor-only)
    back = actor_policy_params_from(p_ac)
    assert set(back) == set(p_bc)


TINY = [
    "sim.n_envs=4", "sim.n_agents=3", "render.height=32", "render.width=32",
    "render.max_triangles=256", "sim.town.blocks=2", "sim.town.n_buildings=6",
    "sim.n_lights=4", "compute_dtype=float32",
]


def test_cli_rl_finetune(tmp_path, capsys):
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = []
    for o in TINY + [
        f"log_dir={tmp_path}/logs", "n_envs=4", "rollout_steps=8",
        "iterations=2", "eval_envs=4", "eval_steps=8",
        "rl_update_epochs=1", "rl_num_minibatches=2",
    ]:
        overrides += ["-o", o]
    rc = cli_main(["run", "rl_finetune", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert len(result["history"]) == 2
    for h in result["history"]:
        for v in h.values():
            assert np.isfinite(v)
    assert "driving_score" in result["before"]
    assert "driving_score" in result["after"]
    assert (tmp_path / "logs" / "rl_finetune" / "actor_params").exists()


def test_cli_rl_finetune_continuous(tmp_path, capsys):
    """PPO over the continuous (steer, accel) Gaussian actor end-to-end; the
    written actor checkpoint loads back as a ContinuousPolicyCNN and drives
    the closed loop in continuous mode."""
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = []
    for o in TINY + [
        f"log_dir={tmp_path}/logs", "policy_family=continuous",
        "n_envs=4", "rollout_steps=8", "iterations=2", "eval_envs=4",
        "eval_steps=8", "rl_update_epochs=1", "rl_num_minibatches=2",
    ]:
        overrides += ["-o", o]
    rc = cli_main(["run", "rl_finetune", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert len(result["history"]) == 2
    for h in result["history"]:
        for v in h.values():
            assert np.isfinite(v)
    ckpt = result["actor_checkpoint"]

    rc = cli_main(["run", "closed_loop_eval", "--json"] + [
        a for o in TINY + [f"log_dir={tmp_path}/logs",
                           "policy_family=continuous",
                           f"checkpoint={ckpt}", "n_envs=4", "n_steps=8"]
        for a in ("-o", o)])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert 0.0 <= result["policy"]["driving_score"] <= 1.0
