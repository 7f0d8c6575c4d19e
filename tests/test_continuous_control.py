"""Continuous-control tier (beyond-reference): ContinuousPolicyCNN, the
control_space="continuous" rollout contract, continuous DeviceDataset labels,
and the bc_continuous experiment end-to-end (tiny shapes, CPU)."""

import json

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from carla_imitation_learning_tpu.data import pipeline as pipe
from carla_imitation_learning_tpu.data.actions import (
    continuous_to_discrete, control_to_discrete_label,
)
from carla_imitation_learning_tpu.models import ContinuousPolicyCNN
from carla_imitation_learning_tpu.render.pipeline import RenderConfig
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.training.closed_loop import (
    collect_dataset, evaluate_policy, make_rollout,
)

TOWN = make_town(blocks=2, n_buildings=8, n_lights=4)
PARAMS = SimParams(n_agents=4, episode_len=1000)
RCFG = RenderConfig(height=32, width=32, max_triangles=256, backend="jax")


def test_model_shapes_and_bounds():
    model = ContinuousPolicyCNN(dtype=jnp.float32)
    x = jnp.linspace(-3.0, 3.0, 3 * 64 * 64 * 4).reshape(3, 64, 64, 4)
    params = model.init(jax.random.PRNGKey(0), model.example_input(1, 64, 64))
    out = model.apply(params, x)
    assert out.shape == (3, 2)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh head


def test_control_label_agrees_with_reference_table():
    """On the autopilot's exact (throttle, brake) triple the continuous-
    control label map and the reference discretizer must agree."""
    for steer, s_cls in [(-0.5, 0), (0.0, 1), (0.5, 2)]:
        for (thr, brk), a_cls in [((1.0, 0.0), 2), ((0.5, 0.0), 1),
                                  ((0.0, 1.0), 0)]:
            got = int(control_to_discrete_label(
                np.float32(steer), np.float32(thr), np.float32(brk)))
            ref = int(continuous_to_discrete(
                np.float32(steer), np.float32(thr), np.float32(brk)))
            assert got == ref == a_cls * 3 + s_cls


def test_control_label_covers_the_continuous_square():
    """Arbitrary continuous controls (where the reference's brake-seeded
    fallback is ill-defined) always land in [0, 9)."""
    rng = np.random.default_rng(0)
    steer = rng.uniform(-1, 1, 256).astype(np.float32)
    acc = rng.uniform(-1, 1, 256).astype(np.float32)
    thr, brk = np.maximum(acc, 0.0), np.maximum(-acc, 0.0)
    lab = control_to_discrete_label(steer, thr, brk)
    assert lab.dtype == np.int32
    assert lab.min() >= 0 and lab.max() < 9
    # braking-dominant controls land in accel class 0
    assert np.all(lab[brk > thr] < 3)


def test_rollout_continuous_executes_policy_controls():
    def policy_fn(obs):
        assert obs.shape[-1] == 4
        return jnp.tile(jnp.asarray([[0.3, -0.4]], jnp.float32),
                        (obs.shape[0], 1))

    init_fn, rollout_fn = make_rollout(PARAMS, TOWN, RCFG, policy_fn,
                                       control_space="continuous")
    carry = init_fn(jax.random.PRNGKey(0), n_envs=3)
    _, traj = rollout_fn(carry, 5)
    np.testing.assert_allclose(np.asarray(traj["steer"]), 0.3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(traj["throttle"]), 0.0)
    np.testing.assert_allclose(np.asarray(traj["brake"]), 0.4, rtol=1e-6)
    # logged discrete label: brake-dominant (accel 0), right steer (2) → 2
    assert np.all(np.asarray(traj["action"]) == 2)
    # expert label stream still rides the reference discretizer
    assert np.asarray(traj["expert_action"]).shape == (5, 3)


def test_rollout_continuous_clips_to_unit_square():
    def policy_fn(obs):
        return jnp.tile(jnp.asarray([[2.0, -3.0]], jnp.float32),
                        (obs.shape[0], 1))

    init_fn, rollout_fn = make_rollout(PARAMS, TOWN, RCFG, policy_fn,
                                       control_space="continuous")
    carry = init_fn(jax.random.PRNGKey(1), n_envs=2)
    _, traj = rollout_fn(carry, 3)
    np.testing.assert_allclose(np.asarray(traj["steer"]), 1.0)
    np.testing.assert_allclose(np.asarray(traj["brake"]), 1.0)


def test_rollout_rejects_bad_control_space():
    with pytest.raises(ValueError):
        make_rollout(PARAMS, TOWN, RCFG, lambda o: o, control_space="nope")


def test_evaluate_policy_continuous_runs():
    model = ContinuousPolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        model.example_input(1, 32, 32))["params"]

    def policy_fn(obs):
        return model.apply({"params": params}, obs)

    m = evaluate_policy(PARAMS, TOWN, RCFG, policy_fn, jax.random.PRNGKey(2),
                        n_envs=4, n_steps=20, control_space="continuous")
    assert 0.0 <= m["driving_score"] <= 1.0
    assert m["env_steps"] == 80


def _store_and_labels():
    store, state_log, _ = collect_dataset(
        PARAMS, TOWN, RCFG, jax.random.PRNGKey(3), n_envs=4, n_steps=24)
    labels = np.stack(
        [np.asarray(state_log.steer, np.float32),
         np.asarray(state_log.throttle, np.float32)
         - np.asarray(state_log.brake, np.float32)], axis=1)
    return store, labels


def test_store_controls_are_expert_labels():
    """collect_dataset fills store.controls with the EXPERT's continuous
    (steer, accel) — equal to the state-log derivation when the expert
    drives, and consistent with the discretized actions."""
    store, labels = _store_and_labels()
    assert store.controls.shape == (len(store), 2)
    np.testing.assert_allclose(store.controls, labels, atol=1e-6)
    # slices and concat propagate the controls, aligned with frames
    part = store.slice(10, 50)
    np.testing.assert_allclose(part.controls, labels[10:50], atol=1e-6)
    both = pipe.FrameStore.concat([part, store.slice(50, 60)])
    np.testing.assert_allclose(both.controls, labels[10:60], atol=1e-6)


def test_continuous_dagger_labels_stay_expert():
    """When a CONTINUOUS policy drives the DAgger round, the aggregation
    store's continuous labels are the expert's controls — NOT the policy's
    executed ones."""
    from carla_imitation_learning_tpu.training.closed_loop import (
        dagger_iteration,
    )

    def bad_policy(obs):  # constant hard-left full-brake — nothing expert-like
        return jnp.tile(jnp.asarray([[-1.0, -1.0]], jnp.float32),
                        (obs.shape[0], 1))

    store, _, traj = dagger_iteration(
        PARAMS, TOWN, RCFG, bad_policy, jax.random.PRNGKey(7),
        n_envs=3, n_steps=16, control_space="continuous")
    # the policy's executed controls are in the traj...
    np.testing.assert_allclose(np.asarray(traj["steer"]), -1.0)
    # ...but the stored labels are the expert's (a sane autopilot never
    # commands hard-left + full-brake everywhere)
    assert not np.allclose(store.controls[:, 0], -1.0)
    # the stored continuous labels re-discretize EXACTLY to the discrete
    # expert labels (accel = throttle − brake is invertible for the
    # autopilot's {full, half, coast, brake} control set)
    disc = np.asarray(continuous_to_discrete(
        store.controls[:, 0],
        np.maximum(store.controls[:, 1], 0.0),
        np.maximum(-store.controls[:, 1], 0.0)))
    assert np.array_equal(disc.astype(np.int64),
                          np.asarray(store.actions, np.int64))


def test_device_dataset_continuous_labels_align():
    store, labels = _store_and_labels()
    ds = pipe.DeviceDataset(store, 4, frame_skip=4, continuous_labels=labels)
    idx = np.arange(4)
    x, y = ds.make_batch(idx)
    assert x.shape == (4, 32, 32, 4)
    assert y.shape == (4, 2) and y.dtype == jnp.float32
    starts = np.asarray(ds.start_indices(idx))
    np.testing.assert_allclose(np.asarray(y),
                               labels[starts + ds.label_offset], rtol=1e-6)
    # accel labels live in [-1, 1] by construction
    assert float(np.abs(np.asarray(y)[:, 1]).max()) <= 1.0


def test_device_dataset_continuous_label_validation():
    store, labels = _store_and_labels()
    with pytest.raises(ValueError):
        pipe.DeviceDataset(store, 4, continuous_labels=labels[:-1])
    with pytest.raises(ValueError):
        pipe.DeviceDataset(store, 4, continuous_labels=labels, aux=True)


TINY_SIM = ["compute_dtype=float32", "sim.n_agents=3",
            "render.height=32", "render.width=32", "render.max_triangles=256",
            "sim.town.blocks=2", "sim.town.n_buildings=6", "sim.n_lights=4"]


def _ov(tmp_path, extra):
    out = []
    for o in TINY_SIM + [f"data_dir={tmp_path}/data/",
                         f"log_dir={tmp_path}/logs"] + extra:
        out += ["-o", o]
    return out


def test_cli_bc_continuous_end_to_end(tmp_path, capsys):
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = _ov(tmp_path, [
        "NUM_EPOCHS=1", "BATCH_SIZE=4", "trainer.num_sanity_val_steps=0",
        "n_envs=4", "n_steps=40", "eval_envs=4", "eval_steps=10"])
    rc = cli_main(["run", "bc_continuous", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["history"][-1]["val_loss"] >= 0
    assert "val_steer_mse" in result["history"][-1]
    assert 0.0 <= result["eval"]["driving_score"] <= 1.0
    assert result["label_stats"]["steer_std"] >= 0


def test_cli_closed_loop_eval_continuous_checkpoint(tmp_path, capsys):
    """policy_family=continuous routes the checkpoint-eval surface through
    ContinuousPolicyCNN + control_space=continuous."""
    from carla_imitation_learning_tpu.cli import main as cli_main
    from carla_imitation_learning_tpu.utils.checkpoint import save_pytree

    model = ContinuousPolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        model.example_input(1, 32, 32))["params"]
    ckpt = tmp_path / "cont_ckpt"
    save_pytree(ckpt, {"params": params})
    rc = cli_main(["run", "closed_loop_eval", "--json"] + _ov(tmp_path, [
        "policy_family=continuous", f"checkpoint={ckpt}",
        "n_envs=4", "n_steps=10"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert 0.0 <= result["policy"]["driving_score"] <= 1.0
    assert result["expert"]["mean_speed"] > 0.1


def test_cli_export_and_artifact_eval_continuous(tmp_path, capsys):
    """Continuous artifacts are self-describing (meta family) and the
    deployed servable drives the closed loop in continuous mode."""
    from carla_imitation_learning_tpu.cli import main as cli_main

    rc = cli_main(["run", "export_policy", "--json"] + _ov(tmp_path, [
        "policy_family=continuous", "height=32", "width=32",
        "serve_max_batch=4"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["roundtrip_max_abs_err"] < 1e-4
    art = result["artifact"]
    meta = json.loads((__import__("pathlib").Path(art) / "meta.json").read_text())
    assert meta["family"] == "continuous"

    # artifact evals are SELF-DESCRIBING: no policy_family override needed —
    # meta.family drives the control space (a forgotten flag must not
    # silently argmax float controls)
    rc = cli_main(["run", "closed_loop_eval", "--json"] + _ov(tmp_path, [
        f"artifact={art}", "n_envs=4", "n_steps=10"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert 0.0 <= result["policy"]["driving_score"] <= 1.0


def test_cli_dagger_continuous(tmp_path, capsys):
    """The dagger experiment runs entirely in the continuous action space:
    continuous policy drives round 2, expert continuous labels train it."""
    from carla_imitation_learning_tpu.cli import main as cli_main

    rc = cli_main(["run", "dagger", "--json"] + _ov(tmp_path, [
        "policy_family=continuous", "NUM_EPOCHS=1", "BATCH_SIZE=8",
        "rounds=2", "n_envs=4", "n_steps=24", "epochs_per_round=1"]))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert len(result["rounds"]) == 2
    for r in result["rounds"]:
        assert np.isfinite(r["train_loss"])
        assert 0.0 <= r["driving_score"] <= 1.0
    assert result["rounds"][1]["dataset_frames"] == 2 * 4 * 24


def test_steer_rate_comfort_metric():
    """evaluate_policy reports mean |Δ commanded steer| per step; a smooth
    constant-steer continuous policy scores ~0 while a bang-bang alternator
    scores ~2 (full-range flips)."""
    def smooth(obs):
        return jnp.tile(jnp.asarray([[0.2, 0.5]], jnp.float32),
                        (obs.shape[0], 1))

    m = evaluate_policy(PARAMS, TOWN, RCFG, smooth, jax.random.PRNGKey(20),
                        n_envs=3, n_steps=12, control_space="continuous")
    assert m["steer_rate"] < 1e-6

    # the expert steers smoothly: small but bounded nonzero command motion
    e = evaluate_policy(PARAMS, TOWN, RCFG, None, jax.random.PRNGKey(21),
                        n_envs=3, n_steps=30)
    assert 0.0 <= e["steer_rate"] < 2.0
