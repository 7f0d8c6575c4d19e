"""Recurrent policy tests: sequence/step parameter-sharing equivalence,
hidden-state reset semantics in the rollout's policy-carry slot, and the
bc_rnn experiment end-to-end through the CLI (tiny shapes)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.models import RecurrentPolicy

H = W = 32


def test_sequence_and_step_agree():
    """__call__ over a (B,T) sequence == T manual step() calls — same
    submodules, same params, same logits."""
    model = RecurrentPolicy(obs_size=1, hidden=16, dtype=jnp.float32)
    seq = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, H, W, 1))
    params = model.init(jax.random.PRNGKey(1), seq)["params"]
    logits_seq, h_final = model.apply({"params": params}, seq)
    h = model.initial_state(2)
    step_logits = []
    for t in range(5):
        h, lg = model.apply({"params": params}, h, seq[:, t],
                            method=RecurrentPolicy.step)
        step_logits.append(lg)
    np.testing.assert_allclose(np.asarray(logits_seq),
                               np.asarray(jnp.stack(step_logits, 1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_final), np.asarray(h),
                               rtol=1e-5, atol=1e-5)


def test_rollout_resets_policy_carry_on_done():
    """The policy-carry slot resets to the init value on env auto-resets:
    a counting policy's action must equal steps-since-last-reset."""
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    town = make_town(blocks=2, n_buildings=4, n_lights=2)
    sim = SimParams(n_agents=2)
    rcfg = RenderConfig(16, 16, max_triangles=192, backend="jax")

    def counting_policy(obs, h):
        # h counts steps since reset; action reports it (sim just idles on
        # mostly-brake actions, which is fine — we only check the counter)
        action = jnp.clip(h[:, 0], 0, 8).astype(jnp.int32)
        return action, h + 1.0

    init_fn, rollout_fn = make_rollout(
        sim, town, rcfg, counting_policy,
        policy_carry_init=lambda b: jnp.zeros((b, 1), jnp.float32))
    carry = init_fn(jax.random.PRNGKey(0), 4)
    assert len(carry) == 4  # states, framebuf, just_reset, policy carry
    carry, traj = rollout_fn(carry, 12)
    actions = np.asarray(traj["action"])          # (T, B)
    dones = np.asarray(traj["done"])
    T, B = actions.shape
    for b in range(B):
        since = 0
        for t in range(T):
            assert actions[t, b] == min(since, 8), (t, b)
            since = 0 if dones[t, b] else since + 1


def test_cli_bc_rnn(tmp_path, capsys):
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = []
    for o in ("sim.n_envs=4", "sim.n_agents=3", "render.height=32",
              "render.width=32", "render.max_triangles=256",
              "sim.town.blocks=2", "sim.town.n_buildings=6", "sim.n_lights=4",
              "compute_dtype=float32", "NUM_EPOCHS=1", "BATCH_SIZE=8",
              "n_envs=4", "n_steps=40", "seq_len=6", "eval_envs=4",
              "eval_steps=8", "rnn_hidden=16",
              "trainer.num_sanity_val_steps=0",
              f"log_dir={tmp_path}/logs", f"data_dir={tmp_path}/data/"):
        overrides += ["-o", o]
    rc = cli_main(["run", "bc_rnn", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["history"][-1]["train_loss"] > 0
    assert "driving_score" in result["closed_loop"]


def test_recurrent_policy_exports(tmp_path):
    """The stateful step() exports as a (h, obs) -> (h', logits) servable —
    deployment carries the hidden state client-side between requests."""
    from carla_imitation_learning_tpu.serving import export_fn, load_policy

    model = RecurrentPolicy(obs_size=1, hidden=16, dtype=jnp.float32)
    seq = jnp.zeros((1, 2, H, W, 1))
    params = model.init(jax.random.PRNGKey(0), seq)["params"]

    def step(h, frame_u8):
        obs = frame_u8.astype(jnp.float32) / 255.0
        return model.apply({"params": params}, h, obs,
                           method=RecurrentPolicy.step)

    specs = [
        jax.ShapeDtypeStruct(("b", 16), jnp.float32),
        jax.ShapeDtypeStruct(("b", H, W, 1), jnp.uint8),
    ]
    art = export_fn(step, specs, tmp_path / "rnn", meta={"kind": "rnn_step"})
    servable = load_policy(art)
    rng = np.random.default_rng(0)
    h = np.zeros((3, 16), np.float32)
    for _ in range(3):  # thread state through consecutive requests
        frame = rng.integers(0, 256, (3, H, W, 1), dtype=np.uint8)
        want_h, want_logits = step(jnp.asarray(h), jnp.asarray(frame))
        got_h, got_logits = servable.call(h, frame)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(want_logits), rtol=1e-5,
                                   atol=1e-5)
        h = np.asarray(got_h)
