"""Single-program DAgger (training/online_dagger.py): β-mixing, buffer
window sampling, and the one-jit end-to-end run — tiny shapes, CPU."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from carla_imitation_learning_tpu.models import PolicyCNN
from carla_imitation_learning_tpu.render.pipeline import RenderConfig
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.training.online_dagger import (
    make_online_dagger, sample_windows,
)
from carla_imitation_learning_tpu.training.steps import create_train_state

TOWN = make_town(blocks=2, n_buildings=8, n_lights=4)
PARAMS = SimParams(n_agents=4, episode_len=1000)
RCFG = RenderConfig(height=32, width=32, max_triangles=256, backend="jax")


def _buffer(R=2, T=10, B=3, H=4, W=4, dones=None):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (R, T, B, H, W)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 9, (R, T, B)), jnp.int32)
    if dones is None:
        dones = jnp.zeros((R, T, B), bool)
    return frames, labels, dones


def test_sample_windows_clean_buffer():
    frames, labels, dones = _buffer()
    obs, y, w = sample_windows(jax.random.PRNGKey(0), frames, labels, dones,
                               r=jnp.int32(1), k_per_env=21, frame_skip=4)
    assert obs.shape == (63, 4, 4, 4) and y.shape == (63,) and w.shape == (63,)
    assert float(obs.min()) >= 0.0 and float(obs.max()) <= 1.0
    # with no dones, weight is exactly the t >= fs-1 predicate: both classes
    # must appear at T=10 (P(all 64 same side) ~ 0)
    assert 0.0 < float(w.mean()) < 1.0


def test_sample_windows_all_done_all_masked():
    frames, labels, dones = _buffer(dones=jnp.ones((2, 10, 3), bool))
    _, _, w = sample_windows(jax.random.PRNGKey(1), frames, labels, dones,
                             r=jnp.int32(1), k_per_env=40, frame_skip=4)
    # every window's trailing frames contain a reset → nothing is trainable
    assert float(w.sum()) == 0.0


def test_sample_windows_respects_round_bound():
    # round-1 labels get a sentinel class; sampling at r=0 must never see it
    frames, labels, dones = _buffer()
    labels = labels.at[1].set(8)
    labels = labels.at[0].set(jnp.clip(labels[0], 0, 7))
    _, y, _ = sample_windows(jax.random.PRNGKey(2), frames, labels, dones,
                             r=jnp.int32(0), k_per_env=80, frame_skip=4)
    assert int(jnp.max(y)) <= 7


def test_single_window_boundary_semantics():
    """done after frame t tears windows containing t as a NON-final frame
    (starts convention of collect_dataset), but not the window ending at t."""
    R, T, B = 1, 8, 1
    frames = jnp.zeros((R, T, B, 2, 2), jnp.uint8)
    labels = jnp.zeros((R, T, B), jnp.int32)
    dones = jnp.zeros((R, T, B), bool).at[0, 4, 0].set(True)
    # probe every t by sampling many and checking the weight pattern
    obs, y, w = sample_windows(jax.random.PRNGKey(3), frames, labels, dones,
                               r=jnp.int32(0), k_per_env=512, frame_skip=4)
    # reconstruct which t each sample used is not exposed; instead check the
    # analytic set: valid t are {3, 4} ∪ {t >= 8} minus torn {5,6,7} → {3,4}
    # over T=8. So the mean weight must equal the empirical fraction of
    # t ∈ {3,4} drawn — strictly between 0 and the no-done fraction (5/8).
    frac = float(w.mean())
    assert 0.0 < frac < 5.0 / 8.0


def test_online_dagger_end_to_end():
    model = PolicyCNN()
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)), tx)
    run = make_online_dagger(model.apply, PARAMS, TOWN, RCFG,
                             n_envs=4, n_steps=16, rounds=2, train_steps=4,
                             batch=16, beta=0.0)
    state2, m = run(state, jax.random.PRNGKey(1))
    assert m["loss"].shape == (2,) and m["agreement"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    # β_0 = 0**0 = 1 → round 0 executes the expert exactly
    assert float(m["agreement"][0]) == 1.0
    assert float(m["valid_frac"][0]) > 0.5
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_online_dagger_beta_one_stays_expert():
    model = PolicyCNN()
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)), tx)
    run = make_online_dagger(model.apply, PARAMS, TOWN, RCFG,
                             n_envs=2, n_steps=8, rounds=2, train_steps=2,
                             batch=8, beta=1.0)
    _, m = run(state, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(m["agreement"]), 1.0)


def test_online_dagger_sharded_spmd():
    """The whole single-program DAgger under an 8-device mesh: env state,
    aggregation buffer, and training batches shard on the env axis
    (stratified sampling keeps every gather shard-local)."""
    from carla_imitation_learning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(axis_sizes={"data": 8})
    model = PolicyCNN()
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)), tx)
    run = make_online_dagger(model.apply, PARAMS, TOWN, RCFG,
                             n_envs=8, n_steps=12, rounds=2, train_steps=3,
                             batch=16, beta=0.0, mesh=mesh)
    state2, m = run(state, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    assert float(m["agreement"][0]) == 1.0
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_sample_windows_extras_align_with_labels():
    """extras grids gather at the SAME (round, t) indices as the labels —
    encode (r, t) into both labels and an extras grid and check they agree."""
    R, T, B = 2, 10, 3
    frames, _, dones = _buffer()
    code = (jnp.arange(R)[:, None, None] * 100
            + jnp.arange(T)[None, :, None] + jnp.zeros((1, 1, B))).astype(jnp.int32)
    obs, y, w, ex = sample_windows(jax.random.PRNGKey(3), frames, code, dones,
                                   r=jnp.int32(1), k_per_env=20, frame_skip=4,
                                   extras=(code.astype(jnp.float32),))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ex, np.int32))


def test_online_dagger_cil_goal_directed():
    """The one-jit DAgger composes with the route planner: a command-
    conditioned BranchedCILPolicy trains on goal-directed rounds (buffer
    carries speeds + commands) inside a single compiled program, and the
    result evaluates on the A→B task."""
    from carla_imitation_learning_tpu.models import BranchedCILPolicy
    from carla_imitation_learning_tpu.sim.planner import (
        plan_to_goals, sample_goals,
    )
    from carla_imitation_learning_tpu.training import closed_loop as cl

    town = make_town(blocks=2, n_buildings=6, n_lights=2, seed=1,
                     superblocks=True, turn_fans=True)
    town = plan_to_goals(town, sample_goals(town, 0, 2))
    model = BranchedCILPolicy(n_commands=6, dtype=jnp.float32)
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), model.example_input(1, 32, 32), tx)
    goal_ids = jnp.arange(4, dtype=jnp.int32) % 2
    run = make_online_dagger(model.apply, PARAMS, town, RCFG,
                             n_envs=4, n_steps=16, rounds=2, train_steps=4,
                             batch=16, beta=0.0, cil=True, goal_ids=goal_ids)
    state2, m = run(state, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    assert float(m["agreement"][0]) == 1.0  # round 0 = navigating expert
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
    res = cl.evaluate_routes(PARAMS, town, RCFG,
                             model.as_policy_fn(state2.params),
                             jax.random.PRNGKey(2), n_envs=4, n_steps=40,
                             goal_ids=goal_ids)
    assert "arrival_rate" in res
