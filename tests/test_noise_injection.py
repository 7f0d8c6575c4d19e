"""CIL-style collection noise (NoiseConfig): exploration on the executed
steering, supervision stays clean — the recovery-data trick the CARLA CIL
collection scripts implement host-side, here part of the jitted rollout."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.data.actions import continuous_to_discrete
from carla_imitation_learning_tpu.data.frame_log import StateLog
from carla_imitation_learning_tpu.render.pipeline import RenderConfig
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.training.closed_loop import (
    NoiseConfig, _noise_schedule, collect_dataset, make_rollout,
)

TOWN = make_town(blocks=2, n_buildings=8, n_lights=4)
PARAMS = SimParams(n_agents=4, episode_len=1000)
RCFG = RenderConfig(height=32, width=32, max_triangles=256, backend="jax")
NOISE = NoiseConfig(prob=0.05, duration=8, magnitude=0.6, seed=7)


def test_schedule_shape_bounds_and_determinism():
    key = jax.random.PRNGKey(3)
    sched = np.asarray(_noise_schedule(key, 100, 16, NOISE))
    assert sched.shape == (100, 16)
    assert np.all(np.abs(sched) <= NOISE.magnitude + 1e-6)
    # temporally correlated bursts, not white noise: a decent share of steps
    # is active, and active steps come in runs (given prob=0.05, dur=8 the
    # expected active fraction is ~1-(1-p)^d ≈ 0.33)
    active = np.abs(sched) > 1e-6
    assert 0.05 < active.mean() < 0.8
    runs = np.diff(active.astype(int), axis=0)
    n_bursts = (runs == 1).sum()
    assert active.sum() > 3 * max(n_bursts, 1)  # mean run length > 3 steps
    # deterministic under the same key
    again = np.asarray(_noise_schedule(key, 100, 16, NOISE))
    np.testing.assert_array_equal(sched, again)


def test_executed_steer_perturbed_labels_clean():
    init_fn, rollout_fn = make_rollout(PARAMS, TOWN, RCFG, policy_fn=None,
                                       noise=NOISE)
    carry = init_fn(jax.random.PRNGKey(0), n_envs=4)
    _, traj = rollout_fn(carry, 60)
    execd = np.asarray(traj["steer"])
    clean = np.asarray(traj["clean_steer"])
    assert execd.shape == clean.shape == (60, 4)
    # the noise actually fires and stays bounded
    assert np.any(np.abs(execd - clean) > 1e-3)
    assert np.all(np.abs(execd - clean) <= NOISE.magnitude + 1e-6)
    assert np.all(np.abs(execd) <= 1.0 + 1e-6)
    # labels discretize the CLEAN driver control, not the perturbed one
    want = np.asarray(continuous_to_discrete(
        jnp.asarray(clean), traj["throttle"], traj["brake"]))
    np.testing.assert_array_equal(np.asarray(traj["expert_action"]), want)
    np.testing.assert_array_equal(np.asarray(traj["action"]), want)


def test_noise_off_traj_unchanged():
    init_fn, rollout_fn = make_rollout(PARAMS, TOWN, RCFG, policy_fn=None)
    carry = init_fn(jax.random.PRNGKey(0), n_envs=2)
    _, traj = rollout_fn(carry, 5)
    assert "clean_steer" not in traj


def test_collected_log_rederives_store_actions():
    """The raw-log contract invariant CIL collection guarantees: labels
    re-derived from state.csv columns (continous_to_discreet semantics,
    imitation_dataset.py:317-339) equal the stored actions, because the log
    records the noise-FREE supervision signal."""
    store, state, _ = collect_dataset(PARAMS, TOWN, RCFG, jax.random.PRNGKey(1),
                                      n_envs=4, n_steps=40, noise=NOISE)
    assert isinstance(state, StateLog)
    rederived = np.asarray(continuous_to_discrete(
        jnp.asarray(state.steer), jnp.asarray(state.throttle),
        jnp.asarray(state.brake)))
    np.testing.assert_array_equal(store.actions, rederived)


def test_noise_visits_recovery_states():
    """The point of the exercise: noisy collection must visit states the
    clean expert never reaches (larger realized wheel angles), giving BC
    off-center states WITH corrective labels."""
    k = jax.random.PRNGKey(2)
    _, clean_state, _ = collect_dataset(PARAMS, TOWN, RCFG, k,
                                        n_envs=4, n_steps=80)
    _, noisy_state, _ = collect_dataset(PARAMS, TOWN, RCFG, k,
                                        n_envs=4, n_steps=80, noise=NOISE)
    # current_steer is the realized (physical) wheel angle the policy
    # observes — exploration must widen its distribution
    assert np.abs(noisy_state.current_steer).mean() \
        > np.abs(clean_state.current_steer).mean() * 1.05
