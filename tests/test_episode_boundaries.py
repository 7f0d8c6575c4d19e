"""Episode-boundary integrity: no training window may cross an env-stream
start, an auto-reset, or a DAgger aggregation boundary (the reference's
windows are single-stream by construction, imitation_dataset.py:115-131)."""

import jax
import numpy as np

from carla_imitation_learning_tpu.data.frame_log import make_synthetic_state
from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore


def store_with_starts(n, start_positions, seed=0):
    s = FrameStore.synthetic(n=n, height=8, width=8, seed=seed)
    starts = np.zeros(n, bool)
    starts[list(start_positions)] = True
    s.starts = starts
    return s


def test_valid_starts_exclude_boundary_windows():
    fs = 4
    store = store_with_starts(32, [0, 10, 20])
    ds = DeviceDataset(store, batch_size=4, frame_skip=fs)
    span = max(fs - 1, ds.label_offset)  # label_offset = fs = 4
    starts = store.starts
    valid = (np.asarray(ds._valid_starts) if ds._valid_starts is not None
             else np.arange(ds.n_samples))
    assert len(valid) == ds.n_samples
    for i in valid:
        assert not starts[i + 1: i + span + 1].any(), f"window at {i} crosses"
    # every non-crossing start is included (no over-pruning)
    expected = [i for i in range(32 - span)
                if not starts[i + 1: i + span + 1].any()]
    np.testing.assert_array_equal(valid, expected)


def test_no_starts_means_every_window():
    store = FrameStore.synthetic(n=32, height=8, width=8)
    ds = DeviceDataset(store, batch_size=4, frame_skip=4)
    assert ds.n_samples == 32 - 4
    assert ds._valid_starts is None  # identity mapping, zero overhead


def test_batches_map_through_valid_starts():
    fs = 4
    store = store_with_starts(32, [0, 10, 20])
    ds = DeviceDataset(store, batch_size=4, frame_skip=fs)
    x, y = ds.make_batch(np.arange(4))
    starts_map = np.asarray(ds._valid_starts)
    # labels must be action[start + fs] of the MAPPED start, not the raw index
    np.testing.assert_array_equal(
        np.asarray(y), store.actions[starts_map[:4] + fs])


def test_concat_marks_round_boundaries():
    a = FrameStore.synthetic(n=12, height=8, width=8, seed=0)
    b = store_with_starts(12, [0, 5], seed=1)
    agg = FrameStore.concat([a, b])
    assert len(agg) == 24
    assert agg.starts[0] and agg.starts[12] and agg.starts[17]
    assert agg.starts.sum() == 3
    ds = DeviceDataset(agg, batch_size=4, frame_skip=4)
    valid = np.asarray(ds._valid_starts)
    # no window may span the a|b boundary at 12 or the reset at 17
    for i in valid:
        assert not (i < 12 <= i + 4) and not (i < 17 <= i + 4)


def test_collect_dataset_marks_env_streams_and_resets():
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import collect_dataset

    town = make_town(blocks=2, n_buildings=4, n_lights=2)
    params = SimParams(n_agents=2)
    rcfg = RenderConfig(32, 32, max_triangles=192, backend="jax")
    n_envs, n_steps = 3, 12
    store, _, traj = collect_dataset(params, town, rcfg, jax.random.PRNGKey(0),
                                     n_envs=n_envs, n_steps=n_steps)
    assert store.starts is not None and len(store.starts) == n_envs * n_steps
    # a start exactly at: every env stream's first frame + after every done
    done = np.asarray(traj["done"]).swapaxes(0, 1).reshape(-1).astype(bool)
    expect = np.zeros(n_envs * n_steps, bool)
    expect[::n_steps] = True
    expect[1:] |= done[:-1]
    np.testing.assert_array_equal(store.starts, expect)
