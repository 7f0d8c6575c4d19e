"""Training-layer tests: losses golden vs numpy, LR schedule, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore
from carla_imitation_learning_tpu.models import PolicyCNN, ConvVAE, AuxNet
from carla_imitation_learning_tpu.training import (
    bc_loss_fn, vae_loss_fn, aux_loss_fn,
    create_train_state, make_lr_schedule, make_optimizer,
    make_train_step, make_eval_step, Trainer,
)
from carla_imitation_learning_tpu.training.losses import cross_entropy, kl_divergence

F32 = jnp.float32


def _np_softmax_ce(logits, labels):
    z = logits - logits.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    return -logp[np.arange(len(labels)), labels].mean()


def test_cross_entropy_golden():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 9)).astype(np.float32)
    labels = rng.integers(0, 9, 16)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, _np_softmax_ce(logits, labels), rtol=1e-5)


def test_kl_golden():
    """KL formula from reference vae.py:26-28."""
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(8, 32)).astype(np.float32)
    log_var = rng.normal(size=(8, 32)).astype(np.float32)
    expected = (-0.5 * (1 + log_var - mu**2 - np.exp(log_var)).sum(1)).mean()
    np.testing.assert_allclose(
        float(kl_divergence(jnp.asarray(mu), jnp.asarray(log_var))), expected, rtol=1e-5)


def test_lr_schedule_milestones():
    """Adam 1e-3, ×0.1 at epochs 20 and 30 (reference imitation.py:82-87)."""
    cfg = {"LEARNING_RATE": 0.001, "LR_MILESTONES": [20, 30], "LR_GAMMA": 0.1}
    spe = 10
    sched = make_lr_schedule(cfg, steps_per_epoch=spe)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(19 * spe + 9)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(20 * spe)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(30 * spe)), 1e-5, rtol=1e-6)


def _bc_state(rng, hw=64):
    model = PolicyCNN(dtype=F32)
    cfg = {"LEARNING_RATE": 1e-3, "LR_MILESTONES": [], "gradient_clip_val": 0.5}
    tx = make_optimizer(cfg, steps_per_epoch=1)
    return create_train_state(model, rng, model.example_input(1, hw, hw), tx)


def test_bc_train_step_decreases_loss(rng):
    store = FrameStore.synthetic(n=16, height=64, width=64, seed=0)
    ds = DeviceDataset(store, batch_size=8, frame_skip=4)
    batch = next(iter(ds))
    state = _bc_state(rng)
    step = make_train_step(bc_loss_fn, donate=False)
    _, m0 = step(state, batch, rng)
    for _ in range(15):
        state, m = step(state, batch, rng)
    assert float(m["loss"]) < float(m0["loss"])
    assert float(m["accuracy"]) >= float(m0["accuracy"])


def test_vae_train_step_runs(rng):
    model = ConvVAE(height=32, width=32, dtype=F32)
    tx = make_optimizer({"LEARNING_RATE": 1e-3}, 1)
    state = create_train_state(model, rng, (model.example_input(2), rng), tx)
    loss_fn = vae_loss_fn(alpha=0.75, beta=0.1)
    step = make_train_step(loss_fn, donate=False)
    x = jax.random.uniform(rng, (2, 32, 32, 1))
    l0 = None
    for i in range(5):
        state, m = step(state, x, jax.random.fold_in(rng, i))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0
    assert set(m) == {"loss", "recon_loss", "kl_loss"}


def test_aux_train_step(rng):
    model = AuxNet(image_hw=32, dtype=F32)
    tx = make_optimizer({"LEARNING_RATE": 1e-3}, 1)
    state = create_train_state(model, rng, (model.example_input(2),), tx)
    store = FrameStore.synthetic(n=16, height=32, width=32, seed=1)
    ds = DeviceDataset(store, batch_size=8, frame_skip=4, aux=True)
    batch = next(iter(ds))
    loss_fn = aux_loss_fn(recon_weight=0.1, traffic_weight=0.25, action_weight=1.0)
    step = make_train_step(loss_fn, donate=False)
    state, m = step(state, batch, rng)
    assert {"loss", "image_recons_loss", "traffic_loss",
            "autopilot_action_loss", "accuracy"} <= set(m)


def test_trainer_fit_end_to_end(rng, tiny_cfg, tmp_path):
    from carla_imitation_learning_tpu.utils.checkpoint import BestKCheckpointManager
    from carla_imitation_learning_tpu.utils.logging import MetricLogger

    store = FrameStore.synthetic(n=32, height=64, width=64, seed=0)
    loaders = {
        "train_dataloader": DeviceDataset(store, batch_size=8, frame_skip=4),
        "val_dataloader": DeviceDataset(store, batch_size=8, frame_skip=4),
        "test_dataloader": DeviceDataset(store, batch_size=8, frame_skip=4),
    }
    state = _bc_state(rng)
    logger = MetricLogger(tmp_path, "bc", use_tensorboard=False)
    ckpt = BestKCheckpointManager(tmp_path / "ckpt", monitor="val_loss", save_top_k=1)
    trainer = Trainer(tiny_cfg, logger=logger, checkpoint_manager=ckpt)
    result = trainer.fit(state, bc_loss_fn, loaders, rng, max_epochs=2)
    assert len(result.history) == 2
    assert "val_loss" in result.history[-1]
    assert result.best_path is not None
    assert result.throughput["images_per_sec"] > 0
    test_metrics = trainer.test(result.state, bc_loss_fn, loaders)
    assert "test_loss" in test_metrics
    # restore roundtrip
    target = {"params": result.state.params, "opt_state": result.state.opt_state,
              "step": result.state.step}
    restored = ckpt.restore(target)
    leaves1 = jax.tree_util.tree_leaves(restored["params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves1)


def test_fit_is_bitwise_deterministic(rng, tiny_cfg, tmp_path):
    """Same seed, same data → bitwise-identical histories AND parameters
    across two independent fits (PRNG keys are threaded explicitly; XLA:CPU
    is deterministic). Reproducibility is a first-class contract — the
    reference only seeds torch globally (train.py:103) and gets best-effort
    repeatability from DataLoader workers."""
    def run():
        store = FrameStore.synthetic(n=32, height=64, width=64, seed=0)
        loaders = {
            "train_dataloader": DeviceDataset(store, batch_size=8,
                                              frame_skip=4, shuffle=True,
                                              seed=5),
            "val_dataloader": DeviceDataset(store, batch_size=8, frame_skip=4),
        }
        state = _bc_state(jax.random.PRNGKey(11))
        trainer = Trainer(tiny_cfg)
        result = trainer.fit(state, bc_loss_fn, loaders,
                             jax.random.PRNGKey(12), max_epochs=2)
        return result.history, result.state.params

    h1, p1 = run()
    h2, p2 = run()
    assert h1 == h2  # exact float equality, incl. losses
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
