"""Auxiliary semantic-segmentation decoder (BASELINE config #3): AuxNet seg
head shapes, the seg loss + mIoU metric, the semantic recording path, and
the bc_aux -o aux_seg_weight=... experiment end-to-end."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.models import AuxNet
from carla_imitation_learning_tpu.training.losses import (
    aux_seg_loss_fn, mean_iou,
)


def test_auxnet_seg_head_shapes():
    model = AuxNet(obs_size=4, image_hw=64, seg_classes=8,
                   dtype=jnp.float32)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 4)),
         jnp.ones((2, 3)))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    recon, traffic, action, seg = model.apply({"params": params}, x)
    assert recon.shape == (2, 64, 64, 4)
    assert traffic.shape == (2, 2)
    assert action.shape == (2, 9)
    assert seg.shape == (2, 64, 64, 8)
    # seg head emits raw logits, not probabilities
    assert float(seg.min()) < 0.0 or float(seg.max()) > 1.0


def test_auxnet_without_seg_keeps_reference_contract():
    model = AuxNet(obs_size=4, image_hw=64, dtype=jnp.float32)
    x = model.example_input(1)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert len(outs) == 3


def test_mean_iou_perfect_and_partial():
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 4, (2, 8, 8)))
    perfect = jax.nn.one_hot(labels, 8) * 10.0
    assert float(mean_iou(perfect, labels)) == 1.0
    # all-one-class prediction: IoU = freq of that class for it, 0 elsewhere
    wrong = jnp.zeros((2, 8, 8, 8)).at[..., 0].set(10.0)
    assert float(mean_iou(wrong, labels)) < 0.5


def test_aux_seg_loss_runs():
    model = AuxNet(obs_size=2, image_hw=32, seg_classes=8, dtype=jnp.float32)
    x = (jnp.zeros((2, 32, 32, 2)), jnp.zeros((2, 3)))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = jnp.zeros((2, 2), jnp.int32)
    seg_y = jnp.zeros((2, 32, 32), jnp.int32)
    loss, metrics = aux_seg_loss_fn(0.1, 0.1, 1.0, 0.5)(
        params, model.apply, (x, y, seg_y))
    assert jnp.isfinite(loss)
    for k in ("seg_loss", "seg_miou", "accuracy", "autopilot_action_loss"):
        assert k in metrics


def test_record_semantic_stream():
    """record_semantic adds a (T,B,H,W) class-id plane; the env-major stream
    aligns with the store and contains real scene classes (road/terrain)."""
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl

    town = make_town(blocks=2, n_buildings=6, n_lights=4)
    params = SimParams(n_agents=2, n_pedestrians=0)
    rcfg = RenderConfig(height=32, width=32, backend="jax")
    store, _, traj = cl.collect_dataset(params, town, rcfg,
                                        jax.random.PRNGKey(0), 2, 12,
                                        record_semantic=True)
    sem = cl.semantic_stream(traj)
    assert sem.shape == (len(store), 32, 32)
    assert sem.dtype == np.uint8
    classes = np.unique(sem)
    assert classes.max() <= 7
    assert len(classes) >= 3  # sky + terrain + road at minimum


def test_cli_bc_aux_seg_end_to_end(tmp_path, capsys):
    from carla_imitation_learning_tpu.cli import main as cli_main
    from tests.test_cli import _overrides

    ov = _overrides(tmp_path, extra=[
        "aux_seg_weight=0.5", "n_envs=4", "n_steps=40",
        "eval_envs=4", "eval_steps=8", "BATCH_SIZE=8",
    ])
    assert cli_main(["run", "bc_aux", "--json"] + ov) == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["history"][-1]["train_seg_miou"] > 0
    assert result["seg_miou_test"] is not None and result["seg_miou_test"] > 0
    assert "driving_score" in result["eval"]


def test_speed_dropout_zeroes_speed_columns():
    """speed_dropout=1.0 zeroes (speed_long, speed) in every sensor row,
    keeps current_steer, and leaves frames/labels untouched — the inertia-
    shortcut countermeasure (parked-policy bug, reports/seg_ab.json r4)."""
    from carla_imitation_learning_tpu.data.pipeline import (
        AuxSegDataset, DeviceDataset, FrameStore,
    )

    store = FrameStore(
        frames=np.zeros((40, 16, 16), np.uint8),
        actions=np.zeros(40, np.int32),
        traffic=np.zeros(40, np.int32),
        sensors=np.random.default_rng(0).uniform(
            0.5, 8.0, (40, 3)).astype(np.float32),
    )
    sem = np.zeros((40, 16, 16), np.uint8)
    base = DeviceDataset(store, batch_size=8, frame_skip=2, aux=True)
    full = AuxSegDataset(base, sem, speed_dropout=1.0)
    (frames, sensor), y, seg = next(iter(full))
    assert float(jnp.abs(sensor[:, 1:]).max()) == 0.0
    none = AuxSegDataset(base, sem, speed_dropout=0.0)
    (_, sensor0), _, _ = next(iter(none))
    # steer column identical, speed columns nonzero without dropout
    np.testing.assert_allclose(np.asarray(sensor[:, 0]),
                               np.asarray(sensor0[:, 0]))
    assert float(jnp.abs(sensor0[:, 1:]).max()) > 0.0
