"""Surround view: multi-camera observations for closed-loop policies.

The load-bearing invariant: DeviceDataset(extra_frames=...) windows and the
rollout framebuf (closed_loop.update_framebuf with (B,H,W,K) views) must
produce the SAME channel layout — time-major, camera-minor (index t·K + c).
Both sides are checked against one shared numpy construction."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.data.pipeline import (
    DeviceDataset, FrameStore, gather_windows,
)
from carla_imitation_learning_tpu.training.closed_loop import update_framebuf

FS, K, B, HW = 4, 3, 2, 8


def _interleave(per_cam_frames, t_last):
    """Reference layout: numpy (K, T, H, W) → (H, W, FS·K) window ending at
    t_last, channel index t·K + c."""
    chans = []
    for t in range(t_last - FS + 1, t_last + 1):
        for c in range(K):
            chans.append(per_cam_frames[c][t])
    return np.stack(chans, axis=-1)


def test_update_framebuf_multicam_layout():
    rng = np.random.default_rng(0)
    T = 7
    seq = rng.integers(0, 256, (K, T, HW, HW), dtype=np.uint8)
    views = jnp.asarray(np.transpose(seq, (1, 2, 3, 0)))  # (T, H, W, K)
    views = views[:, None]  # (T, B=1, H, W, K)
    buf = jnp.tile(views[0], (1, 1, 1, FS))
    no_reset = jnp.zeros((1,), bool)
    for t in range(1, T):
        buf = update_framebuf(buf, views[t], no_reset)
    want = _interleave(seq, T - 1)
    np.testing.assert_array_equal(np.asarray(buf[0]), want)


def test_update_framebuf_multicam_reset_refill():
    rng = np.random.default_rng(1)
    buf = jnp.asarray(rng.integers(0, 256, (B, HW, HW, FS * K), np.uint8))
    new = jnp.asarray(rng.integers(0, 256, (B, HW, HW, K), np.uint8))
    out = update_framebuf(buf, new, jnp.asarray([True, False]))
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.asarray(jnp.tile(new[0], (1, 1, FS))))
    np.testing.assert_array_equal(
        np.asarray(out[1]),
        np.concatenate([np.asarray(buf[1, ..., K:]), np.asarray(new[1])], -1))


def test_update_framebuf_single_cam_unchanged():
    """K=1 must reproduce the historical single-view semantics bit-exactly."""
    rng = np.random.default_rng(2)
    buf = jnp.asarray(rng.integers(0, 256, (B, HW, HW, FS), np.uint8))
    gray = jnp.asarray(rng.integers(0, 256, (B, HW, HW), np.uint8))
    reset = jnp.asarray([True, False])
    out = update_framebuf(buf, gray, reset)
    legacy = jnp.where(reset[:, None, None, None],
                       jnp.repeat(gray[..., None], FS, axis=-1),
                       jnp.concatenate([buf[..., 1:], gray[..., None]], -1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(legacy))


def test_dataset_extra_frames_layout():
    """Offline windows interleave exactly like the rollout framebuf."""
    rng = np.random.default_rng(3)
    N = 24
    seq = rng.integers(0, 256, (K, N, HW, HW), dtype=np.uint8)
    store = FrameStore.synthetic(n=N, height=HW, width=HW, seed=0)
    store = FrameStore(frames=seq[0], actions=store.actions,
                       traffic=store.traffic, sensors=store.sensors)
    ds = DeviceDataset(store, batch_size=2, frame_skip=FS,
                       extra_frames=[seq[1], seq[2]], dtype="float32")
    x, y = ds.make_batch(np.asarray([0, 5]))
    assert x.shape == (2, HW, HW, FS * K)
    for b, start in enumerate((0, 5)):
        want = _interleave(seq, start + FS - 1).astype(np.float32) / 255.0
        np.testing.assert_allclose(np.asarray(x[b]), want, atol=1e-7)


def test_extra_frames_shape_mismatch_raises():
    store = FrameStore.synthetic(n=16, height=HW, width=HW, seed=0)
    bad = np.zeros((16, HW, HW + 1), np.uint8)
    with pytest.raises(ValueError, match="extra_frames"):
        DeviceDataset(store, batch_size=2, frame_skip=FS, extra_frames=[bad])


def test_gather_windows_single_cam_unchanged():
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.integers(0, 256, (12, HW, HW), np.uint8))
    idx = jnp.asarray([0, 3])
    got = gather_windows(frames, idx, FS, "float32")
    assert got.shape == (2, HW, HW, FS)


def test_policy_bits_surround_all_families():
    """Every policy family consumes the surround rig: obs channels widen to
    frame_skip × n_views (BASELINE config #2's multi-camera CIL included)."""
    from carla_imitation_learning_tpu.experiments import _policy_bits

    for family in ("discrete", "cil", "continuous"):
        cfg = {"surround_cameras": ["camera", "FL"], "policy_family": family,
               "frame_skip": 4}
        _, _, model, _ = _policy_bits(cfg, None, 32, 32)
        assert model.obs_size == 8, (family, model.obs_size)


def test_surround_unknown_camera_preset_raises():
    """Typo'd rig names must fail loudly — make_renderer would otherwise
    silently fall back to K identical forward views."""
    from carla_imitation_learning_tpu.experiments import _surround_cams

    with pytest.raises(ValueError, match="fl"):
        _surround_cams({"surround_cameras": ["camera", "fl", "FR"]})


@pytest.mark.slow
def test_cli_bc_surround_end_to_end(tmp_path, capsys):
    """Collect rig → train surround policy → drive the closed loop with the
    same rig, all through the CLI."""
    from carla_imitation_learning_tpu.cli import main as cli_main
    from tests.test_cli import _overrides

    ov = _overrides(tmp_path, extra=[
        "surround_cameras=['camera','FL','FR']",
        "n_envs=4", "n_steps=40", "eval_envs=4", "eval_steps=8",
    ])
    assert cli_main(["run", "bc_surround", "--json"] + ov) == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["cameras"] == ["camera", "FL", "FR"]
    # tiny vals can be single-class (expert cruises) → CE underflows to 0;
    # train covers all four env streams and stays informative
    assert result["history"][-1]["train_loss"] > 0
    assert result["history"][-1]["val_loss"] >= 0
    assert "driving_score" in result["eval"]
