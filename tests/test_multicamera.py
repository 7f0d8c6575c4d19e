"""Multi-camera rig: per-view rendering + VAE-contract collection."""

import numpy as np

import jax

from carla_imitation_learning_tpu.render import RenderConfig, make_renderer
from carla_imitation_learning_tpu.render.camera import CAMERA_PRESETS
from carla_imitation_learning_tpu.sim import SimParams, make_town, reset_env
from carla_imitation_learning_tpu.training.closed_loop import collect_multicamera

TOWN = make_town(blocks=2, n_buildings=8, n_lights=4)
PARAMS = SimParams(n_agents=4)
RCFG = RenderConfig(32, 32, max_triangles=256, backend="jax")


def test_presets_cover_reference_cameras():
    # reference camera names: configs/model/vae.yaml:4 + train.py:97,:135
    for name in ("camera", "semantic", "camera_sFOV", "FL", "FR", "RR", "SL", "SR"):
        assert name in CAMERA_PRESETS


def test_views_differ_by_camera(rng):
    state = reset_env(PARAMS, TOWN, jax.random.PRNGKey(2))
    grays = {}
    for cam in ("camera", "SL", "RR"):
        out = make_renderer(PARAMS, TOWN, RCFG, camera=cam)(state)
        grays[cam] = np.asarray(out["gray"])
    assert not np.allclose(grays["camera"], grays["SL"])
    assert not np.allclose(grays["camera"], grays["RR"])
    # narrow FOV zooms: its view differs from the default-FOV forward view
    out_s = make_renderer(PARAMS, TOWN, RCFG, camera="camera_sFOV")(state)
    assert not np.allclose(grays["camera"], np.asarray(out_s["gray"]))


def test_collect_multicamera_contract(tmp_path):
    frames, state_log, starts = collect_multicamera(
        PARAMS, TOWN, RCFG, jax.random.PRNGKey(0),
        cameras=("camera", "SL"), n_envs=2, n_steps=10)
    assert set(frames) == {"camera", "SL"}
    assert frames["camera"].shape == (20, 32, 32)
    assert frames["camera"].dtype == np.uint8
    assert len(state_log) == 20
    assert not np.array_equal(frames["camera"], frames["SL"])
    # env-stream boundaries marked (frame 0 of each of the 2 env streams)
    assert starts.shape == (20,) and starts[0] and starts[10]


def test_multicamera_feeds_vae_pipeline(tmp_path):
    """End-to-end: collect rig data → write the raw-log contract → the VAE
    iterator consumes the SL camera directly."""
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import collect_multicamera_data
    from carla_imitation_learning_tpu.data import vae_data

    cfg = compose("config", overrides=[
        "sim.n_agents=3", "sim.town.blocks=2", "sim.town.n_buildings=6",
        "sim.n_lights=4", "render.height=32", "render.width=32",
        "render.max_triangles=256", "render.backend=jax",
        "BATCH_SIZE=4", "image_size=[1,32,32]",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ])
    r = collect_multicamera_data(cfg, n_envs=2, n_steps=8,
                                 cameras=("SL",), log_name="SimLog1")
    assert r["frames_per_camera"] == 16
    cfg2 = cfg.copy()
    cfg2["camera"] = "SL"
    cfg2["train_logs"] = ["SimLog1"]
    loaders = vae_data.train_val_test_iterator(cfg2, "pooled_data")
    x = next(iter(loaders["train_dataloader"]))
    assert x.shape[1:] == (32, 32, 1)
    # the packed framestore tier was written alongside the PNGs and the VAE
    # loader reads it byte-identically to the per-file layout
    if r["framestores"]:
        from pathlib import Path

        from carla_imitation_learning_tpu.data.vae_data import _load_frames

        packed = Path(r["framestores"]["SL"])
        assert packed.exists()
        via_store = _load_frames(cfg2, ["SimLog1"], "SL")
        png_dir = packed.parent / "SL"
        packed.rename(packed.with_suffix(".bak"))  # force the PNG path
        via_png = _load_frames(cfg2, ["SimLog1"], "SL")
        packed.with_suffix(".bak").rename(packed)
        assert png_dir.is_dir()
        np.testing.assert_array_equal(via_store, via_png)


def test_collect_multicamera_packed_only(tmp_path):
    """write_png=False: fleet-scale collection writes only the memcpy-speed
    packed tier (~100x the PNG loop on this host, measured) and the VAE
    pipeline still trains from it."""
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.data import vae_data
    from carla_imitation_learning_tpu.experiments import collect_multicamera_data

    cfg = compose("config", overrides=[
        "sim.n_agents=3", "sim.town.blocks=2", "sim.town.n_buildings=6",
        "sim.n_lights=4", "render.height=32", "render.width=32",
        "render.max_triangles=256", "render.backend=jax",
        "BATCH_SIZE=4", "image_size=[1,32,32]",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ])
    r = collect_multicamera_data(cfg, n_envs=2, n_steps=8, write_png=False,
                                 cameras=("FL",), log_name="SimLog2")
    from pathlib import Path

    assert not (Path(r["log"]) / "FL").exists()  # no PNG folder
    assert Path(r["framestores"]["FL"]).exists()
    cfg2 = cfg.copy()
    cfg2["camera"] = "FL"
    cfg2["train_logs"] = ["SimLog2"]
    loaders = vae_data.train_val_test_iterator(cfg2, "pooled_data")
    x = next(iter(loaders["train_dataloader"]))
    assert x.shape[1:] == (32, 32, 1)
