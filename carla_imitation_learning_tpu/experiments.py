"""Named experiments — the framework's replacement for the reference's
skip_run-gated blocks in train.py (SURVEY.md L6). Each experiment is a
function(cfg, **kw) -> result dict; the CLI dispatches by name.

Parity map (reference train.py block → experiment):
  split_image_folder (:19)                  → split_folders
  pooled_data_vae (:31)                     → vae_pooled
  leave_one_out_data_vae (:61)              → vae_leave_one_out
  behavior_cloning (:93)                    → bc
  aux (:131)                                → bc_aux
  test (:167)                               → test_eval
  behavior_cloning_with_raw_segmented (:205)→ bc_raw_segment
New capabilities (BASELINE.json configs #2, #4, #5):
  bc_cil, collect_data, closed_loop_eval, dagger, hpo
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.callbacks import (
    SaveBestMetricScores, SaveConfusionMatrix, SaveMetricsHeatmap,
)
from carla_imitation_learning_tpu.data import frame_log as fl
from carla_imitation_learning_tpu.data import pipeline as pipe
from carla_imitation_learning_tpu.data import stats as stats_lib
from carla_imitation_learning_tpu.data import vae_data
from carla_imitation_learning_tpu.models import (
    AuxNet, BranchedCILPolicy, ConvVAE, DualStreamCNN, PolicyCNN,
)
from carla_imitation_learning_tpu.render.pipeline import RenderConfig
from carla_imitation_learning_tpu.sim.town import make_town_from_cfg
from carla_imitation_learning_tpu.sim.world import SimParams
from carla_imitation_learning_tpu.training import (
    Trainer, aux_loss_fn, bc_loss_fn, cil_loss_fn, create_train_state,
    dual_stream_loss_fn, make_optimizer, vae_loss_fn,
)
from carla_imitation_learning_tpu.training import closed_loop as cl
from carla_imitation_learning_tpu.utils.checkpoint import BestKCheckpointManager
from carla_imitation_learning_tpu.utils.logging import MetricLogger

EXPERIMENTS = {}


def experiment(name):
    """Register an experiment. The wrapper lifts every keyword default onto
    the config: a TOP-LEVEL cfg key with the same name as a kwarg overrides
    the python default (explicit call-site kwargs still win), so presets
    (configs/experiment/*.yaml) and ``-o n_envs=64`` CLI overrides reach every
    knob — the reference's experiment-override scheme
    (configs/experiment/exp_example_*.yaml), minus the source editing."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)
        knobs = [p for p in sig.parameters.values()
                 if p.default is not inspect.Parameter.empty
                 and p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)]

        @functools.wraps(fn)
        def wrapper(cfg, *args, **kwargs):
            for p in knobs:
                if p.name in kwargs:
                    continue
                v = cfg.get(p.name) if hasattr(cfg, "get") else None
                if v is None:
                    continue
                d = p.default
                if isinstance(d, bool):
                    v = bool(v)
                elif isinstance(d, int):
                    v = int(v)
                elif isinstance(d, float):
                    v = float(v)
                elif isinstance(d, tuple):
                    v = tuple(v) if isinstance(v, (list, tuple)) else (v,)
                kwargs[p.name] = v
            return fn(cfg, *args, **kwargs)

        EXPERIMENTS[name] = wrapper
        return wrapper

    return deco


def _dtype(cfg):
    return jnp.bfloat16 if str(cfg.get("compute_dtype", "bfloat16")) == "bfloat16" \
        else jnp.float32


def _flag(cfg, key: str, default: bool = False) -> bool:
    """Bool config flag that understands CLI overrides: ``-o key=false`` /
    ``no``/``off``/``0`` parse as False (``_parse_value`` only literal-evals
    Python spellings, so lowercase yaml-style booleans arrive as strings —
    ``bool("false")`` would be True)."""
    v = cfg.get(key, default)
    if isinstance(v, str):
        return v.strip().lower() not in ("0", "false", "no", "off", "")
    return bool(v)


def _trainer_bits(cfg, name: str):
    log_dir = Path(cfg["log_dir"])
    logger = MetricLogger(log_dir, name)
    ck = cfg.get_dotted("trainer.checkpoint", {})
    ckpt = BestKCheckpointManager(
        log_dir / name / "ckpt", monitor=ck.get("monitor", "val_loss"),
        mode=ck.get("mode", "min"), save_top_k=int(ck.get("save_top_k", 1)),
        save_last=bool(ck.get("save_last", False)), filename=name)
    callbacks = [SaveBestMetricScores()]
    n_actions = int(cfg.get("n_actions", 9))
    callbacks += [SaveMetricsHeatmap(n_actions, out_dir=str(log_dir / name)),
                  SaveConfusionMatrix(n_actions, out_dir=str(log_dir / name))]
    trainer = Trainer(cfg, logger=logger, callbacks=callbacks,
                      checkpoint_manager=ckpt, name=name)
    return trainer, ckpt


def _mesh_bits(cfg, batch_size: int | None = None):
    """(mesh, batch_sharding) for data-parallel experiments — the uniform
    treatment the reference gives every block via `gpus=` (train.py:57-237).
    Returns (None, None) on single-chip runs."""
    from carla_imitation_learning_tpu.parallel.mesh import batch_sharding, maybe_mesh

    mesh = maybe_mesh(cfg, batch_size=batch_size or int(cfg.get("BATCH_SIZE", 64)))
    return mesh, (batch_sharding(mesh) if mesh is not None else None)


def _fit(cfg, name, model, example, loss_fn, loaders, mesh=None):
    """Shared fit plumbing: smoke forward → optimizer → Trainer.fit
    (mirrors each reference block's net→loaders→Lightning shape,
    train.py:119-129). With a mesh, params are replicated and batches arrive
    sharded on 'data' (loaders carry the sharding), so the jit'd step runs
    data-parallel with XLA-inserted gradient psum."""
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    spe = max(1, len(loaders["train_dataloader"]))
    tx = make_optimizer(cfg, steps_per_epoch=spe)
    state = create_train_state(model, rng, example, tx,
                               ema_decay=float(cfg.get("EMA_DECAY", 0.0)))
    resume = cfg.get("resume_checkpoint")
    if resume:
        from carla_imitation_learning_tpu.utils.checkpoint import restore_pytree

        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        restored = restore_pytree(resume, template)
        state = state.replace(**restored)
    if mesh is not None:
        from carla_imitation_learning_tpu.parallel.mesh import shard_train_state

        state = shard_train_state(mesh, state)
    trainer, ckpt = _trainer_bits(cfg, name)
    result = trainer.fit(state, loss_fn, loaders, rng,
                         max_epochs=int(cfg.get("NUM_EPOCHS",
                                                cfg.get_dotted("trainer.max_epochs", 1))))
    test_metrics = trainer.test(result.state, loss_fn, loaders) \
        if loaders.get("test_dataloader") else {}
    return {
        "history": result.history, "throughput": result.throughput,
        "best_metric": result.best_metric, "best_path": result.best_path,
        "test": test_metrics, "state": result.state,
    }


def _maybe_synthesize(cfg, camera: str = "camera"):
    """If the data contract is absent under data_dir, synthesize a raw log +
    sequential split so every experiment runs hermetically."""
    data_dir = Path(cfg["data_dir"])
    log = cfg["train_logs"][0]
    if (data_dir / "processed" / log).exists():
        return
    n = int(cfg.get("synthetic_frames", 120))
    h = int(cfg.get("image_height", 256))
    fl.write_synthetic_log(data_dir, log=log, cameras=(camera, "semantic"),
                           n_frames=n, height=h, width=int(cfg.get("image_width", h)),
                           seed=int(cfg.get("data_seed", 1337)))
    fl.split_frames(data_dir / "raw" / log, data_dir / "processed" / log,
                    ratio=(0.8, 0.1, 0.1), shuffle=False)


@experiment("split_folders")
def split_folders(cfg, **kw):
    """Reference train.py:19-29 (splitfolders.ratio 80/10/10, sequential)."""
    data_dir = Path(cfg["data_dir"])
    log = cfg["train_logs"][0]
    counts = fl.split_frames(data_dir / "raw" / log, data_dir / "processed" / log,
                             ratio=(0.8, 0.1, 0.1), shuffle=False,
                             seed=int(cfg.get("data_seed", 1337)))
    return {"counts": counts}


@experiment("bc")
def behavior_cloning(cfg, cameras=("camera", "semantic"), **kw):
    """Reference train.py:93-129: ConvNet1 BC per camera type."""
    cameras = tuple(cfg.get("bc_cameras", cameras))  # CLI: -o bc_cameras=['camera']
    mesh, sharding = _mesh_bits(cfg)
    results = {}
    for camera in cameras:
        cfg_c = cfg.copy()
        cfg_c["camera"] = camera
        _maybe_synthesize(cfg_c, camera)
        loaders = pipe.sequential_train_val_test_iterator(cfg_c, sharding=sharding)
        model = _discrete_policy_model(cfg, int(cfg["obs_size"]))
        example = model.example_input(1, int(cfg.get("image_height", 256)),
                                      int(cfg.get("image_width", 256)))
        loss = bc_loss_fn
        if bool(cfg.get("augment", False)):  # BASELINE config #3
            from carla_imitation_learning_tpu.training.losses import (
                bc_augmented_loss_fn,
            )

            loss = bc_augmented_loss_fn()
        results[camera] = _fit(cfg_c, f"imitation_{camera}", model, example,
                               loss, loaders, mesh=mesh)
    return results


@experiment("bc_aux")
def behavior_cloning_aux(cfg, cameras=("camera",), **kw):
    """Reference train.py:131-165: AuxNet multi-task (recon+traffic+action).

    ``-o aux_seg_weight=0.5`` switches to BASELINE config #3's multi-task BC
    with the auxiliary SEMANTIC-SEGMENTATION decoder: data comes from sim
    collection (the renderer's per-pixel class plane is the ground truth —
    record_semantic), the AuxNet gains a per-pixel head, training reports
    seg mIoU, and the result carries a closed-loop driving eval so seg
    supervision can be A/B'd against plain BC (benchmarks/seg_ab.py)."""
    if float(cfg.get("aux_seg_weight", 0.0)) > 0.0:
        return _bc_aux_seg(cfg, **kw)
    mesh, sharding = _mesh_bits(cfg)
    results = {}
    for camera in cameras:
        cfg_c = cfg.copy()
        cfg_c["camera"] = camera
        _maybe_synthesize(cfg_c, camera)
        loaders = pipe.sequential_aux_train_val_test_iterator(cfg_c,
                                                              sharding=sharding)
        model = AuxNet(obs_size=int(cfg["obs_size"]),
                       n_actions=int(cfg["n_actions"]),
                       n_traffic_classes=int(cfg.get("n_traffic_classes", 2)),
                       image_hw=int(cfg.get("image_height", 256)), dtype=_dtype(cfg))
        loss = aux_loss_fn(float(cfg.get("aux_recon_weight", 0.0)),
                           float(cfg.get("aux_traffic_weight", 0.0)),
                           float(cfg.get("aux_action_weight", 1.0)))
        results[camera] = _fit(cfg_c, f"imitation_aux_{camera}", model,
                               (model.example_input(1),), loss, loaders,
                               mesh=mesh)
    return results


def _bc_aux_seg(cfg, n_envs: int = 16, n_steps: int = 300,
                eval_envs: int = 32, eval_steps: int = 200, **kw):
    """BASELINE config #3: multi-task BC with an auxiliary semantic-
    segmentation decoder, supervised for free by the renderer's per-pixel
    class plane (render/geometry.py SEM_*, 8 classes). Sim-collection path:
    expert rollouts record (gray frames, sensors, labels, semantic ids) in
    one scan; the AuxNet trains recon+traffic+action+seg and the result
    carries seg mIoU plus a closed-loop driving eval of the action head."""
    from carla_imitation_learning_tpu.training.losses import aux_seg_loss_fn

    town, params, rcfg = _sim_bits(cfg)
    if rcfg.height != rcfg.width:
        raise ValueError("aux_seg needs a square camera (AuxNet decoders "
                         f"upsample to image_hw); got {rcfg.height}x{rcfg.width}")
    fs = int(cfg.get("frame_skip", 4))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    rng, kc = jax.random.split(rng)
    store, _, traj = cl.collect_dataset(params, town, rcfg, kc, n_envs,
                                        n_steps, frame_skip=fs,
                                        noise=_noise_bits(cfg),
                                        record_semantic=True)
    sem = cl.semantic_stream(traj)
    n = len(store)
    bounds = {"train": (0, int(0.8 * n)), "val": (int(0.8 * n), int(0.9 * n)),
              "test": (int(0.9 * n), n)}
    mesh, sharding = _mesh_bits(cfg)
    loaders = {f"{k}_dataloader": pipe.AuxSegDataset(pipe.DeviceDataset(
        store.slice(a, b), int(cfg.get("BATCH_SIZE", 64)), frame_skip=fs,
        shuffle=(k == "train"), aux=True, drop_last=(k == "train"),
        sharding=(sharding if k == "train" else None)), sem[a:b],
        speed_dropout=(float(cfg.get("aux_speed_dropout", 0.3))
                       if k == "train" else 0.0))
        for k, (a, b) in bounds.items()}
    seg_classes = int(cfg.get("seg_classes", 8))
    model = AuxNet(obs_size=fs, image_hw=rcfg.height,
                   seg_classes=seg_classes, dtype=_dtype(cfg))
    loss = aux_seg_loss_fn(float(cfg.get("aux_recon_weight", 0.0)),
                           float(cfg.get("aux_traffic_weight", 0.0)),
                           float(cfg.get("aux_action_weight", 1.0)),
                           float(cfg.get("aux_seg_weight", 0.5)))
    result = _fit(cfg, "bc_aux_seg", model, (model.example_input(1),), loss,
                  loaders, mesh=mesh)
    state = result.pop("state")
    p = state.ema_params if getattr(state, "ema_params", None) is not None \
        else state.params
    rng, ke = jax.random.split(rng)
    result["eval"] = cl.evaluate_policy(
        params, town, rcfg, model.as_policy_fn(p), ke,
        n_envs=eval_envs, n_steps=eval_steps, frame_skip=fs)
    result["seg_miou_test"] = result["test"].get("test_seg_miou")
    return result


@experiment("bc_raw_segment")
def behavior_cloning_raw_segment(cfg, **kw):
    """Reference train.py:205-239: shared-trunk dual-stream (raw + semantic)."""
    cfg_c = cfg.copy()
    _maybe_synthesize(cfg_c, "camera")
    mesh, sharding = _mesh_bits(cfg)
    loaders = pipe.paired_sequential_iterator(cfg_c, sharding=sharding)
    model = DualStreamCNN(obs_size=int(cfg["obs_size"]),
                          n_actions=int(cfg["n_actions"]), dtype=_dtype(cfg))
    return _fit(cfg_c, "imitation_raw_segment", model, model.example_input(1),
                dual_stream_loss_fn, loaders, mesh=mesh)


@experiment("vae_pooled")
def vae_pooled(cfg, **kw):
    """Reference train.py:31-59: pooled-data conv VAE."""
    cfg_c = cfg.copy()
    cfg_c["camera"] = kw.get("camera", "SL")
    cfg_c["train_logs"] = cfg["logs"]
    _maybe_synthesize_vae(cfg_c)
    mesh, sharding = _mesh_bits(cfg_c)
    loaders = vae_data.train_val_test_iterator(cfg_c, "pooled_data",
                                               sharding=sharding)
    return _fit_vae(cfg_c, "vae_pooled", loaders, mesh=mesh)


@experiment("vae_leave_one_out")
def vae_leave_one_out(cfg, **kw):
    """Reference train.py:61-91."""
    cfg_c = cfg.copy()
    cfg_c["camera"] = kw.get("camera", "SL")
    cfg_c["train_logs"] = cfg["logs"][:-1]
    cfg_c["test_logs"] = cfg["logs"][-1:]
    _maybe_synthesize_vae(cfg_c)
    mesh, sharding = _mesh_bits(cfg_c)
    loaders = vae_data.train_val_test_iterator(cfg_c, "leave_one_out_data",
                                               sharding=sharding)
    return _fit_vae(cfg_c, "vae_leave_one_out", loaders, mesh=mesh)


def _maybe_synthesize_vae(cfg):
    data_dir = Path(cfg["data_dir"])
    cam = cfg["camera"] if isinstance(cfg["camera"], str) else cfg["camera"][0]
    h = int(cfg["image_size"][1])
    for log in cfg["train_logs"] + cfg.get("test_logs", []):
        if not (data_dir / "raw" / log / f"{cam}_resized_{h}_bw").is_dir() and \
           not (data_dir / "raw" / log / cam).is_dir():
            fl.write_synthetic_log(data_dir, log=log, cameras=(cam,),
                                   n_frames=int(cfg.get("synthetic_frames", 60)),
                                   height=h, width=int(cfg["image_size"][2]),
                                   seed=hash(log) % (2**31))


def _fit_vae(cfg, name, loaders, mesh=None):
    h, w = int(cfg["image_size"][1]), int(cfg["image_size"][2])
    model = ConvVAE(channels=int(cfg["image_size"][0]), height=h, width=w,
                    z_size=int(cfg.get("z_size", 32)), dtype=_dtype(cfg))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    loss = vae_loss_fn(float(cfg["alpha"]), float(cfg["beta"]))
    return _fit(cfg, name, model, (model.example_input(1), rng), loss, loaders,
                mesh=mesh)


@experiment("test_eval")
def test_eval(cfg, checkpoint: str | None = None, **kw):
    """Reference train.py:167-203: restore a checkpoint, offline accuracy +
    predWlabels dump (imitation.py:161-203)."""
    cfg_c = cfg.copy()
    cfg_c["camera"] = kw.get("camera", "camera")
    _maybe_synthesize(cfg_c, cfg_c["camera"])
    loaders = pipe.sequential_train_val_test_iterator(cfg_c)
    model = _discrete_policy_model(cfg, int(cfg["obs_size"]))
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(
        model, rng, model.example_input(1, int(cfg.get("image_height", 256)),
                                        int(cfg.get("image_width", 256))), tx)
    if checkpoint:
        from carla_imitation_learning_tpu.utils.checkpoint import restore_pytree

        restored = restore_pytree(checkpoint, {"params": state.params,
                                               "opt_state": state.opt_state,
                                               "step": state.step})
        state = state.replace(params=restored["params"])
    acc = {split: stats_lib.calculate_accuracy(state.apply_fn, state.params,
                                               loaders, f"{split}_dataloader")
           for split in ("train", "val", "test")}
    out = Path(cfg["log_dir"]) / "predWlabels.npy"
    stats_lib.save_predictions(state.apply_fn, state.params,
                               loaders["val_dataloader"], str(out))
    plot = stats_lib.sample_output_plot(
        state.apply_fn, state.params, loaders["val_dataloader"],
        str(Path(cfg["log_dir"]) / "sample_output.png"),
        n_classes=int(cfg.get("n_actions", 9)))
    return {"accuracy": acc, "predictions_file": str(out),
            "sample_output_plot": str(plot)}


def _sim_bits(cfg, backend: str | None = None):
    town = make_town_from_cfg(cfg, seed=int(cfg.get("data_seed", 0)))
    params = SimParams.from_cfg(cfg)
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform not in ("cpu",) else "jax"
    rcfg = RenderConfig.from_cfg(cfg, backend=backend)
    return town, params, rcfg


def _plan_goals(cfg, town, n_goals: int, n_envs: int):
    """Goal navigation setup shared by route_eval / bc_cil / collect_data:
    sample ``n_goals`` destinations (sim/planner.sample_goals, seeded by
    data_seed), bake shortest-path nav tables into the town, and assign envs
    round-robin goal ids. → (town_with_tables, goals (G,2), goal_ids (B,))."""
    from carla_imitation_learning_tpu.sim.planner import (
        plan_to_goals, sample_goals,
    )

    goals = sample_goals(town, int(cfg.get("data_seed", 0)), int(n_goals))
    town = plan_to_goals(town, goals)
    goal_ids = np.arange(int(n_envs), dtype=np.int32) % int(n_goals)
    return town, goals, goal_ids


def _force_turn_fans(cfg) -> None:
    """The route planner plans over the turn-fan graph — make sure the town
    about to be built (``_sim_bits``) carries the transfer table."""
    if not bool(cfg.get_dotted("sim.town.turn_fans", False)):
        cfg.set_dotted("sim.town.turn_fans", True)


def _noise_bits(cfg) -> "cl.NoiseConfig | None":
    """CIL-style collection noise from cfg (off unless noise_injection=true).
    noise_prob / noise_duration / noise_magnitude override the defaults."""
    if not bool(cfg.get("noise_injection", False)):
        return None
    return cl.NoiseConfig(
        prob=float(cfg.get("noise_prob", 0.005)),
        duration=int(cfg.get("noise_duration", 20)),
        magnitude=float(cfg.get("noise_magnitude", 0.6)),
        seed=int(cfg.get("seed", 0)))


@experiment("collect_data")
def collect_data(cfg, n_envs: int = 32, n_steps: int = 300, n_goals: int = 0,
                 **kw):
    """On-device expert data collection — the CARLA-server replacement: writes
    a raw log (frames + state.csv) in the reference's exact contract.
    ``-o noise_injection=true`` adds CIL-style recovery-state exploration
    (executed steering perturbed, supervision stays clean — cl.NoiseConfig).
    ``-o n_goals=N`` collects GOAL-DIRECTED runs via the route planner (the
    expert navigates to N sampled destinations; commands announce its turns)."""
    goal_ids = None
    if n_goals > 0:
        _force_turn_fans(cfg)
    town, params, rcfg = _sim_bits(cfg)
    if n_goals > 0:
        town, _, goal_ids = _plan_goals(cfg, town, n_goals, n_envs)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    store, state_log, _ = cl.collect_dataset(params, town, rcfg, rng,
                                             n_envs=n_envs, n_steps=n_steps,
                                             frame_skip=int(cfg.get("frame_skip", 4)),
                                             noise=_noise_bits(cfg),
                                             goal_ids=goal_ids)
    data_dir = Path(cfg["data_dir"])
    log = kw.get("log_name", "SimLog1")
    fl.save_frames(data_dir / "raw" / log / "camera", store.frames)
    fl.save_state_csv(data_dir / "raw" / log / "state.csv", state_log)
    fl.save_state_csv(data_dir / "raw" / "state.csv", state_log)
    # also write the packed native framestore (mmap zero-copy training tier)
    packed = None
    try:
        from carla_imitation_learning_tpu.native import save_framestore

        packed = str(data_dir / "raw" / log / "frames.tpuilfs")
        save_framestore(packed, store)
    except Exception:
        packed = None
    return {"frames": len(store), "log": str(data_dir / "raw" / log),
            "framestore": packed,
            "action_histogram": stats_lib.action_histogram(store.actions).tolist()}


@experiment("bc_streaming")
def bc_streaming(cfg, n_envs: int = 32, n_steps: int = 200, epochs: int = 2,
                 tier: str = "direct", **kw):
    """BC over the NATIVE streaming tier: data is collected on-device, written
    to a packed framestore file, then streamed for training — the path for
    datasets beyond HBM.

    ``tier="direct"`` (default): shard-resident FUSED streaming — each
    shard's raw frame block DMAs to the device once
    (native.DeviceShardStreamer.device_shards; no host window assembly,
    1/fs the H2D bytes) and the shard's whole epoch runs as ONE lax.scan
    dispatch (in-scan window gathers), so per-batch tunnel dispatch cost
    vanishes. ``tier="host"``: the C++ mmap reader with multi-threaded host
    window prefetch + per-batch steps (the round-2 path, kept for A/B and
    for hosts where device memory can't hold 2 shards)."""
    import functools as _ft

    from carla_imitation_learning_tpu.native import (
        DeviceShardStreamer, NativeFrameStore, PrefetchReader, save_framestore,
    )
    from carla_imitation_learning_tpu.training.steps import make_train_step

    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    store, _, _ = cl.collect_dataset(params, town, rcfg, rng, n_envs, n_steps)
    path = Path(cfg["log_dir"]) / "stream.tpuilfs"
    path.parent.mkdir(parents=True, exist_ok=True)
    save_framestore(path, store)

    batch = int(cfg.get("BATCH_SIZE", 64))
    fs = int(cfg.get("frame_skip", 4))
    model = _discrete_policy_model(cfg, fs)
    # build the reader FIRST: the LR schedule's milestones are in EPOCHS
    # (reference MultiStepLR semantics), so the optimizer needs the real
    # batches-per-epoch, not a placeholder
    if tier == "direct":
        streamer = DeviceShardStreamer(path, batch=batch, frame_skip=fs,
                                       shuffle=True, seed=int(cfg.get("seed", 0)))
        steps_per_epoch = max(1, len(streamer))
    else:
        nfs = NativeFrameStore(path)
        host_reader = PrefetchReader(nfs, batch=batch, frame_skip=fs,
                                     n_threads=4, shuffle=True,
                                     seed=int(cfg.get("seed", 0)))
        steps_per_epoch = max(1, len(host_reader))
    state = create_train_state(
        model, rng,
        jnp.zeros((1, rcfg.height, rcfg.width, 4)),
        make_optimizer(cfg, steps_per_epoch=steps_per_epoch))
    last = {}
    import time as _time

    n_images = 0
    if tier == "direct":

        @_ft.partial(jax.jit, static_argnames=("fs_",))
        def shard_fused(state, rng, frames, actions, orders, fs_):
            # whole-shard epoch in one dispatch: per-batch tunnel dispatch
            # (~20 ms each, measured) disappears into the scan
            def body(carry, idx):
                st, r = carry
                r, k = jax.random.split(r)
                b = (pipe.gather_windows(frames, idx, fs_, "float32"),
                     actions[idx + fs_])

                def wrapped(p):
                    return bc_loss_fn(p, st.apply_fn, b, k)

                (_, m), grads = jax.value_and_grad(
                    wrapped, has_aux=True)(st.params)
                return (st.apply_gradients(grads), r), m

            (state, rng), metrics = jax.lax.scan(body, (state, rng), orders)
            return state, rng, metrics

        t0 = _time.perf_counter()
        epoch_walls = []
        m = None
        for _ in range(epochs):
            te = _time.perf_counter()
            for frames, actions, widx in streamer.device_shards():
                nb = len(widx) // batch
                if nb == 0:
                    continue
                orders = jnp.asarray(
                    widx[:nb * batch].reshape(nb, batch), jnp.int32)
                state, rng, m = shard_fused(state, rng, frames, actions,
                                            orders, fs)
                n_images += nb * batch
            if m is None:
                raise ValueError(
                    f"bc_streaming: no shard holds a full batch of {batch} "
                    "windows — lower BATCH_SIZE or collect more frames")
            float(jnp.sum(m["loss"]))  # completion barrier per epoch
            epoch_walls.append(_time.perf_counter() - te)
        last = {k: v[-1] for k, v in m.items()}
        wall = _time.perf_counter() - t0
    else:
        step = make_train_step(bc_loss_fn, donate=False)
        t0 = _time.perf_counter()
        for _ in range(epochs):
            # device_prefetch keeps 2 batches in flight: the H2D copy of
            # batch i+1 rides under the train step of batch i
            for frames, labels in pipe.device_prefetch(host_reader):
                x = jnp.transpose(frames, (0, 2, 3, 1)).astype(jnp.float32) / 255.0
                rng, k = jax.random.split(rng)
                state, last = step(state, (x, labels), k)
                n_images += x.shape[0]
        jax.block_until_ready(last["loss"])
        wall = _time.perf_counter() - t0
        nfs.close()
        epoch_walls = []
    out = {"frames": len(store), "epochs": epochs, "tier": tier,
           "final_loss": float(last["loss"]),
           "final_accuracy": float(last["accuracy"]),
           "images_per_sec_streaming": n_images / wall,
           "framestore": str(path)}
    if len(epoch_walls) > 1:
        # steady state: the first epoch pays the one-time scan compile
        per_epoch = n_images / epochs
        out["images_per_sec_steady"] = per_epoch / (
            sum(epoch_walls[1:]) / (len(epoch_walls) - 1))
        out["first_epoch_seconds"] = epoch_walls[0]
    return out


def _control_space(cfg) -> str:
    """The closed-loop control contract implied by the configured policy
    family: ``policy_family=continuous`` → "continuous", else "discrete"."""
    return ("continuous"
            if str(cfg.get("policy_family", "discrete")) == "continuous"
            else "discrete")


def _discrete_policy_model(cfg, obs_size: int):
    """The discrete-family policy architecture. Cfg ``policy_arch`` picks
    ``cnn`` (default — the reference ConvNet1 shape, nets.py:6-39) or
    ``vit`` (models/vit.py — the MXU-native transformer alternative;
    ``vit_patch``/``vit_dim``/``vit_depth``/``vit_heads`` tune it). One
    builder shared by training (bc) and _policy_bits so a ``policy_arch``
    mismatch between fit and eval cannot happen silently — the checkpoint
    restore would fail loudly on the different pytree."""
    arch = str(cfg.get("policy_arch", "cnn"))
    if arch == "vit":
        from carla_imitation_learning_tpu.models import ViTPolicy

        return ViTPolicy(obs_size=obs_size,
                         n_actions=int(cfg.get("n_actions", 9)),
                         patch=int(cfg.get("vit_patch", 16)),
                         dim=int(cfg.get("vit_dim", 192)),
                         depth=int(cfg.get("vit_depth", 4)),
                         heads=int(cfg.get("vit_heads", 3)),
                         dtype=_dtype(cfg))
    if arch != "cnn":
        raise ValueError(f"unknown policy_arch {arch!r} (want 'cnn' or 'vit')")
    return PolicyCNN(obs_size=obs_size, n_actions=int(cfg.get("n_actions", 9)),
                     dtype=_dtype(cfg), s2d_stem=bool(cfg.get("s2d_stem", False)))


def _surround_cams(cfg) -> tuple:
    """The observation rig: cfg ``surround_cameras`` (a camera-preset name
    list whose FIRST entry is the driving view) or the single forward
    camera. More than one camera = surround view — the policy's obs channels
    become frame_skip × n_cameras (closed_loop.make_rollout).

    Names are validated against render.camera.CAMERA_PRESETS: make_renderer
    silently falls back to the forward pose for unknown names, so a typo'd
    rig ('fl' for 'FL') would train a "surround" policy on K identical
    forward views with no error."""
    cams = cfg.get("surround_cameras", None)
    if not cams:
        return ("camera",)
    from carla_imitation_learning_tpu.render.camera import CAMERA_PRESETS

    cams = tuple(str(c) for c in cams)
    unknown = [c for c in cams if c not in CAMERA_PRESETS]
    if unknown:
        raise ValueError(
            f"unknown camera preset(s) {unknown} in surround_cameras — "
            f"valid presets: {sorted(CAMERA_PRESETS)}")
    return cams


def _policy_bits(cfg, checkpoint: str | None, height: int, width: int):
    """Policy model + (optionally checkpoint-restored) params → policy_fn.
    Shared by every closed-loop eval/export entry point so the restore
    contract (incl. the s2d_stem variant and the policy family) stays in one
    place. ``policy_family=continuous`` builds ContinuousPolicyCNN and the
    policy_fn emits its (steer, accel) floats (pair with
    ``control_space="continuous"``); ``policy_family=cil`` builds
    BranchedCILPolicy and the policy_fn consumes the rollout's extras
    (speed + navigation command — with planner nav tables baked the command
    announces the route to the goal, so a CIL checkpoint NAVIGATES in
    route_eval); the default is the argmax PolicyCNN. CIL export ships as a
    multi-input servable (serving/export.export_cil_policy).
    Returns (policy_fn, rng, model, params)."""
    fs = int(cfg.get("frame_skip", 4))
    n_views = len(_surround_cams(cfg))
    family = str(cfg.get("policy_family", "discrete"))
    # every family consumes the surround rig the same way: obs channels are
    # frame_skip × n_views, time-major/camera-minor (update_framebuf layout)
    if family == "continuous":
        from carla_imitation_learning_tpu.models import ContinuousPolicyCNN

        model = ContinuousPolicyCNN(obs_size=fs * n_views, dtype=_dtype(cfg),
                                    s2d_stem=bool(cfg.get("s2d_stem", False)))
    elif family == "cil":
        model = BranchedCILPolicy(obs_size=fs * n_views,
                                  n_actions=int(cfg.get("n_actions", 9)),
                                  n_commands=int(cfg.get("n_commands", 6)),
                                  dtype=_dtype(cfg))
    else:
        model = _discrete_policy_model(cfg, fs * n_views)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    if family == "cil":
        mparams = model.init(rng, *model.example_input(1, height, width))["params"]
    else:
        mparams = model.init(
            rng, jnp.zeros((1, height, width, fs * n_views)))["params"]
    if checkpoint:
        # tolerant of both payload shapes: params-only exports AND the
        # full {params, opt_state, step} checkpoints _fit's best_path names
        from carla_imitation_learning_tpu.utils.checkpoint import restore_params

        mparams = restore_params(checkpoint, mparams)

    if family == "continuous":
        def policy_fn(obs):
            return model.apply({"params": mparams}, obs)
    elif family == "cil":
        policy_fn = model.as_policy_fn(mparams)
    else:
        def policy_fn(obs):
            return jnp.argmax(model.apply({"params": mparams}, obs), axis=-1)

    return policy_fn, rng, model, mparams


def _eval_policy_fn(cfg, checkpoint: str | None, artifact: str | None,
                    height: int, width: int):
    """(policy_fn, rng, control_space) for the eval experiments: a deployed
    StableHLO servable when ``artifact`` is given, else a
    (checkpoint-restored) live model via _policy_bits. One place so
    closed_loop_eval and scenario_eval score the exact same thing.

    Artifacts are SELF-DESCRIBING: their ``meta.family`` decides the control
    space (a continuous artifact emits float controls — treating them as
    argmax ints would silently garble the rollout), so ``policy_family`` in
    the cfg only matters for the checkpoint/live path."""
    if artifact:
        from carla_imitation_learning_tpu.serving import (
            load_policy, policy_fn_from_servable,
        )

        servable = load_policy(artifact)
        policy_fn = policy_fn_from_servable(servable)
        rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
        space = ("continuous" if servable.meta.get("family") == "continuous"
                 else "discrete")
        return policy_fn, rng, space
    policy_fn, rng, _, _ = _policy_bits(cfg, checkpoint, height, width)
    return policy_fn, rng, _control_space(cfg)


@experiment("closed_loop_eval")
def closed_loop_eval(cfg, checkpoint: str | None = None,
                     artifact: str | None = None, n_envs: int = 64,
                     n_steps: int = 200, **kw):
    """BASELINE config #4: policy-in-the-loop driving metrics.

    ``artifact=`` evaluates a DEPLOYED servable (serving/export.py StableHLO
    directory, possibly int8) instead of a checkpoint — the exported program
    composes under jit, so the exact artifact you ship drives the rollout.

    ``-o safety_shield=true`` arms the emergency-brake layer
    (training/shield.py) over the POLICY rollout (the expert ceiling stays
    unshielded); the metrics gain shield_interventions_per_km."""
    town, params, rcfg = _sim_bits(cfg)
    policy_fn, rng, space = _eval_policy_fn(cfg, checkpoint, artifact,
                                            rcfg.height, rcfg.width)
    mesh, _ = _mesh_bits(cfg, batch_size=n_envs)
    from carla_imitation_learning_tpu.training.shield import shield_from_cfg

    metrics = cl.evaluate_policy(params, town, rcfg, policy_fn, rng,
                                 n_envs=n_envs, n_steps=n_steps, mesh=mesh,
                                 control_space=space,
                                 shield=shield_from_cfg(cfg),
                                 cameras=_surround_cams(cfg))
    expert = cl.evaluate_policy(params, town, rcfg, None, rng,
                                n_envs=n_envs, n_steps=n_steps, mesh=mesh)
    return {"policy": metrics, "expert": expert}


# Named evaluation scenarios — minimal config deltas over the composed cfg,
# so user overrides (tiny test shapes, fleet sizes) survive. The CARLA
# leaderboard evaluates one agent across route+weather suites; this is the
# equivalent for the on-device world: same policy, varied conditions.
SCENARIOS: dict[str, dict] = {
    "clear": {},
    "fog": {"render.fog_density": 0.04},              # ~115 m visibility
    "storm": {"render.fog_density": 0.02, "render.rain": 0.8},
    "night": {"render.sun": 0.2},
    "night_rain": {"render.sun": 0.25, "render.rain": 0.6},
    "busy": {"sim.n_pedestrians": 12, "sim.n_agents": 24},
    "multilane": {"sim.town.lanes_per_direction": 2,
                  "sim.town.superblocks": True,
                  "sim.lane_change_period": 120, "sim.lane_change_window": 12},
    "turns": {"sim.town.lanes_per_direction": 2, "sim.town.superblocks": True,
              "sim.town.turn_fans": True, "sim.turn_period": 80,
              "sim.agent_turn_prob": 0.01},
}


@experiment("scenario_eval")
def scenario_eval(cfg, checkpoint: str | None = None,
                  artifact: str | None = None, n_envs: int = 64,
                  n_steps: int = 200, scenarios: str = "all", **kw):
    """Leaderboard-style scenario suite: ONE policy evaluated across named
    world/weather conditions (SCENARIOS), with the privileged expert's score
    under each condition as its ceiling. No reference equivalent — the
    reference never closes the loop at all; this mirrors how the CARLA
    leaderboard aggregates driving scores over route/weather suites.
    ``artifact=`` scores a deployed servable (see closed_loop_eval)."""
    names = (list(SCENARIOS) if scenarios in ("all", "", None)
             else [s.strip() for s in str(scenarios).split(",")])
    unknown = [n for n in names if n not in SCENARIOS]
    if unknown:
        raise ValueError(f"unknown scenarios {unknown}; have {list(SCENARIOS)}")
    policy_fn, rng, space = _eval_policy_fn(
        cfg, checkpoint, artifact,
        int(cfg.get_dotted("render.height", 128)),
        int(cfg.get_dotted("render.width", 128)))
    out, summary = {}, {}
    for name in names:
        scfg = cfg.copy()
        for k, v in SCENARIOS[name].items():
            scfg.set_dotted(k, v)
        ped = int(scfg.get_dotted("sim.n_pedestrians", 0))
        if ped:
            # walkers add 10 triangles each (configs/sim/town.yaml note)
            cur = int(scfg.get_dotted("render.max_triangles", 512))
            scfg.set_dotted("render.max_triangles", cur + 10 * ped)
        town, params, rcfg = _sim_bits(scfg)
        mesh, _ = _mesh_bits(scfg, batch_size=n_envs)
        pm = cl.evaluate_policy(params, town, rcfg, policy_fn, rng,
                                n_envs=n_envs, n_steps=n_steps, mesh=mesh,
                                control_space=space,
                                cameras=_surround_cams(scfg))
        em = cl.evaluate_policy(params, town, rcfg, None, rng,
                                n_envs=n_envs, n_steps=n_steps, mesh=mesh)
        out[name] = {"policy": pm, "expert": em}
        summary[name] = {"policy": pm["driving_score"],
                         "expert": em["driving_score"],
                         "policy_arc": pm["driving_score_arc"],
                         "expert_arc": em["driving_score_arc"]}
    return {"scenarios": out, "summary": summary,
            "mean_driving_score": float(np.mean(
                [summary[n]["policy"] for n in names])),
            "mean_driving_score_arc": float(np.mean(
                [summary[n]["policy_arc"] for n in names]))}


@experiment("dagger")
def dagger(cfg, rounds: int = 3, n_envs: int = 16, n_steps: int = 200,
           epochs_per_round: int = 3, n_goals: int = 0, **kw):
    """BASELINE config #5: DAgger — collect with expert, train, then iterate
    policy-driven collection with expert labels. ``policy_family=continuous``
    runs the whole loop in the continuous action space: the regressor drives
    collection, supervision is the expert's continuous controls
    (FrameStore.controls), and evals execute the floats.
    ``policy_family=cil`` runs it command-conditioned (BranchedCILPolicy);
    with ``n_goals > 0`` every round is GOAL-DIRECTED via the route planner —
    round 0 is the navigating expert, later rounds are the navigating POLICY
    with expert labels: on-policy A→B aggregation."""
    from carla_imitation_learning_tpu.training.steps import make_train_step

    goal_ids = None
    if n_goals > 0:
        _force_turn_fans(cfg)
    town, params, rcfg = _sim_bits(cfg)
    if n_goals > 0:
        town, _, goal_ids = _plan_goals(cfg, town, n_goals, n_envs)
    mesh, sharding = _mesh_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    pf = str(cfg.get("policy_family", "discrete"))
    family = _control_space(cfg)
    fs = int(cfg.get("frame_skip", 4))
    if family == "continuous":
        from carla_imitation_learning_tpu.models import ContinuousPolicyCNN
        from carla_imitation_learning_tpu.training import continuous_bc_loss_fn

        model = ContinuousPolicyCNN(obs_size=fs, dtype=_dtype(cfg))
        loss_fn = continuous_bc_loss_fn(float(cfg.get("steer_weight", 1.0)),
                                        float(cfg.get("accel_weight", 0.5)))
    elif pf == "cil":
        model = BranchedCILPolicy(obs_size=fs,
                                  n_actions=int(cfg.get("n_actions", 9)),
                                  n_commands=int(cfg.get("n_commands", 6)),
                                  dtype=_dtype(cfg))
        loss_fn = cil_loss_fn(float(cfg.get("speed_weight", 0.1)))
    else:
        model = _discrete_policy_model(cfg, fs)
        loss_fn = bc_loss_fn
    tx = make_optimizer(cfg, 1)
    example = (model.example_input(1, rcfg.height, rcfg.width) if pf == "cil"
               else jnp.zeros((1, rcfg.height, rcfg.width, fs)))
    state = create_train_state(model, rng, example, tx)
    if mesh is not None:
        from carla_imitation_learning_tpu.parallel.mesh import shard_train_state

        state = shard_train_state(mesh, state)
    step = make_train_step(loss_fn, donate=False)

    def _policy(p):
        if pf == "cil":
            return model.as_policy_fn(p)

        def policy_fn(obs):
            y = model.apply({"params": p}, obs)
            return y if family == "continuous" else jnp.argmax(y, axis=-1)
        return policy_fn

    stores = []
    history = []
    for rnd in range(rounds):
        rng, k = jax.random.split(rng)
        if rnd == 0:
            store, _, _ = cl.collect_dataset(params, town, rcfg, k, n_envs,
                                             n_steps, frame_skip=fs,
                                             noise=_noise_bits(cfg),
                                             goal_ids=goal_ids)
        else:
            store, _, _ = cl.dagger_iteration(params, town, rcfg,
                                              _policy(state.params), k,
                                              n_envs, n_steps, frame_skip=fs,
                                              control_space=family,
                                              goal_ids=goal_ids)
        stores.append(store)
        # concat marks round boundaries; per-round stores carry env-stream
        # and reset boundaries → no training window ever crosses any of them
        agg = pipe.FrameStore.concat(stores)
        ds = pipe.DeviceDataset(agg, int(cfg.get("BATCH_SIZE", 64)),
                                frame_skip=fs,
                                shuffle=True, seed=rnd, sharding=sharding,
                                cil=(pf == "cil"),
                                balanced=bool(cfg.get("balanced_sampling", False)),
                                continuous_labels=(agg.controls
                                                   if family == "continuous"
                                                   else None))
        last = {}
        for _ in range(epochs_per_round):
            for batch in ds:
                rng, sk = jax.random.split(rng)
                state, last = step(state, batch, sk)
        rng, ek = jax.random.split(rng)
        # the training mesh was validated against BATCH_SIZE — re-validate
        # against the eval fleet size (a 32-chip mesh divides batch 64 but
        # not 16 envs); falls back to unsharded eval when it doesn't divide
        eval_envs = min(n_envs, 32)
        eval_mesh, _ = _mesh_bits(cfg, batch_size=eval_envs) \
            if mesh is not None else (None, None)
        m = cl.evaluate_policy(params, town, rcfg, _policy(state.params), ek,
                               n_envs=eval_envs, n_steps=100, mesh=eval_mesh,
                               frame_skip=fs, control_space=family)
        m["round"] = rnd
        m["train_loss"] = float(last.get("loss", float("nan")))
        m["dataset_frames"] = len(agg)
        history.append(m)
    out = {"rounds": history}
    if n_goals > 0:
        # goal-directed runs: also score the final policy on the A→B task,
        # over the SAME env→goal assignment the rounds trained on
        rng, kr = jax.random.split(rng)
        out["routes"] = cl.evaluate_routes(
            params, town, rcfg, _policy(state.params), kr, n_envs=n_envs,
            n_steps=n_steps, frame_skip=fs, control_space=family,
            goal_ids=goal_ids)
    return out


@experiment("dagger_online")
def dagger_online(cfg, rounds: int = 3, n_envs: int = 16, n_steps: int = 200,
                  train_steps_per_round: int = 200, eval_steps: int = 100,
                  n_goals: int = 0, **kw):
    """DAgger with the WHOLE imitate→aggregate→retrain loop compiled as one
    XLA program (training/online_dagger.py): β-mixed rollouts, HBM-resident
    aggregation buffer, masked-window sampled train steps — zero host
    round-trips inside the algorithm (the host-mediated ``dagger`` pays
    ~rounds×(epochs+2) dispatches; the reference's CARLA socket loop pays
    one per frame). ``beta`` (cfg, default 0.0) is Ross et al.'s expert-mix
    schedule β_r = beta**r.

    ``policy_family=cil`` runs the loop command-conditioned
    (BranchedCILPolicy; buffer also records speeds + navigation commands);
    with ``n_goals > 0`` every round is GOAL-DIRECTED via the route planner
    — the on-policy A→B aggregation loop STILL compiles to one program, and
    the final policy is scored on the routes."""
    from carla_imitation_learning_tpu.training.online_dagger import (
        make_online_dagger,
    )

    pf = str(cfg.get("policy_family", "discrete"))
    goal_ids = None
    if n_goals > 0:
        _force_turn_fans(cfg)
    town, params, rcfg = _sim_bits(cfg)
    if n_goals > 0:
        town, _, goal_ids = _plan_goals(cfg, town, n_goals, n_envs)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    fs = int(cfg.get("frame_skip", 4))
    if pf == "cil":
        model = BranchedCILPolicy(obs_size=fs,
                                  n_actions=int(cfg.get("n_actions", 9)),
                                  n_commands=int(cfg.get("n_commands", 6)),
                                  dtype=_dtype(cfg))
        example = model.example_input(1, rcfg.height, rcfg.width)
    else:
        model = _discrete_policy_model(cfg, fs)
        example = jnp.zeros((1, rcfg.height, rcfg.width, fs))
    tx = make_optimizer(cfg, 1)
    state = create_train_state(model, rng, example, tx)
    mesh, _ = _mesh_bits(cfg, batch_size=n_envs)
    run = make_online_dagger(
        model.apply, params, town, rcfg,
        n_envs=n_envs, n_steps=n_steps, rounds=rounds,
        train_steps=train_steps_per_round,
        batch=int(cfg.get("BATCH_SIZE", 64)),
        frame_skip=fs,
        beta=float(cfg.get("beta", 0.0)), mesh=mesh,
        cil=(pf == "cil"), goal_ids=goal_ids,
        speed_weight=float(cfg.get("speed_weight", 0.1)))
    rng, k_run, k_eval = jax.random.split(rng, 3)
    state, metrics = run(state, k_run)

    p = state.params

    if pf == "cil":
        policy_fn = model.as_policy_fn(p)
    else:
        def policy_fn(obs):
            return jnp.argmax(model.apply({"params": p}, obs), axis=-1)

    final = cl.evaluate_policy(params, town, rcfg, policy_fn, k_eval,
                               n_envs=min(n_envs, 32), n_steps=eval_steps,
                               frame_skip=fs)
    out = {"loss_per_round": [float(x) for x in metrics["loss"]],
           "agreement_per_round": [float(x) for x in metrics["agreement"]],
           "valid_frac_per_round": [float(x) for x in metrics["valid_frac"]],
           "final_eval": final}
    if n_goals > 0:
        rng, kr = jax.random.split(rng)
        out["routes"] = cl.evaluate_routes(params, town, rcfg, policy_fn, kr,
                                           n_envs=n_envs, n_steps=n_steps,
                                           frame_skip=fs, goal_ids=goal_ids)
    return out


@experiment("bc_cil")
def bc_cil(cfg, n_envs: int = 32, n_steps: int = 300, n_goals: int = 0, **kw):
    """BASELINE config #2: command-conditioned branched policy + speed head,
    trained on on-device collected data.

    ``n_goals > 0`` makes collection GOAL-DIRECTED via the route planner
    (sim/planner.py): the expert drives to sampled destinations and the
    command channel records the planner's announced turns — the training
    distribution a CIL policy needs to navigate A→B itself (score it with
    ``route_eval -o checkpoint=...``).

    ``mirror_collection=true`` collects the second half of the budget on the
    y-axis-reflected town (sim/town.mirror_town): make_town's loops are all
    counterclockwise, so goal-directed data starves the right-turn branch
    (measured r3: 66 of 51,200 frames); the mirrored world turns every left
    into a genuine right with consistent pixels/labels/commands.
    ``balance_key=command`` (or ``action_command``) rebalances epoch
    sampling by CIL branch instead of action class."""
    goal_ids = None
    if n_goals > 0:
        _force_turn_fans(cfg)
    town, params, rcfg = _sim_bits(cfg)
    if n_goals > 0:
        town, _, goal_ids = _plan_goals(cfg, town, n_goals, n_envs)
    cams = _surround_cams(cfg)
    fs = int(cfg.get("frame_skip", 4))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    if bool(cfg.get("mirror_collection", False)):
        from carla_imitation_learning_tpu.data.pipeline import FrameStore
        from carla_imitation_learning_tpu.sim.town import mirror_town

        rng, rm = jax.random.split(rng)
        half = n_steps // 2
        store_a, _, traj_a = cl.collect_dataset(
            params, town, rcfg, rng, n_envs, half, noise=_noise_bits(cfg),
            goal_ids=goal_ids, cameras=cams)
        store_b, _, traj_b = cl.collect_dataset(
            params, mirror_town(town), rcfg, rm, n_envs, half,
            noise=_noise_bits(cfg), goal_ids=goal_ids, cameras=cams)
        store = FrameStore.concat([store_a, store_b])
        halves = [(store_a, cl.extra_view_streams(traj_a)
                   if len(cams) > 1 else []),
                  (store_b, cl.extra_view_streams(traj_b)
                   if len(cams) > 1 else [])]
    else:
        store, _, traj = cl.collect_dataset(params, town, rcfg, rng, n_envs,
                                            n_steps, noise=_noise_bits(cfg),
                                            goal_ids=goal_ids, cameras=cams)
        halves = [(store, cl.extra_view_streams(traj)
                   if len(cams) > 1 else [])]
    # BASELINE config #2's "multi-camera input": the side views ride as
    # extra camera-minor channels (same layout the surround rollout framebuf
    # maintains), sliced in lockstep with the base store; each collection
    # half is split 80/10/10 SEPARATELY so mirrored data lands in every
    # split proportionally (a naive concat-then-split would give train the
    # normal world and val/test the mirrored one)
    from carla_imitation_learning_tpu.data.pipeline import FrameStore

    def _split3(s, ex):
        n = len(s)
        b = {"train": (0, int(0.8 * n)), "val": (int(0.8 * n), int(0.9 * n)),
             "test": (int(0.9 * n), n)}
        return {k: (s.slice(a, z), [e[a:z] for e in ex])
                for k, (a, z) in b.items()}

    split_halves = [_split3(s, ex) for s, ex in halves]
    splits = {k: (FrameStore.concat([sh[k][0] for sh in split_halves]),
                  [np.concatenate([sh[k][1][i] for sh in split_halves])
                   for i in range(len(cams) - 1)])
              for k in ("train", "val", "test")}
    mesh, sharding = _mesh_bits(cfg)
    loaders = {f"{k}_dataloader": pipe.DeviceDataset(
        s, int(cfg.get("BATCH_SIZE", 64)), frame_skip=fs,
        shuffle=(k == "train"), cil=True, drop_last=(k == "train"),
        sharding=(sharding if k == "train" else None),
        extra_frames=ex or None,
        balanced=(bool(cfg.get("balanced_sampling", False)) and k == "train"),
        balance_key=str(cfg.get("balance_key", "action")))
        for k, (s, ex) in splits.items()}
    n_commands = int(cfg.get("n_commands", 6))
    model = BranchedCILPolicy(obs_size=fs * len(cams), n_commands=n_commands,
                              dtype=_dtype(cfg))
    frames, speed, command = model.example_input(1, rcfg.height, rcfg.width)
    loss = cil_loss_fn(float(cfg.get("speed_weight", 0.1)))
    result = _fit(cfg, "bc_cil", model, (frames, speed, command), loss, loaders,
                  mesh=mesh)
    # per-command sample counts: every branch of the policy should train on
    # real samples (use sim=town_multilane / the bc_cil preset for all 6)
    hist = np.bincount(store.commands, minlength=n_commands)
    result["command_histogram"] = hist.tolist()
    empty = [c for c in range(n_commands) if hist[c] == 0]
    if empty:
        from carla_imitation_learning_tpu.utils import ColorPrint

        ColorPrint.print_warn(
            f"bc_cil: commands {empty} have no samples — branches never train"
            " (enable lanes_per_direction>1 + superblocks + lane_change_period"
            " for the full taxonomy)")
    return result


@experiment("bc_continuous")
def bc_continuous(cfg, n_envs: int = 32, n_steps: int = 300,
                  eval_envs: int = 64, eval_steps: int = 200, **kw):
    """Continuous-control behavior cloning (beyond-reference tier): regress
    the expert's raw (steer, accel) instead of the 9-class discretization,
    then drive the closed loop with ``control_space="continuous"``.

    Labels come from the state log's continuous columns (the same state.csv
    contract the reference discretizes, imitation_dataset.py:317-339):
    steer as-is, accel = throttle − brake ∈ [-1, 1] — exactly what the
    rollout's continuous control convention executes. With noise injection
    the state log carries the CLEAN pre-noise steer, so supervision stays
    clean here too."""
    from carla_imitation_learning_tpu.models import ContinuousPolicyCNN
    from carla_imitation_learning_tpu.training import continuous_bc_loss_fn

    town, params, rcfg = _sim_bits(cfg)
    cams = _surround_cams(cfg)
    fs = int(cfg.get("frame_skip", 4))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    store, state_log, traj = cl.collect_dataset(
        params, town, rcfg, rng, n_envs, n_steps,
        frame_skip=fs, noise=_noise_bits(cfg), cameras=cams)
    extra = cl.extra_view_streams(traj) if len(cams) > 1 else []
    labels = np.stack(
        [np.asarray(state_log.steer, np.float32),
         np.asarray(state_log.throttle, np.float32)
         - np.asarray(state_log.brake, np.float32)], axis=1)
    n = len(store)
    bounds = {"train": (0, int(0.8 * n)), "val": (int(0.8 * n), int(0.9 * n)),
              "test": (int(0.9 * n), n)}
    mesh, sharding = _mesh_bits(cfg)
    loaders = {f"{k}_dataloader": pipe.DeviceDataset(
        store.slice(a, b), int(cfg.get("BATCH_SIZE", 64)),
        frame_skip=fs,
        shuffle=(k == "train"), drop_last=(k == "train"),
        sharding=(sharding if k == "train" else None),
        extra_frames=[ef[a:b] for ef in extra] or None,
        continuous_labels=labels[a:b])
        for k, (a, b) in bounds.items()}
    model = ContinuousPolicyCNN(obs_size=fs * len(cams), dtype=_dtype(cfg))
    loss = continuous_bc_loss_fn(float(cfg.get("steer_weight", 1.0)),
                                 float(cfg.get("accel_weight", 0.5)))
    result = _fit(cfg, "bc_continuous", model,
                  model.example_input(1, rcfg.height, rcfg.width),
                  loss, loaders, mesh=mesh)

    p = result["state"].params

    def policy_fn(obs):
        return model.apply({"params": p}, obs)  # (B, 2) tanh'd controls

    rng, ek = jax.random.split(rng)
    result["eval"] = cl.evaluate_policy(
        params, town, rcfg, policy_fn, ek, n_envs=eval_envs,
        n_steps=eval_steps, control_space="continuous", cameras=cams)
    result["label_stats"] = {
        "steer_std": float(labels[:, 0].std()),
        "accel_mean": float(labels[:, 1].mean()),
    }
    return result


@experiment("bc_surround")
def bc_surround(cfg, n_envs: int = 8, n_steps: int = 200,
                eval_envs: int = 64, eval_steps: int = 200, **kw):
    """Surround-view behavior cloning (beyond-reference tier): the policy
    observes the full multi-camera rig live, not just the forward view.
    The reference only ever COLLECTS its side/rear cameras (vae_dataset.py
    FL/FR/SL/SR/RR) — no policy there consumes them.

    One expert trajectory renders from every rig view inside one jitted scan
    (closed_loop.collect_multicamera); the K camera streams stack as a
    trailing axis in DeviceDataset(extra_frames=...), whose windows
    interleave time-major/camera-minor — the EXACT channel layout the
    surround rollout framebuf maintains (closed_loop.update_framebuf) — so
    offline training and the closed loop see identical observations by
    construction. The trained policy then drives the closed loop with the
    same rig (``make_rollout(cameras=...)``); obs channels = frame_skip·K.

    ``surround_cameras`` picks the rig (default forward + FL + FR);
    ``policy_arch=vit`` works here too (the obs is just a wider NHWC stack).
    """
    cams = _surround_cams(cfg)
    if len(cams) < 2:
        cams = ("camera", "FL", "FR")
    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    frames, state_log, starts = cl.collect_multicamera(
        params, town, rcfg, rng, cameras=cams, n_envs=n_envs, n_steps=n_steps)
    fs = int(cfg.get("frame_skip", 4))
    base = pipe.FrameStore.from_arrays(frames[cams[0]], state_log,
                                       starts=starts)
    n = len(base)
    bounds = {"train": (0, int(0.8 * n)), "val": (int(0.8 * n), int(0.9 * n)),
              "test": (int(0.9 * n), n)}
    mesh, sharding = _mesh_bits(cfg)
    loaders = {f"{k}_dataloader": pipe.DeviceDataset(
        base.slice(a, b), int(cfg.get("BATCH_SIZE", 64)), frame_skip=fs,
        shuffle=(k == "train"), drop_last=(k == "train"),
        sharding=(sharding if k == "train" else None),
        extra_frames=[frames[c][a:b] for c in cams[1:]])
        for k, (a, b) in bounds.items()}
    model = _discrete_policy_model(cfg, fs * len(cams))
    example = jnp.zeros((1, rcfg.height, rcfg.width, fs * len(cams)))
    result = _fit(cfg, "bc_surround", model, example, bc_loss_fn, loaders,
                  mesh=mesh)

    p = result["state"].params

    def policy_fn(obs):
        return jnp.argmax(model.apply({"params": p}, obs), axis=-1)

    rng, ek = jax.random.split(rng)
    result["eval"] = cl.evaluate_policy(
        params, town, rcfg, policy_fn, ek, n_envs=eval_envs,
        n_steps=eval_steps, frame_skip=fs, cameras=cams)
    result["cameras"] = list(cams)
    return result


@experiment("hpo")
def hpo(cfg, num_samples: int = 4, max_concurrent: int = 4, **kw):
    """Working replacement for the reference's broken Ray Tune path
    (ray_trainer.py:39-53): random-search trials over the BC recipe, run
    ``max_concurrent`` at a time like Ray's 4 concurrent trials, with
    per-trial loader/PRNG isolation (DeviceDataset.fork) and trial-level
    fault tolerance (a raising trial is recorded, the sweep continues)."""
    from carla_imitation_learning_tpu.parallel.hpo import tune_run

    cfg_c = cfg.copy()
    cfg_c["camera"] = "camera"
    _maybe_synthesize(cfg_c, "camera")
    loaders = pipe.sequential_train_val_test_iterator(cfg_c)
    from carla_imitation_learning_tpu.training.steps import (
        make_eval_step, make_train_step,
    )

    def trainable(trial_cfg):
        trial_seed = int(trial_cfg.get("seed", 0))
        # per-trial forks: fresh shuffle/PRNG state over shared device arrays
        train_ds = loaders["train_dataloader"].fork(1000 + trial_seed)
        val_ds = loaders["val_dataloader"].fork(2000 + trial_seed)
        model = PolicyCNN(dtype=_dtype(cfg))
        rng = jax.random.PRNGKey(trial_seed)
        tx = make_optimizer({"LEARNING_RATE": trial_cfg["lr"],
                             "gradient_clip_val": 0.5}, 1)
        h = int(cfg.get("image_height", 256))
        state = create_train_state(model, rng,
                                   model.example_input(1, h, int(cfg.get("image_width", h))), tx)
        step = make_train_step(bc_loss_fn, donate=False)
        for epoch in range(int(trial_cfg.get("epochs", 2))):
            for batch in train_ds:
                rng, k = jax.random.split(rng)
                state, _ = step(state, batch, k)
        ev = make_eval_step(bc_loss_fn)
        accs = [ev(state, b)["accuracy"] for b in val_ds]
        return {"mean_accuracy": float(np.mean([float(a) for a in accs]))}

    best, trials = tune_run(
        trainable, space={"lr": (1e-4, 1e-2), "epochs": [2], "seed": [0, 1, 2, 3]},
        num_samples=num_samples, metric="mean_accuracy", mode="max",
        max_concurrent=int(max_concurrent),
        results_dir=str(Path(cfg["log_dir"]) / "hpo"))
    return {"best_config": best.config, "best_metrics": best.metrics,
            "n_trials": len(trials),
            "n_failed": sum(t.failed for t in trials)}


@experiment("collect_multicamera")
def collect_multicamera_data(cfg, n_envs: int = 8, n_steps: int = 128,
                             write_png: bool = True, **kw):
    """Write a multi-camera raw log (camera + FL/FR/SL/SR/RR views) in the
    reference's exact VAE data contract — the full CARLA rig replacement.

    Each camera is ALSO written as a packed native framestore
    (``<cam>.tpuilfs``): raw uint8 append at memcpy speed, the ≥10×-faster
    tier for fleet-scale collection (PNG encode is the bottleneck on this
    host; ``write_png=False`` skips it when only the packed tier is needed)."""
    cameras = tuple(kw.get("cameras", ("camera", "FL", "FR", "SL", "SR", "RR")))
    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    frames, state_log, starts = cl.collect_multicamera(
        params, town, rcfg, rng, cameras=cameras, n_envs=n_envs, n_steps=n_steps)
    data_dir = Path(cfg["data_dir"])
    log = kw.get("log_name", "SimLog1")
    packed = {}
    try:
        from carla_imitation_learning_tpu.native import save_framestore
    except Exception:
        save_framestore = None
    for cam, arr in frames.items():
        if write_png:
            fl.save_frames(data_dir / "raw" / log / cam, arr)
        if save_framestore is not None:
            # starts bitmap rides into the v2 framestore so windowed readers
            # never span env-stream boundaries or auto-resets
            store = pipe.FrameStore.from_arrays(arr, state_log, starts=starts)
            p = data_dir / "raw" / log / f"{cam}.tpuilfs"
            packed[cam] = str(save_framestore(p, store))
    fl.save_state_csv(data_dir / "raw" / log / "state.csv", state_log)
    fl.save_state_csv(data_dir / "raw" / "state.csv", state_log)
    return {"cameras": list(frames), "frames_per_camera": len(state_log),
            "log": str(data_dir / "raw" / log), "framestores": packed}


@experiment("world_model")
def world_model(cfg, n_envs: int = 16, n_steps: int = 128, seq_len: int = 8,
                z_size: int = 64, rnn: str = "lstm", image_loss: str = "mse",
                **kw):
    """Latent world model (Encoder→RNN→Decoder) on on-device rollout data —
    the design in the reference's reports/figures/combined_archiecture.pdf."""
    from carla_imitation_learning_tpu.models.world_model import LatentWorldModel
    from carla_imitation_learning_tpu.training.losses import world_model_loss_fn

    # config overrides (CLI: -o wm_z_size=128 -o wm_rnn=gru -o wm_image_loss=ms_ssim)
    z_size = int(cfg.get("wm_z_size", z_size))
    rnn = str(cfg.get("wm_rnn", rnn))
    image_loss = str(cfg.get("wm_image_loss", image_loss))
    seq_len = int(cfg.get("wm_seq_len", seq_len))

    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    store, _, _ = cl.collect_dataset(params, town, rcfg, rng, n_envs, n_steps)
    # env-major streams: hold out the last env stream for validation so splits
    # and episode boundaries stay aligned
    n = len(store)
    split = (n_envs - 1) * n_steps if n_envs > 1 else int(0.9 * n)
    mesh, sharding = _mesh_bits(cfg, batch_size=int(cfg.get("wm_batch", 16)))
    mk = lambda s, sh, shard: pipe.SequenceDataset(  # noqa: E731
        s, batch_size=int(cfg.get("wm_batch", 16)), seq_len=seq_len,
        episode_len=n_steps, shuffle=sh, seed=int(cfg.get("seed", 0)),
        sharding=shard)
    loaders = {
        "train_dataloader": mk(store.slice(0, split), True, sharding),
        "val_dataloader": mk(store.slice(split, n), False, None),
    }
    model = LatentWorldModel(
        z_size=int(kw.get("wm_z_size", z_size)), rnn=rnn,
        n_actions=int(cfg.get("n_actions", 9)),
        height=rcfg.height, width=rcfg.width, dtype=_dtype(cfg))
    loss = world_model_loss_fn(image_loss=image_loss)
    result = _fit(cfg, f"world_model_{rnn}_{z_size}_{image_loss}", model,
                  model.example_input(1, seq_len), loss, loaders, mesh=mesh)
    # the RESOLVED architecture — downstream consumers (world_model_imagine)
    # must rebuild the exact trained model, not re-derive defaults from cfg
    result["wm_config"] = {"z_size": model.z_size, "rnn": model.rnn,
                           "n_actions": model.n_actions,
                           "height": model.height, "width": model.width,
                           "image_loss": image_loss, "seq_len": seq_len}
    return result


@experiment("dream_policy")
def dream_policy(cfg, n_envs: int = 16, n_steps: int = 200, seq_len: int = 8,
                 horizon: int = 15, imag_updates: int = 300,
                 imag_batch: int = 128, reward_steps: int = 300,
                 eval_envs: int = 32, eval_steps: int = 150, **kw):
    """Imagination-trained policy (Dreamer-lite, training/imagination.py):
    train the latent world model on on-device rollouts, fit a reward head on
    recorded driving rewards, train a latent policy ENTIRELY inside the
    model's imagination (no simulator in the training loop), then score it
    in the real sim. The reference's world model is a report sketch; this
    makes it load-bearing.

    ``policy_family=continuous`` switches the WHOLE chain to the continuous
    action space: the world model conditions on the expert's raw
    (steer, accel) rows, the imagination policy is a tanh controller with
    pure pathwise gradients (no Gumbel relaxation needed), and the real-sim
    eval executes the floats.

    Round-5 anti-exploitation defaults (the bare round-4 objective was
    gamed at fleet scale — reports/dream_policy.json: imagined return +68%
    while the real car parked): ``reward_ensemble=5`` heads with
    ``imag_disagree=1.0`` pessimism, a latent-BC warm start
    (``imag_warm_start=true``) and KL anchor (``imag_bc_anchor=0.3``).
    Set ``-o reward_ensemble=1 -o imag_disagree=0 -o imag_bc_anchor=0
    -o imag_warm_start=false`` to reproduce the round-4 failure mode."""
    from carla_imitation_learning_tpu.models.world_model import LatentWorldModel
    from carla_imitation_learning_tpu.training import imagination as imag
    from carla_imitation_learning_tpu.training.losses import world_model_loss_fn
    from carla_imitation_learning_tpu.training.rl import (
        PPOConfig, reward_from_traj,
    )

    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    rng, kc = jax.random.split(rng)
    store, _, traj = cl.collect_dataset(params, town, rcfg, kc, n_envs, n_steps)
    # per-frame dense driving reward, env-major like the store's frames
    rewards = jnp.swapaxes(
        reward_from_traj(traj, PPOConfig()), 0, 1).reshape(-1)

    # world model fit (same recipe as the world_model experiment)
    family = _control_space(cfg)
    n = len(store)
    split = (n_envs - 1) * n_steps if n_envs > 1 else int(0.9 * n)
    wm_batch = int(cfg.get("wm_batch", 16))
    mk = lambda s, sh: pipe.SequenceDataset(  # noqa: E731
        s, batch_size=wm_batch, seq_len=seq_len, episode_len=n_steps,
        shuffle=sh, seed=int(cfg.get("seed", 0)),
        continuous_actions=(family == "continuous"))
    loaders = {"train_dataloader": mk(store.slice(0, split), True),
               "val_dataloader": mk(store.slice(split, n), False)}
    model = LatentWorldModel(
        z_size=int(cfg.get("wm_z_size", 64)), rnn=str(cfg.get("wm_rnn", "gru")),
        n_actions=int(cfg.get("n_actions", 9)), action_space=family,
        height=rcfg.height, width=rcfg.width, dtype=_dtype(cfg))
    wm_fit = _fit(cfg, "dream_policy_wm", model, model.example_input(1, seq_len),
                  world_model_loss_fn(), loaders)
    wm_params = wm_fit["state"].params

    frames = jnp.asarray(store.frames, jnp.float32)[..., None] * (1.0 / 255.0)
    zs = imag.encode_frames(model, wm_params, frames)
    rng, kr, kb, kp, ke = jax.random.split(rng, 5)
    ensemble = int(cfg.get("reward_ensemble", 5))
    head, rh_params, rh_hist = imag.train_reward_head(
        zs, rewards, kr, steps=reward_steps, ensemble=ensemble)

    # latent-BC policy on the expert's recorded actions: warm start +
    # KL anchor for the imagination phase (training/imagination.py)
    anchor_coef = float(cfg.get("imag_bc_anchor", 0.3))
    warm_start = _flag(cfg, "imag_warm_start", True)
    bc_params, bc_hist = None, None
    if anchor_coef > 0.0 or warm_start:
        if family == "continuous":
            lbc_policy = imag.ContinuousLatentPolicy()
            targets = jnp.asarray(store.controls, jnp.float32)
        else:
            lbc_policy = imag.LatentPolicy(n_actions=model.n_actions)
            targets = jnp.asarray(store.actions, jnp.int32)
        bc_params, bc_hist = imag.train_latent_bc(
            lbc_policy, zs, targets, kb,
            steps=int(cfg.get("latent_bc_steps", 400)),
            continuous=(family == "continuous"))
    policy, p_params, hist = imag.imagination_train(
        model, wm_params, head, rh_params, zs, kp, updates=imag_updates,
        batch=imag_batch, horizon=int(cfg.get("imag_horizon", horizon)),
        gamma=float(cfg.get("imag_gamma", 0.98)),
        lr=float(cfg.get("imag_lr", 3e-4)),
        entropy_coef=float(cfg.get("imag_entropy", 3e-3)),
        explore_std=float(cfg.get("imag_explore_std", 0.1)),
        ensemble=ensemble,
        disagree_coef=float(cfg.get("imag_disagree", 1.0)),
        anchor_params=(bc_params if anchor_coef > 0.0 else None),
        anchor_coef=anchor_coef,
        init_params=(bc_params if warm_start else None),
        uncertainty_stop=float(cfg.get("imag_uncertainty_stop", 0.0)))

    pf = imag.latent_policy_fn(model, wm_params, policy, p_params)
    eval_m = cl.evaluate_policy(params, town, rcfg, pf, ke,
                                n_envs=eval_envs, n_steps=eval_steps,
                                control_space=family)
    expert_m = cl.evaluate_policy(params, town, rcfg, None, ke,
                                  n_envs=eval_envs, n_steps=eval_steps)
    out = {
        "wm_val_loss": wm_fit["history"][-1].get("val_loss"),
        "reward_head_mse": rh_hist,
        "imagination": hist,
        "imagined_return_first": hist[0]["imagined_return"],
        "imagined_return_last": hist[-1]["imagined_return"],
        "eval": eval_m,
        "expert": expert_m,
        "mitigations": {
            "reward_ensemble": ensemble,
            "imag_disagree": float(cfg.get("imag_disagree", 1.0)),
            "imag_bc_anchor": anchor_coef,
            "imag_warm_start": warm_start,
            "imag_uncertainty_stop": float(
                cfg.get("imag_uncertainty_stop", 0.0)),
        },
    }
    if bc_hist is not None:
        out["latent_bc_loss"] = bc_hist
        # the latent-BC policy's OWN real-sim score: the floor imagination
        # must beat for the dream tier to be worth anything
        lbc_pf = imag.latent_policy_fn(model, wm_params, lbc_policy, bc_params)
        out["latent_bc_eval"] = cl.evaluate_policy(
            params, town, rcfg, lbc_pf, ke, n_envs=eval_envs,
            n_steps=eval_steps, control_space=family)
    return out


@experiment("world_model_sweep")
def world_model_sweep(cfg, n_envs: int = 16, n_steps: int = 128,
                      z_sizes=(64, 128, 512), rnns=("lstm", "gru"),
                      losses=("mse", "ms_ssim"), max_concurrent: int = 4, **kw):
    """The reference's HPO plan, executed: Latent Size × RNN Unit × Loss grid
    (reports/Results.xlsx sheet1 — the reference only ever recorded the plan).
    Trials are fully self-contained (each builds its own data, model, logger
    and uniquely-named checkpoint dir), so they run ``max_concurrent`` at a
    time; a failing trial is recorded and the grid continues."""
    from carla_imitation_learning_tpu.parallel.hpo import grid_space, tune_run

    def trainable(trial):
        r = world_model(cfg, n_envs=n_envs, n_steps=n_steps,
                        z_size=trial["z"], rnn=trial["rnn"],
                        image_loss=trial["loss"])
        h = r["history"][-1]
        return {"val_loss": h.get("val_loss", float("inf")),
                "val_recon_loss": h.get("val_recon_loss", float("inf"))}

    space = {"z": list(z_sizes), "rnn": list(rnns), "loss": list(losses)}
    best, trials = tune_run(trainable, trial_configs=grid_space(space),
                            metric="val_loss", mode="min",
                            max_concurrent=int(max_concurrent),
                            results_dir=str(Path(cfg["log_dir"]) / "wm_sweep"))
    return {"best_config": best.config, "best_metrics": best.metrics,
            "n_trials": len(trials),
            "n_failed": sum(t.failed for t in trials),
            "table": [{**t.config, **t.metrics} for t in trials if not t.failed]}


def _bc_vmap_trainable(cfg, epochs: int):
    """(init_fn, train_fn) for per-trial BC training with a vmappable
    learning-rate hyperparameter — shared by hpo_vmap and hpo_pbt."""
    import optax

    from carla_imitation_learning_tpu.training.losses import accuracy, cross_entropy

    cfg_c = cfg.copy()
    cfg_c["camera"] = "camera"
    _maybe_synthesize(cfg_c, "camera")
    loaders = pipe.sequential_train_val_test_iterator(cfg_c)
    train_ds = loaders["train_dataloader"]
    val_ds = loaders["val_dataloader"]

    # materialize the epoch as stacked device batches (fixed shapes for fori)
    order = np.arange(train_ds.n_samples)
    nb = max(1, train_ds.n_samples // train_ds.batch_size)
    batches = [train_ds.make_batch(order[i * train_ds.batch_size:
                                         (i + 1) * train_ds.batch_size])
               for i in range(nb)]
    bx = jnp.stack([b[0] for b in batches])  # (nb, B, H, W, C)
    by = jnp.stack([b[1] for b in batches])
    vx, vy = val_ds.make_batch(np.arange(min(val_ds.n_samples, 64)))

    model = PolicyCNN(obs_size=int(cfg["obs_size"]),
                      n_actions=int(cfg["n_actions"]), dtype=_dtype(cfg))
    make_tx = optax.inject_hyperparams(optax.adam)

    def init_fn(rng, lr):
        params = model.init(rng, bx[0])["params"]
        return {"params": params, "opt": make_tx(learning_rate=lr).init(params)}

    def train_fn(state, lr):
        tx = make_tx(learning_rate=lr)

        def step(carry, xs):
            params, opt = carry
            x, y = xs

            def loss_fn(p):
                return cross_entropy(model.apply({"params": p}, x), y)

            grads = jax.grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), None

        params, opt = state["params"], state["opt"]
        for _ in range(epochs):
            (params, opt), _ = jax.lax.scan(step, (params, opt), (bx, by))
        val_logits = model.apply({"params": params}, vx)
        return {"params": params, "opt": opt}, {
            "mean_accuracy": accuracy(val_logits, vy),
            "val_loss": cross_entropy(val_logits, vy),
        }

    return init_fn, train_fn


@experiment("hpo_vmap")
def hpo_vmap(cfg, lrs=(3e-4, 1e-3, 3e-3, 1e-2), epochs: int = 2, **kw):
    """Vectorized HPO: ALL learning-rate trials of the BC recipe train inside
    ONE jit program (vmap over the trial axis) — the TPU-native answer to Ray
    Tune's process-per-trial parallelism (reference ray_trainer.py:49-53).
    Small nets batch their trials onto the MXU together."""
    from carla_imitation_learning_tpu.parallel.hpo import vmap_sweep

    init_fn, train_fn = _bc_vmap_trainable(cfg, epochs)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    lr_arr = jnp.asarray(lrs, jnp.float32)
    states, metrics = vmap_sweep(init_fn, train_fn, lr_arr, rng)
    accs = [float(a) for a in metrics["mean_accuracy"]]
    best_i = int(np.argmax(accs))
    return {"lrs": [float(v) for v in lrs], "accuracies": accs,
            "val_losses": [float(v) for v in metrics["val_loss"]],
            "best_lr": float(lrs[best_i]), "n_trials": len(lrs),
            "note": "all trials trained in one jit program (vmap axis)"}


@experiment("hpo_pbt")
def hpo_pbt(cfg, population: int = 8, generations: int = 4,
            epochs_per_gen: int = 1, lr_range=(1e-4, 3e-2), **kw):
    """Population Based Training of the BC recipe: the population trains as
    one vmapped jit program per generation; truncation exploit/explore runs
    on-device (parallel.hpo.pbt_run). Covers the scheduler tier of the
    reference's Ray Tune surface (ray_trainer.py:49-53) the TPU way."""
    from carla_imitation_learning_tpu.parallel.hpo import pbt_run

    init_fn, train_fn = _bc_vmap_trainable(cfg, epochs_per_gen)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    lo, hi = float(lr_range[0]), float(lr_range[1])
    h0 = jnp.exp(jax.random.uniform(
        jax.random.fold_in(rng, 1), (int(population),),
        minval=float(np.log(lo)), maxval=float(np.log(hi))))
    states, h, hist = pbt_run(init_fn, train_fn, h0, rng,
                              metric="mean_accuracy", mode="max",
                              n_generations=int(generations))
    last = hist[-1]
    best_i = int(np.argmax(last["mean_accuracy"]))
    out = {"population": int(population), "generations": int(generations),
           "best_lr": float(np.asarray(h)[best_i]),
           "best_accuracy": float(last["mean_accuracy"][best_i]),
           "mean_accuracy_per_gen": [float(g["mean_accuracy"].mean()) for g in hist],
           "final_lrs": [float(v) for v in np.asarray(h)]}
    path = Path(cfg["log_dir"]) / "pbt_history.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(
        [{k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in g.items()}
         for g in hist], indent=1))
    out["history_path"] = str(path)
    return out


@experiment("dagger_uncertain")
def dagger_uncertain(cfg, rounds: int = 3, n_envs: int = 16, n_steps: int = 200,
                     epochs_per_round: int = 3, ensemble: int = 4,
                     tau: float = 0.25, **kw):
    """Uncertainty-gated DAgger: a deep ensemble drives, the expert labels,
    and only windows whose queried state the ensemble DISAGREED on are
    trained — the active-learning DAgger variant (query-efficient relabeling)
    the reference system had no machinery for.

    TPU shape: the K ensemble members train as ONE vmapped jit program per
    batch (no K-fold dispatch), the rollout policy majority-votes the K heads
    inside the scan, and per-step disagreement = 1 − top-vote-share rides the
    trajectory back as ``policy_extra`` (training/closed_loop.py). Gating
    happens in DeviceDataset's ``sample_mask`` — windows stay contiguous;
    the mask only selects which LABELED states count.
    """
    from carla_imitation_learning_tpu.training.steps import TrainState

    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    model = PolicyCNN(dtype=_dtype(cfg))
    tx = make_optimizer(cfg, 1)
    K = int(ensemble)
    n_actions = int(cfg.get("n_actions", 9))
    dummy = jnp.zeros((1, rcfg.height, rcfg.width, 4))
    states = jax.vmap(lambda k: create_train_state(model, k, dummy, tx))(
        jax.random.split(rng, K))

    def _raw_step(state: TrainState, batch, srng):
        def wrapped(p):
            return bc_loss_fn(p, state.apply_fn, batch, srng)

        (_, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    # whole ensemble updates in one jit program: vmap members, batch shared
    estep = jax.jit(jax.vmap(_raw_step, in_axes=(0, None, 0)))

    def ensemble_policy_from(member_params):
        def policy_fn(obs):
            logits = jax.vmap(
                lambda p: model.apply({"params": p}, obs))(member_params)
            votes = jnp.argmax(logits, axis=-1)                    # (K, B)
            counts = jnp.sum(
                votes[..., None] == jnp.arange(n_actions)[None, None], axis=0)
            action = jnp.argmax(counts, axis=-1)                   # (B,)
            disagreement = jnp.maximum(1.0 - counts.max(axis=-1) / float(K), 0.0)
            return action, disagreement
        return policy_fn

    def flat(x):
        return np.asarray(jnp.swapaxes(x, 0, 1).reshape((-1,) + x.shape[2:]))

    stores, masks, history = [], [], []
    for rnd in range(rounds):
        rng, k = jax.random.split(rng)
        if rnd == 0:  # bootstrap: expert drives, every state counts
            store, _, _ = cl.collect_dataset(params, town, rcfg, k, n_envs, n_steps)
            mask = np.ones(len(store), bool)
            unc_mean = float("nan")
        else:
            pf = ensemble_policy_from(states.params)
            store, _, traj = cl.dagger_iteration(params, town, rcfg, pf, k,
                                                 n_envs, n_steps)
            unc = flat(traj["policy_extra"])           # env-major, per frame
            mask = unc >= float(tau)
            unc_mean = float(unc.mean())
            if not mask.any():                         # fully confident fleet
                mask[:] = True                         # keep the round useful
        stores.append(store)
        masks.append(mask)
        agg = pipe.FrameStore.concat(stores)
        ds = pipe.DeviceDataset(agg, int(cfg.get("BATCH_SIZE", 64)),
                                frame_skip=int(cfg.get("frame_skip", 4)),
                                shuffle=True, seed=rnd,
                                sample_mask=np.concatenate(masks),
                                balanced=bool(cfg.get("balanced_sampling", False)))
        last = {}
        for _ in range(epochs_per_round):
            for batch in ds:
                rng, sk = jax.random.split(rng)
                states, last = estep(states, batch, jax.random.split(sk, K))
        pf = ensemble_policy_from(states.params)
        rng, ek = jax.random.split(rng)
        m = cl.evaluate_policy(params, town, rcfg, pf, ek,
                               n_envs=min(n_envs, 32), n_steps=100)
        m.update(round=rnd, ensemble=K, tau=float(tau),
                 mean_disagreement=unc_mean,
                 train_loss=float(np.asarray(last.get("loss", np.nan)).mean()),
                 dataset_frames=len(agg), trained_windows=ds.n_samples)
        history.append(m)
    return {"rounds": history}


@experiment("world_model_imagine")
def world_model_imagine(cfg, horizon: int = 8, n_envs: int = 16,
                        n_steps: int = 128, eval_envs: int = 8, **kw):
    """Imagination rollouts on the trained latent world model: encode ONE real
    frame, roll the RNN open-loop over the logged action sequence, decode, and
    score imagined frames against the real future per horizon step — the
    evaluation the reference's world-model report (combined_archiecture.pdf)
    sketches but never built. Also writes a real-vs-imagined film strip."""
    from carla_imitation_learning_tpu.models.world_model import LatentWorldModel
    from carla_imitation_learning_tpu.ops.ssim import ssim

    r = world_model(cfg, n_envs=n_envs, n_steps=n_steps, **kw)
    state = r.pop("state")
    wc = r["wm_config"]  # the RESOLVED trained architecture (not cfg defaults
    # re-derived — the model group may set z_size, the decorator lifts kwargs)
    model = LatentWorldModel(
        z_size=wc["z_size"], rnn=wc["rnn"], n_actions=wc["n_actions"],
        height=wc["height"], width=wc["width"], dtype=_dtype(cfg))

    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 999)
    store, _, _ = cl.collect_dataset(params, town, rcfg, rng,
                                     n_envs=eval_envs, n_steps=horizon + 1)
    frames = (store.frames.reshape(eval_envs, horizon + 1,
                                   rcfg.height, rcfg.width, 1)
              .astype(np.float32) / 255.0)
    actions = store.actions.reshape(eval_envs, horizon + 1)

    f0 = jnp.asarray(frames[:, 0])
    acts = jnp.asarray(actions[:, :horizon], jnp.int32)
    _, imag = jax.jit(lambda p, f, a: model.apply(
        {"params": p}, f, a, method=LatentWorldModel.imagine_frames))(
            state.params, f0, acts)
    real = jnp.asarray(frames[:, 1:horizon + 1])
    mse_h = jnp.mean((imag - real) ** 2, axis=(0, 2, 3, 4))
    # ssim returns (mean ssim, mean contrast-structure); keep the first
    ssim_h = jnp.stack([ssim(imag[:, t], real[:, t])[0]
                        for t in range(horizon)])

    # film strip artifact: env 0, top row real, bottom row imagined
    strip = np.concatenate([
        np.concatenate(list(np.asarray(real[0, :, :, :, 0])), axis=1),
        np.concatenate(list(np.asarray(imag[0, :, :, :, 0])), axis=1),
    ], axis=0)
    from PIL import Image

    path = Path(cfg["log_dir"]) / "imagination_strip.png"
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.clip(strip * 255, 0, 255).astype(np.uint8)).save(path)

    return {"horizon": int(horizon),
            "mse_per_step": [float(v) for v in mse_h],
            "ssim_per_step": [float(v) for v in ssim_h],
            "train_val_loss": r["best_metric"],
            "strip_path": str(path)}


@experiment("export_policy")
def export_policy_exp(cfg, checkpoint: str | None = None,
                      artifact_dir: str | None = None,
                      height: int = 256, width: int = 256,
                      verify_batches: tuple = (1, 7), **kw):
    """Deployment tier: export a (checkpoint-restored) PolicyCNN to a
    self-contained multi-platform StableHLO servable (serving/export.py),
    then verify the deserialized program against the live model and report
    bucketed-engine latency. The reference's only reuse path is
    load_from_checkpoint + the torch source (train.py:198-201); this artifact
    needs neither."""
    from carla_imitation_learning_tpu.serving import (
        InferenceEngine, export_cil_policy, export_policy, load_policy,
    )

    # the model build + checkpoint restore live in _policy_bits (one contract
    # for eval AND export, incl. frame_skip/n_actions/s2d_stem)
    _, _, model, params = _policy_bits(cfg, checkpoint, height, width)
    # surround checkpoints export with their full rig width: obs channels =
    # frame_skip × n_views, matching the model _policy_bits built
    frame_skip = int(cfg.get("frame_skip", 4)) * len(_surround_cams(cfg))

    pf = str(cfg.get("policy_family", "discrete"))
    family = "cil" if pf == "cil" else _control_space(cfg)
    out = Path(artifact_dir or (Path(cfg["log_dir"]) / "policy_artifact"))
    quantize = str(cfg.get("quantize")) if cfg.get("quantize") else None
    common = dict(height=height, width=width, obs_size=frame_skip,
                  quantize=quantize,
                  extra_meta={"n_actions": int(cfg.get("n_actions", 9)),
                              "family": family,
                              "checkpoint": checkpoint or ""})
    if family == "cil":
        export_cil_policy(model, params, out, **common)
    else:
        export_policy(model, params, out, **common)

    servable = load_policy(out)
    eng = InferenceEngine(servable, max_batch=int(cfg.get("serve_max_batch", 64)))
    rng_np = np.random.default_rng(0)
    n_cmd = int(cfg.get("n_commands", 6))
    max_err = 0.0
    for b in verify_batches:
        x = rng_np.integers(0, 256, (int(b), height, width, frame_skip),
                            dtype=np.uint8)
        if family == "cil":
            sp = rng_np.uniform(0, 12, (int(b),)).astype(np.float32)
            cm = rng_np.integers(0, n_cmd, (int(b),), dtype=np.int32)
            live = np.asarray(model.apply({"params": params},
                                          x.astype(np.float32) / 255.0,
                                          sp, cm)[0], np.float32)
            got = np.asarray(servable.call(x, sp, cm), np.float32)
        else:
            live = np.asarray(model.apply({"params": params},
                                          x.astype(np.float32) / 255.0),
                              np.float32)
            got = np.asarray(servable.call(x), np.float32)
        max_err = max(max_err, float(np.abs(got - live).max()))
    cil_specs = [((), np.float32), ((), np.int32)] if family == "cil" else []
    eng.warmup(height, width, frame_skip, extra_specs=cil_specs)
    smoke = rng_np.integers(0, 256, (3, height, width, frame_skip),
                            dtype=np.uint8)
    smoke_extras = ((np.zeros(3, np.float32), np.zeros(3, np.int32))
                    if family == "cil" else ())
    # discrete/cil artifacts serve actions (argmax of logits); continuous
    # ones serve the (steer, accel) floats themselves
    (eng.infer_logits if family == "continuous" else eng.infer)(
        smoke, *smoke_extras)
    blob = (out / "policy.stablehlo").stat().st_size
    return {"artifact": str(out), "blob_bytes": int(blob),
            "platforms": list(servable.platforms),
            "roundtrip_max_abs_err": max_err,
            "engine": eng.stats()}


@experiment("rl_finetune")
def rl_finetune(cfg, checkpoint: str | None = None, n_envs: int = 256,
                rollout_steps: int = 128, iterations: int = 20,
                eval_envs: int = 64, eval_steps: int = 300, **kw):
    """On-device PPO fine-tuning on the leaderboard-shaped driving objective
    (training/rl.py) — fully beyond the reference (imitation-only). Warm-start
    from a BC checkpoint (``checkpoint=``) or train from scratch; reports the
    driving score before and after plus the per-iteration PPO metrics, and
    writes the fine-tuned actor as a PolicyCNN-shaped checkpoint every
    downstream surface (closed_loop_eval, export_policy, dagger) accepts."""
    import optax

    from carla_imitation_learning_tpu.training.rl import (
        ActorCriticCNN, PPOConfig, actor_policy_params_from, ppo_train,
        warm_start_from_policy,
    )
    from carla_imitation_learning_tpu.utils.checkpoint import save_pytree

    town, params, rcfg = _sim_bits(cfg)
    if len(_surround_cams(cfg)) > 1:
        raise ValueError(
            "rl_finetune runs single-view PPO rollouts — surround_cameras "
            "checkpoints can't warm-start it; re-train the rig policy with "
            "bc/dagger surfaces or drop surround_cameras")
    frame_skip = int(cfg.get("frame_skip", 4))
    n_actions = int(cfg.get("n_actions", 9))
    # policy_family=continuous: Gaussian actor over (steer, accel) with a
    # tanh mean — warm-starts from bc_continuous checkpoints, drives/evals
    # with control_space="continuous", and writes a ContinuousPolicyCNN-
    # shaped actor checkpoint back
    family = _control_space(cfg)
    model = ActorCriticCNN(obs_size=frame_skip, n_actions=n_actions,
                           dtype=_dtype(cfg),
                           s2d_stem=bool(cfg.get("s2d_stem", False)),
                           continuous=(family == "continuous"))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    ac_params = model.init(
        rng, model.example_input(1, rcfg.height, rcfg.width))["params"]
    if checkpoint:
        # _policy_bits carries the one model-build + restore contract
        # (frame_skip/n_actions/s2d_stem) for every checkpoint consumer
        _, _, _, bc = _policy_bits(cfg, checkpoint, rcfg.height, rcfg.width)
        ac_params = warm_start_from_policy(ac_params, bc)

    pcfg = PPOConfig(
        w_progress=float(cfg.get("rl_w_progress", 1.0)),
        w_collision=float(cfg.get("rl_w_collision", 25.0)),
        w_red=float(cfg.get("rl_w_red", 10.0)),
        w_offroad=float(cfg.get("rl_w_offroad", 10.0)),
        gamma=float(cfg.get("rl_gamma", 0.99)),
        gae_lambda=float(cfg.get("rl_gae_lambda", 0.95)),
        clip_eps=float(cfg.get("rl_clip_eps", 0.2)),
        entropy_coef=float(cfg.get("rl_entropy_coef", 0.01)),
        update_epochs=int(cfg.get("rl_update_epochs", 4)),
        num_minibatches=int(cfg.get("rl_num_minibatches", 8)),
        learning_rate=float(cfg.get("rl_lr", 3e-4)),
        max_grad_norm=float(cfg.get("rl_max_grad_norm", 0.5)),
    )
    tx = optax.chain(optax.clip_by_global_norm(pcfg.max_grad_norm),
                     optax.adam(pcfg.learning_rate))
    opt_state = tx.init(ac_params)
    mesh, _ = _mesh_bits(cfg, batch_size=n_envs)

    def argmax_policy(p):
        def fn(obs):
            out, _ = model.apply({"params": p}, obs)
            if family == "continuous":
                mean, _ = out  # deterministic actor: the Gaussian mean
                return mean
            return jnp.argmax(out, axis=-1)
        return fn

    eval_rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 101)
    before = cl.evaluate_policy(params, town, rcfg, argmax_policy(ac_params),
                                eval_rng, n_envs=eval_envs, n_steps=eval_steps,
                                mesh=mesh, control_space=family)

    from carla_imitation_learning_tpu.utils import ColorPrint

    def report(i, m):
        ColorPrint.print_run(
            f"  ppo iter {i}: reward/step {m['reward_per_step']:+.4f} "
            f"progress {m['progress_m_per_step']:.3f} m "
            f"kl {m['approx_kl']:.4f} entropy {m['entropy']:.3f}")

    ac_params, opt_state, history = ppo_train(
        params, town, rcfg, model, ac_params, tx, opt_state, rng,
        n_envs=n_envs, rollout_steps=rollout_steps, iterations=iterations,
        cfg=pcfg, frame_skip=frame_skip, mesh=mesh, on_iteration=report)

    after = cl.evaluate_policy(params, town, rcfg, argmax_policy(ac_params),
                               eval_rng, n_envs=eval_envs, n_steps=eval_steps,
                               mesh=mesh, control_space=family)
    out = Path(cfg["log_dir"]) / "rl_finetune" / "actor_params"
    save_pytree(out, {"params": actor_policy_params_from(ac_params)})
    return {"before": before, "after": after, "history": history,
            "actor_checkpoint": str(out),
            "score_delta": float(after["driving_score"]
                                 - before["driving_score"])}


@experiment("bc_rnn")
def bc_rnn(cfg, n_envs: int = 32, n_steps: int = 300, seq_len: int = 8,
           eval_envs: int = 64, eval_steps: int = 200, **kw):
    """Recurrent behavior cloning (beyond-reference model family): a
    ConvTrunk→GRU policy (models/rnn_policy.py) BPTT-trained on
    episode-boundary-safe sequences (SequenceDataset — the world model's
    loader), then evaluated closed-loop with its hidden state threaded
    through the rollout's policy-carry slot (auto-reset on respawn).
    Where PolicyCNN approximates temporal context with the 4-frame stack,
    this carries explicit memory — the architecture CIL successors use for
    out-of-frame state (a light that scrolled past, a committed maneuver)."""
    from carla_imitation_learning_tpu.models import RecurrentPolicy
    from carla_imitation_learning_tpu.training.losses import rnn_bc_loss_fn

    town, params, rcfg = _sim_bits(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    store, _, _ = cl.collect_dataset(params, town, rcfg, rng, n_envs, n_steps,
                                     noise=_noise_bits(cfg))
    n = len(store)
    splits = {"train": store.slice(0, int(0.8 * n)),
              "val": store.slice(int(0.8 * n), int(0.9 * n)),
              "test": store.slice(int(0.9 * n), n)}
    mesh, sharding = _mesh_bits(cfg)
    loaders = {f"{k}_dataloader": pipe.SequenceDataset(
        v, int(cfg.get("BATCH_SIZE", 64)), seq_len=seq_len,
        episode_len=n_steps if k == "train" else None,
        shuffle=(k == "train"),
        sharding=(sharding if k == "train" else None))
        for k, v in splits.items()}

    model = RecurrentPolicy(obs_size=1, hidden=int(cfg.get("rnn_hidden", 128)),
                            n_actions=int(cfg.get("n_actions", 9)),
                            dtype=_dtype(cfg))
    example = model.example_input(1, rcfg.height, rcfg.width, seq_len)
    result = _fit(cfg, "bc_rnn", model, example, rnn_bc_loss_fn, loaders,
                  mesh=mesh)
    state = result.pop("state")

    # closed-loop eval: hidden state rides the rollout's policy-carry slot.
    # the recurrent policy sees SINGLE frames (obs_size=1): take the newest
    # frame of the window the rollout hands every policy
    def policy_fn(obs, h):
        frame = obs[..., -1:]
        h, logits = model.apply({"params": state.params}, h, frame,
                                method=RecurrentPolicy.step)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), h

    carry_init = (lambda b: model.initial_state(b))
    eval_mesh, _ = _mesh_bits(cfg, batch_size=eval_envs)
    metrics = cl.evaluate_policy(
        params, town, rcfg, policy_fn, jax.random.PRNGKey(
            int(cfg.get("seed", 0)) + 7),
        n_envs=eval_envs, n_steps=eval_steps, mesh=eval_mesh,
        policy_carry_init=carry_init)
    result["closed_loop"] = metrics
    return result


@experiment("replay")
def replay_exp(cfg, record: str | None = None, checkpoint: str | None = None,
               n_envs: int = 16, n_steps: int = 120, env_index: int = -1,
               out_height: int = 128, out_width: int = 128,
               make_gif: bool = True, **kw):
    """CARLA-recorder equivalent (client.start_recorder / replay_file),
    TPU-native: record = (initial WorldState, executed controls) — a few KB
    for a whole fleet — and replay re-steps the pure sim bit-exactly
    (training/replay.py).

    Without ``record=``: rolls out ``n_envs`` x ``n_steps`` (the expert, or
    ``checkpoint=`` policy) and saves ``log_dir/episode.npz``. Then — either
    way — replays: picks ``env_index`` (default −1 = the most EVENTFUL env:
    most collisions, then most distance), re-renders it at
    ``out_height``x``out_width`` with RGB + semantic planes (the spectator-
    camera workflow), writes a GIF, and self-checks replay exactness against
    a second dynamics pass."""
    from carla_imitation_learning_tpu.sim.town import town_kwargs_from_cfg
    from carla_imitation_learning_tpu.training import replay as rp

    log_dir = Path(cfg["log_dir"])
    log_dir.mkdir(parents=True, exist_ok=True)
    if record:
        rec = rp.load_record(record)
        rec_path = str(record)
    else:
        town, params, rcfg = _sim_bits(cfg)
        if checkpoint:
            policy_fn, rng, space = _eval_policy_fn(cfg, checkpoint, None,
                                                    rcfg.height, rcfg.width)
        else:
            # no checkpoint → record the AUTOPILOT expert (policy_fn=None),
            # not a freshly-initialized policy
            policy_fn, space = None, "discrete"
            rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
        init_fn, rollout_fn = cl.make_rollout(
            params, town, rcfg, policy_fn,
            frame_skip=int(cfg.get("frame_skip", 4)), control_space=space)
        carry = init_fn(rng, n_envs)
        states0 = carry[0]
        _, traj = rollout_fn(carry, n_steps)
        rec = rp.record_from_rollout(
            states0, traj, params=params,
            town_kwargs=town_kwargs_from_cfg(
                cfg, seed=int(cfg.get("data_seed", 0))),
            rcfg=rcfg,
            meta={"driver": "checkpoint" if checkpoint else "expert",
                  "seed": int(cfg.get("seed", 0))})
        rec_path = rp.save_record(log_dir / "episode.npz", rec)

    # dynamics-only replay of the WHOLE fleet: env pick + exactness stats
    dyn = rp.replay_record(rec, render=False)
    collisions = np.asarray(dyn["collision"]).sum(axis=0)
    km = np.asarray(dyn["speed"]).sum(axis=0)
    idx = (int(env_index) if int(env_index) >= 0
           else int(np.lexsort((-km, -collisions))[0]))
    dyn2 = rp.replay_record(rp.select_envs(rec, idx), render=False)
    exact = float(np.abs(np.asarray(dyn2["speed"])[:, 0]
                         - np.asarray(dyn["speed"])[:, idx]).max())

    out = {"record": rec_path, "n_envs": rec.n_envs, "n_steps": rec.n_steps,
           "env_index": idx, "env_collisions": int(collisions[idx]),
           "replay_speed_max_abs_diff": exact,
           "record_bytes": Path(rec_path).stat().st_size}
    if make_gif:
        frames = rp.replay_record(
            rp.select_envs(rec, idx),
            render_override={"height": int(out_height),
                             "width": int(out_width), "rgb": True,
                             "semantic": True, "backend": "jax",
                             "fast": False})
        from PIL import Image

        rgb = np.clip(np.asarray(frames["rgb"])[:, 0] * 255,
                      0, 255).astype(np.uint8)
        sem = np.clip(np.asarray(frames["semantic_rgb"])[:, 0] * 255,
                      0, 255).astype(np.uint8)
        imgs = [Image.fromarray(np.concatenate([a, b], axis=1))
                for a, b in zip(rgb, sem)]
        gif_path = str(log_dir / f"replay_env{idx}.gif")
        imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 * float(rec.sim.get("dt", 0.05))),
                     loop=0)
        out["gif"] = gif_path
    return out


@experiment("route_eval")
def route_eval(cfg, checkpoint: str | None = None, artifact: str | None = None,
               n_envs: int = 64, n_steps: int = 600, n_goals: int = 8, **kw):
    """Destination-based (A→B) evaluation — the CARLA leaderboard's actual
    task shape, enabled by the global route planner (sim/planner.py):
    ``n_goals`` destinations are sampled on the town's shared lane stretches,
    shortest-path navigation tables are baked host-side once (Dijkstra over
    the quantized route graph), and each env drives to its assigned goal —
    arrival rate / time-to-arrival / infractions per km for the policy, with
    the privileged expert's numbers as the ceiling. The town must have turn
    fans (the preset enables them); goal routing is pure gathers inside the
    rollout scan."""
    _force_turn_fans(cfg)
    town, params, rcfg = _sim_bits(cfg)
    town, goals, goal_ids = _plan_goals(cfg, town, n_goals, n_envs)
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    mesh, _ = _mesh_bits(cfg, batch_size=n_envs)
    expert = cl.evaluate_routes(params, town, rcfg, None, rng,
                                n_envs=n_envs, n_steps=n_steps, mesh=mesh,
                                goal_ids=goal_ids)
    out = {"goals": np.asarray(goals).tolist(), "expert": expert}
    if checkpoint or artifact:
        policy_fn, prng, space = _eval_policy_fn(cfg, checkpoint, artifact,
                                                 rcfg.height, rcfg.width)
        out["policy"] = cl.evaluate_routes(params, town, rcfg, policy_fn,
                                           prng, n_envs=n_envs,
                                           n_steps=n_steps, mesh=mesh,
                                           control_space=space,
                                           goal_ids=goal_ids,
                                           cameras=_surround_cams(cfg))
    return out
