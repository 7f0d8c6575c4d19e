"""Deterministic episode recorder + replayer (the CARLA recorder, TPU-native).

CARLA ships a server-side recorder (``client.start_recorder`` /
``client.replay_file``) that logs every actor transform each frame into a
binary file and can re-render the session later from any spectator camera.
The reference repo never uses it — its data comes pre-recorded — but it is
the capability CARLA users reach for to debug an infraction.

Here the simulator is a pure function (sim/world.py), so the recorder gets
radically cheaper: a rollout is fully determined by the initial fleet
``WorldState`` and the per-step EXECUTED controls, both of which every
rollout trajectory already carries (closed_loop.make_rollout logs
steer/throttle/brake post-noise). An :class:`EpisodeRecord` is therefore a
few KB — 15 small state arrays + a (T, B, 3) float trace + the static
configs — instead of CARLA's per-frame transform dump, and replay is just
re-stepping under jit:

- **bit-exact dynamics**: replay applies the identical
  ``pick_fresh_packed → step_env`` composition ``make_rollout`` used
  (including the shared spawn pool), so the replayed state trajectory —
  auto-resets, collisions, light phases — reproduces the original, noise
  and all (noise lives in the executed steer).
- **re-render with new sensors**: rendering is decoupled from dynamics, so a
  replay may use ANY RenderConfig / camera rig — record a 1024-env fleet at
  128² grayscale, then re-render the one env that crashed at 256² RGB +
  semantic. Envs are independent (vmapped single-env worlds), so
  :func:`select_envs` slices a record down to the interesting ones first.

File format: a single ``.npz`` — ``state0_<field>`` arrays for the initial
``WorldState``, a ``controls`` (T, B, 3) array, and a ``meta`` JSON string
holding the SimParams / make_town kwargs / RenderConfig dicts needed to
rebuild the world.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.render.pipeline import RenderConfig, make_renderer
from carla_imitation_learning_tpu.sim.town import make_town
from carla_imitation_learning_tpu.sim.world import (
    SimParams,
    VehicleControl,
    WorldState,
    sensor_vector,
    step_env,
    traffic_light_state,
)

_STATE_FIELDS = tuple(f.name for f in dataclasses.fields(WorldState))


@dataclasses.dataclass
class EpisodeRecord:
    """A recorded fleet episode: initial state + executed control trace +
    the static configs that rebuild the identical world."""

    states0: WorldState          # batched (B, ...) initial fleet state
    controls: np.ndarray         # (T, B, 3) float32: steer, throttle, brake
    sim: dict                    # SimParams fields
    town: dict                   # make_town(**town) kwargs
    render: dict                 # RenderConfig fields at record time
    meta: dict                   # freeform (driver, seed, notes)

    @property
    def n_steps(self) -> int:
        return int(self.controls.shape[0])

    @property
    def n_envs(self) -> int:
        return int(self.controls.shape[1])


def record_from_rollout(states0: WorldState, traj, *, params: SimParams,
                        town_kwargs: dict, rcfg: RenderConfig,
                        meta: dict | None = None) -> EpisodeRecord:
    """Build a record from any ``make_rollout`` run: the carry's INITIAL
    states + the trajectory's executed steer/throttle/brake (T, B)."""
    controls = np.stack([np.asarray(traj["steer"], np.float32),
                         np.asarray(traj["throttle"], np.float32),
                         np.asarray(traj["brake"], np.float32)], axis=-1)
    return EpisodeRecord(
        states0=jax.tree_util.tree_map(np.asarray, states0),
        controls=controls,
        sim=dataclasses.asdict(params),
        town=dict(town_kwargs),
        render=dataclasses.asdict(rcfg),
        meta=dict(meta or {}),
    )


def select_envs(rec: EpisodeRecord, idx) -> EpisodeRecord:
    """Slice a fleet record down to envs ``idx`` (int or index array) —
    envs are independent, so any subset replays standalone."""
    idx = np.atleast_1d(np.asarray(idx, np.int32))
    return dataclasses.replace(
        rec,
        states0=jax.tree_util.tree_map(lambda a: np.asarray(a)[idx],
                                       rec.states0),
        controls=rec.controls[:, idx],
    )


def save_record(path, rec: EpisodeRecord) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f"state0_{n}": np.asarray(getattr(rec.states0, n))
              for n in _STATE_FIELDS}
    meta = {"sim": rec.sim, "town": rec.town, "render": rec.render,
            "meta": rec.meta, "version": 1}
    np.savez_compressed(path, controls=rec.controls,
                        meta=np.frombuffer(
                            json.dumps(meta).encode(), dtype=np.uint8),
                        **arrays)
    return str(path)


def load_record(path) -> EpisodeRecord:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        controls = z["controls"]
        fields = {}
        for n in _STATE_FIELDS:
            if f"state0_{n}" in z:
                fields[n] = z[f"state0_{n}"]
            elif n == "goal":  # records predating goal navigation: free-roam
                fields[n] = np.full((controls.shape[1],), -1, np.int32)
            else:
                raise KeyError(f"record lacks WorldState field {n!r}")
        states0 = WorldState(**fields)
    return EpisodeRecord(states0=states0, controls=controls, sim=meta["sim"],
                         town=meta["town"], render=meta["render"],
                         meta=meta["meta"])


def rebuild_world(rec: EpisodeRecord):
    """(params, town) identical to the recording run's."""
    return SimParams(**rec.sim), make_town(**rec.town)


def make_replay(params: SimParams, town, rcfg: RenderConfig | None,
                camera: str = "camera"):
    """→ ``replay_fn(states0, controls) -> (final_states, out)``.

    One jitted scan over the recorded controls applying the EXACT dynamics
    composition ``make_rollout`` uses (shared spawn pool →
    ``pick_fresh_packed`` → ``step_env``), so the state trajectory is
    reproduced bit-for-bit on the same platform. ``out`` stacks per step:
    sensors (T, B, 3), traffic (T, B), speed/collision/offroad/done/red_light
    info, and — when ``rcfg`` is not None — every plane the renderer emits
    for the pre-step state (gray, and rgb/semantic/depth where configured).
    Pass ``rcfg=None`` for a render-free dynamics replay (verification,
    metric recomputation)."""
    from carla_imitation_learning_tpu.training.closed_loop import (
        rollout_spawn_pool,
    )

    spawn_pool = rollout_spawn_pool(params, town)
    from carla_imitation_learning_tpu.sim.world import pick_fresh_packed

    step_batch = jax.vmap(lambda s, c, f: step_env(params, town, s, c, f))
    sensor_batch = jax.vmap(lambda s: sensor_vector(params, s))
    light_batch = jax.vmap(lambda s: traffic_light_state(params, town, s))
    render_batch = None
    if rcfg is not None:
        render_batch = jax.vmap(make_renderer(params, town, rcfg, camera))

    def one_step(states, ctrl):
        control = VehicleControl(steer=ctrl[:, 0], throttle=ctrl[:, 1],
                                 brake=ctrl[:, 2])
        out = {"sensor": sensor_batch(states), "traffic": light_batch(states)}
        if render_batch is not None:
            out.update(render_batch(states))
        fresh = jax.vmap(lambda s: pick_fresh_packed(*spawn_pool, s))(states)
        new_states, info = step_batch(states, control, fresh)
        out.update({"speed": info["speed"], "collision": info["collision"],
                    "offroad": info["offroad"], "done": info["done"],
                    "red_light": info["red_light"]})
        return new_states, out

    @jax.jit
    def replay_fn(states0, controls):
        return jax.lax.scan(one_step, states0, controls)

    return replay_fn


def replay_record(rec: EpisodeRecord, *, render_override: dict | None = None,
                  camera: str = "camera", render: bool = True):
    """Replay a record end-to-end. ``render_override`` patches RenderConfig
    fields (resolution, rgb, backend, weather, ...) over the recorded ones —
    the "new spectator camera" workflow; ``render=False`` skips rendering
    entirely. Returns the stacked per-step dict from :func:`make_replay`."""
    params, town = rebuild_world(rec)
    rcfg = None
    if render:
        rcfg = RenderConfig(**{**rec.render, **(render_override or {})})
    replay_fn = make_replay(params, town, rcfg, camera)
    states0 = jax.tree_util.tree_map(jnp.asarray, rec.states0)
    _, out = replay_fn(states0, jnp.asarray(rec.controls))
    return out
