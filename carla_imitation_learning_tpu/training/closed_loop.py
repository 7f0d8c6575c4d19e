"""Closed-loop evaluation, on-device data collection, and DAgger.

The capability the reference system delegates to CARLA's client-server socket
loop, rebuilt as single-jit programs (BASELINE.json configs #4-#5):

- ``make_rollout``      — policy-in-the-loop fleet rollout: sim step → Pallas
  render → 4-frame stack → policy forward → discrete action → sim step, all
  inside one lax.scan. ZERO host round-trips per step.
- ``evaluate_policy``   — driving metrics over N envs × T steps: raw rates
  (collision / off-road / red-light, mean speed, episodes completed) PLUS
  CARLA-leaderboard-style normalized metrics (km driven, infractions per km,
  per-env route completion × infraction penalty → ``driving_score``).
- ``collect_dataset``   — autopilot (expert) rollouts → a FrameStore, i.e.
  on-device generation of exactly the data contract the reference consumes
  from CARLA logs (frames + state.csv columns).
- ``dagger_iteration``  — policy drives, expert labels: on-policy aggregation
  feeding BC (configs #5).

Observation contract matches the reference BC setup: the policy sees the last
``frame_skip`` grayscale frames stacked as channels
(imitation_dataset.py:115-122), rendered at the sim camera resolution.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.data.actions import discrete_to_continuous
from carla_imitation_learning_tpu.render.pipeline import RenderConfig, make_renderer
from carla_imitation_learning_tpu.sim.world import (
    SimParams, VehicleControl, WorldState, autopilot_control, reset_env,
    sensor_vector, step_env, traffic_light_state,
)
from carla_imitation_learning_tpu.sim.town import TownMap


def update_framebuf(framebuf: jnp.ndarray, gray: jnp.ndarray,
                    just_reset: jnp.ndarray) -> jnp.ndarray:
    """Slide the per-env frame window; envs that auto-reset on the previous
    step get their window REFILLED with the fresh view so observations never
    blend frames across an episode boundary (the reference's windows are
    single-stream by construction, imitation_dataset.py:115-131).

    framebuf (B, H, W, fs) — NHWC so it feeds the policy with NO per-step
    transpose; gray (B, H, W), just_reset (B,) bool.

    Surround view: gray (B, H, W, K) holds the K camera views of the CURRENT
    step and framebuf is (B, H, W, fs·K) — the shift drops the oldest K
    channels and appends the new K, keeping channel index t·K + c
    (time-major, camera-minor), the same layout data.pipeline.gather_windows
    emits for stacked offline stores."""
    if gray.ndim == 3:
        gray = gray[..., None]
    k = gray.shape[-1]
    frame_skip = framebuf.shape[-1] // k
    return jnp.where(
        just_reset[:, None, None, None],
        jnp.tile(gray, (1, 1, 1, frame_skip)),
        jnp.concatenate([framebuf[..., k:], gray], axis=-1))


def control_from_discrete(action: jnp.ndarray) -> VehicleControl:
    steer, throttle, brake = discrete_to_continuous(action)
    return VehicleControl(steer=steer, throttle=throttle, brake=brake)


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    """CIL-style exploration noise for data collection (Codevilla et al.'s
    recovery-data trick — the capability CARLA collection scripts implement
    host-side; here it is part of the jitted rollout program).

    Temporally-correlated triangular steering impulses are ADDED to the
    EXECUTED control while the recorded supervision (``expert_action`` and
    the state-log steer column) stays the clean driver signal. The
    self-correcting expert then demonstrates recovery from the perturbed
    states — the classic fix for BC's covariate-shift problem without
    needing DAgger's policy-in-the-loop relabeling.

    prob:      per-step per-env probability that a new impulse starts
               (expected active fraction ≈ prob × duration).
    duration:  impulse length in sim steps (triangular ramp up then down).
    magnitude: peak |steer| offset; overlapping impulses clip to this.
    seed:      schedule PRNG seed (folded with the rollout's env keys, so
               different collection rollouts draw different schedules).
    """

    prob: float = 0.005
    duration: int = 20
    magnitude: float = 0.6
    seed: int = 0


def _noise_schedule(key, n_steps: int, n_envs: int, ncfg: NoiseConfig):
    """(T, B) steering-noise schedule: sparse signed impulse train convolved
    with a causal triangle window, clipped to ±magnitude."""
    kb, ks, km = jax.random.split(key, 3)
    starts = jax.random.bernoulli(kb, ncfg.prob, (n_steps, n_envs))
    sign = jnp.where(jax.random.bernoulli(ks, 0.5, (n_steps, n_envs)), 1.0, -1.0)
    # impulse peaks in [0.3, 1]·magnitude — tiny bursts teach nothing
    mag = jax.random.uniform(km, (n_steps, n_envs), minval=0.3, maxval=1.0)
    train = starts * sign * mag * ncfg.magnitude
    tri = 1.0 - jnp.abs(jnp.linspace(-1.0, 1.0, max(int(ncfg.duration), 3)))
    conv = jax.vmap(lambda v: jnp.convolve(v, tri, mode="full")[:n_steps],
                    in_axes=1, out_axes=1)(train)
    return jnp.clip(conv, -ncfg.magnitude, ncfg.magnitude)


def rollout_spawn_pool(params: SimParams, town: TownMap):
    """The packed auto-reset spawn pool every rollout draws from. One shared
    constructor (fixed seed/size) so a deterministic REPLAY (training/replay.py)
    reproduces the rollout's ``pick_fresh_packed`` picks bit-for-bit."""
    from carla_imitation_learning_tpu.sim.world import (
        make_spawn_pool, pack_spawn_pool,
    )

    return pack_spawn_pool(
        make_spawn_pool(params, town, jax.random.PRNGKey(0x5EED), 1024))


def make_rollout(
    params: SimParams,
    town: TownMap,
    rcfg: RenderConfig,
    policy_fn: Callable | None,
    frame_skip: int = 4,
    mesh=None,
    lidar_beams: int = 0,
    noise: NoiseConfig | None = None,
    policy_rng: jnp.ndarray | None = None,
    policy_carry_init: Callable | None = None,
    control_space: str = "discrete",
    shield=None,
    cameras: "tuple[str, ...]" = ("camera",),
    record_semantic: bool = False,
):
    """Build (init_fn, rollout_fn).

    policy_fn(obs_nhwc (B,H,W,fs)) -> (B,) int32 discrete actions; None means
    drive with the autopilot expert.

    ``cameras`` is the observation rig (render.camera.CAMERA_PRESETS names;
    the first entry is the DRIVING view recorded as ``traj["gray"]``). More
    than one camera turns on surround view: every view renders per step, the
    framebuf holds frame_skip·K channels (time-major, camera-minor — the
    exact layout DeviceDataset(extra_frames=...) trains on), and the policy's
    obs_size must be frame_skip·K. One camera (default) compiles to the
    historical single-view program.

    ``control_space="continuous"`` switches the policy contract to
    (B, 2) float controls — column 0 steer ∈ [-1, 1], column 1 signed
    acceleration (>0 → throttle, <0 → brake), clipped to the unit square
    before execution (models.ContinuousPolicyCNN emits exactly this).
    ``traj["action"]`` then logs ``control_to_discrete_label`` of the
    EXECUTED control so every downstream consumer (agreement metrics,
    DAgger aggregation, histograms) keeps its (T, B) int32 contract; the
    exact floats ride the existing steer/throttle/brake fields. The expert
    path and recurrent policies stay discrete.

    rollout_fn(carry, n_steps) -> (carry, traj) where traj stacks per-step:
    gray frames (T,B,H,W), actions (T,B), sensors (T,B,3), traffic (T,B),
    info scalars. carry = (states, framebuf). ``lidar_beams > 0`` adds a
    (T,B,lidar_beams) planar range scan (render/lidar.py ray caster) to traj.

    ``noise`` (NoiseConfig) perturbs the EXECUTED steering with triangular
    exploration impulses while every recorded supervision signal stays clean:
    ``traj["action"]``/``traj["expert_action"]`` discretize the pre-noise
    driver control and ``traj["clean_steer"]`` (emitted only when noise is
    on) carries the pre-noise steer for the state-log contract. The realized
    wheel angle in ``traj["sensor"][...,0]`` reflects the noise — it is
    physical state the policy legitimately observes.

    ``policy_rng`` (a PRNGKey) threads a fresh per-step key into the policy's
    extras dict (``extras["rng"]``) so STOCHASTIC policies — e.g. the PPO
    actor (training/rl.py) sampling from its softmax — can draw inside the
    scan. Keys are folded with the fleet's env keys so every rollout from a
    distinct init draws a distinct stream. Extras-taking policies that
    ignore the key are unaffected.

    ``shield`` (training/shield.py ShieldConfig) arms the emergency-brake
    safety layer on the EXECUTED control: a forward LIDAR fan cuts throttle
    and applies full brake when time-to-collision drops under the envelope.
    Supervision signals stay clean (same contract as ``noise``);
    ``traj["shield"]`` logs the per-step intervention mask. None (default)
    compiles the feature out.

    ``policy_carry_init`` (``n_envs -> pytree``) enables RECURRENT policies
    (models/rnn_policy.py): the carry gains a 4th element (the policy's
    hidden state), ``policy_fn`` is called as ``(obs, pcarry) ->
    (action, new_pcarry)``, and the hidden state is reset to the init value
    on env auto-resets — the recurrent analogue of the framebuf refill.
    """
    import dataclasses as _dc

    if rcfg.backend == "pallas" and (rcfg.rgb or not rcfg.fast):
        # rollouts only consume the grayscale channel — use the fast rollout
        # kernel (ops/raster_fast.py: packed z|luma key, corner-culled lists)
        rcfg = _dc.replace(rcfg, rgb=False, fast=True)
    if rcfg.backend == "pallas" and rcfg.fast and rcfg.lod_px < 0.0:
        # rollout LOD default (lod_px=-1 "auto"): triangles whose projected
        # bbox is under 2px both ways cost a full pass per touched band for
        # ≤ ~1 lit pixel — culling them is measurement-neutral for the policy
        # observation (+2% env-steps/s base scene, measured). lod_px=0.0
        # disables LOD even here; any positive value is used as-is.
        rcfg = _dc.replace(rcfg, lod_px=2.0)
    cameras = tuple(cameras) or ("camera",)
    render_batch = jax.vmap(make_renderer(params, town, rcfg,
                                          camera=cameras[0]))
    extra_render = [jax.vmap(make_renderer(params, town, rcfg, camera=c))
                    for c in cameras[1:]]
    sem_render = None
    if record_semantic:
        # per-pixel semantic GROUND TRUTH of the driving view (class ids
        # 0-7, render/geometry.py SEM_*) — the supervision stream for the
        # segmentation aux head (BASELINE config #3). The fast rollout
        # kernel emits luma only, so this builds a second renderer on the
        # exact (non-fast) path; collection-only cost, compiles out
        # entirely when off.
        sem_rcfg = _dc.replace(rcfg, fast=False, rgb=False)
        sem_render = jax.vmap(make_renderer(params, town, sem_rcfg,
                                            camera=cameras[0]))
    from carla_imitation_learning_tpu.sim.world import pick_fresh_packed

    spawn_pool = rollout_spawn_pool(params, town)
    step_batch = jax.vmap(lambda s, c, f: step_env(params, town, s, c, f))
    expert_batch = jax.vmap(lambda s: autopilot_control(params, town, s))
    sensor_batch = jax.vmap(lambda s: sensor_vector(params, s))
    light_batch = jax.vmap(lambda s: traffic_light_state(params, town, s))

    from carla_imitation_learning_tpu.sim.world import navigation_command

    command_batch = jax.vmap(lambda s: navigation_command(params, town, s))

    shield_apply = None
    if shield is not None:
        from carla_imitation_learning_tpu.training.shield import make_shield

        shield_apply = make_shield(town, shield)

    lidar_batch = None
    if lidar_beams > 0:
        from carla_imitation_learning_tpu.render.lidar import make_lidar
        from carla_imitation_learning_tpu.sim.agents import agent_positions

        _scan = make_lidar(town, n_beams=lidar_beams)

        def _lidar_one(state):
            ap, ay = agent_positions(town, state.agents_route, state.agents_s)
            peds = None
            if state.peds_s.shape[0] > 0:
                from carla_imitation_learning_tpu.sim.pedestrians import (
                    ped_positions,
                )
                peds = ped_positions(town, state.peds_crossing, state.peds_s)
            return _scan(state, ap, ay, peds)

        lidar_batch = jax.vmap(_lidar_one)

    # policies may take (obs), (obs, extras) with speed/command/sensor, or
    # (obs, extras, params) — the last re-binds live parameters per rollout
    # call (rollout_fn's policy_params argument) so an RL loop can reuse ONE
    # compiled rollout across training iterations (training/rl.py)
    import inspect

    _n_policy_args = (0 if policy_fn is None
                      else len(inspect.signature(policy_fn).parameters))
    _recurrent = policy_carry_init is not None
    _policy_wants_extras = _n_policy_args >= 2 and not _recurrent
    _policy_wants_params = _n_policy_args >= 3 and not _recurrent
    if control_space not in ("discrete", "continuous"):
        raise ValueError(f"unknown control_space {control_space!r}")
    _continuous = control_space == "continuous"
    if _continuous and _recurrent:
        raise NotImplementedError(
            "continuous control_space with a recurrent policy is not wired "
            "up yet — recurrent policies emit discrete actions")

    def _quantize(gray: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(gray * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    def _views(states) -> jnp.ndarray:
        """(B, H, W, K) uint8 — all rig views of the current step; K=1 for
        the historical single-camera program (extra renders compile out)."""
        v = [_quantize(render_batch(states)["gray"])]
        v += [_quantize(r(states)["gray"]) for r in extra_render]
        return jnp.stack(v, axis=-1)

    @functools.partial(jax.jit, static_argnames=("n_envs",))
    def _init(rng, n_envs: int):
        states = jax.vmap(lambda k: reset_env(params, town, k))(
            jax.random.split(rng, n_envs))
        # warm the frame buffer with the initial view. The buffer is uint8:
        # 4× less HBM traffic on the per-step (B,H,W,fs) window shift, and the
        # policy sees EXACTLY the quantization the offline training frames
        # carry (collect_dataset stores uint8 — train/rollout consistency)
        framebuf = jnp.tile(_views(states), (1, 1, 1, frame_skip))
        base = (states, framebuf, jnp.zeros((n_envs,), bool))
        if _recurrent:
            return base + (policy_carry_init(n_envs),)
        return base

    def init_fn(rng, n_envs: int):
        carry = _init(rng, n_envs)
        if mesh is not None:
            # shard the env axis over the mesh; the scan keeps these shardings,
            # so the whole fleet rollout runs SPMD with no resharding
            from carla_imitation_learning_tpu.parallel.mesh import batch_sharding

            sh = batch_sharding(mesh)
            carry = jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), carry)
        return carry

    def one_step(carry, xs, policy_params=None):
        xs = xs or {}
        steer_noise = xs.get("noise")
        step_key = xs.get("rng")
        if _recurrent:
            states, framebuf, just_reset, pcarry = carry
            # hidden-state reset on env auto-reset — the recurrent analogue
            # of the framebuf refill (fresh episodes start from the init
            # carry, never a dead car's memory)
            pcarry0 = policy_carry_init(just_reset.shape[0])
            pcarry = jax.tree_util.tree_map(
                lambda h, h0: jnp.where(
                    just_reset.reshape((-1,) + (1,) * (h.ndim - 1)), h0, h),
                pcarry, pcarry0)
        else:
            states, framebuf, just_reset = carry
        views = _views(states)                 # (B,H,W,K) uint8
        gray_u8 = views[..., 0]                # the driving view (traj/collect)
        framebuf = update_framebuf(framebuf, views, just_reset)
        # NHWC float obs in [0,1]; the /255 fuses into the policy's first conv
        obs = framebuf.astype(jnp.float32) * (1.0 / 255.0)

        expert = expert_batch(states)
        policy_extra = None
        if policy_fn is None:
            control = expert
            # expert's own action, discretized, is the label
            from carla_imitation_learning_tpu.data.actions import continuous_to_discrete
            action = continuous_to_discrete(
                expert.steer, expert.throttle, expert.brake).astype(jnp.int32)
        elif _recurrent:
            action, pcarry = policy_fn(obs, pcarry)
            action = action.astype(jnp.int32)
            control = control_from_discrete(action)
        else:
            if _policy_wants_extras:
                extras = {"speed": states.ego_v, "command": command_batch(states),
                          "sensor": sensor_batch(states)}
                if step_key is not None:
                    extras["rng"] = step_key
                if _policy_wants_params:
                    res = policy_fn(obs, extras, policy_params)
                else:
                    res = policy_fn(obs, extras)
            else:
                res = policy_fn(obs)
            # policies may return (action, per-env scalar) — e.g. ensemble
            # disagreement for uncertainty-gated DAgger; the scalar is logged
            # into the trajectory as 'policy_extra'
            if isinstance(res, tuple):
                res, policy_extra = res
            if _continuous:
                from carla_imitation_learning_tpu.data.actions import (
                    control_to_discrete_label,
                )
                from carla_imitation_learning_tpu.sim.world import VehicleControl

                ctrl = jnp.clip(res.astype(jnp.float32), -1.0, 1.0)  # (B, 2)
                steer_c, accel_c = ctrl[:, 0], ctrl[:, 1]
                control = VehicleControl(
                    steer=steer_c,
                    throttle=jnp.maximum(accel_c, 0.0),
                    brake=jnp.maximum(-accel_c, 0.0))
                action = control_to_discrete_label(
                    control.steer, control.throttle, control.brake)
            else:
                action = res.astype(jnp.int32)
                control = control_from_discrete(action)

        from carla_imitation_learning_tpu.data.actions import continuous_to_discrete
        expert_action = continuous_to_discrete(
            expert.steer, expert.throttle, expert.brake).astype(jnp.int32)

        shield_on = None
        if shield_apply is not None:
            # emergency-brake layer on the EXECUTED control only; the
            # recorded action labels above stay the policy's own choice
            control, shield_on = shield_apply(states, control)

        clean_steer = None
        if noise is not None:
            # exploration noise on the EXECUTED steer only; labels stay clean
            clean_steer = control.steer
            control = control.replace(
                steer=jnp.clip(control.steer + steer_noise, -1.0, 1.0))

        sensors = sensor_batch(states)
        traffic = light_batch(states)
        command = command_batch(states)
        fresh = jax.vmap(lambda s: pick_fresh_packed(*spawn_pool, s))(states)
        new_states, info = step_batch(states, control, fresh)
        # along-route progress this step (meters): wrapped signed diff of
        # ego_s on the SAME route. Masked to 0 on resets and on route
        # rewrites (lane changes, turn-fan transfers) where the s-coordinate
        # jumps between route frames; those steps are rare (≤ 1/turn_period
        # of steps) so the omission is a small, conservative bias. Feeds the
        # route-arclength completion tier of evaluate_policy.
        total = town.route_total[states.ego_route]
        raw_ds = jnp.mod(new_states.ego_s - states.ego_s + 0.5 * total,
                         total) - 0.5 * total
        same = (new_states.ego_route == states.ego_route) & ~info["done"]
        route_ds = jnp.where(same, raw_ds, 0.0)
        out = {
            "route_ds": route_ds,
            "gray": gray_u8, "action": action, "expert_action": expert_action,
            # the expert's CONTINUOUS controls, logged regardless of who
            # drives — continuous-regression supervision for BC and DAgger
            # (accel = throttle − brake matches the continuous control map)
            "expert_steer": expert.steer,
            "expert_accel": expert.throttle - expert.brake,
            "sensor": sensors, "traffic": traffic, "command": command,
            "collision": info["collision"], "offroad": info["offroad"],
            "done": info["done"], "speed": info["speed"],
            "red_light": info["red_light"], "ran_red": info["ran_red"],
            "arrived": info["arrived"],
            "steer": control.steer, "throttle": control.throttle,
            "brake": control.brake,
        }
        if len(cameras) > 1:
            # full rig views (B,H,W,K) — surround collection consumes the
            # side streams (extra_view_streams) for offline training
            out["views"] = views
        if sem_render is not None:
            out["semantic"] = sem_render(states)["semantic"].astype(jnp.uint8)
        if lidar_batch is not None:
            out["lidar"] = lidar_batch(states)
        if policy_extra is not None:
            out["policy_extra"] = policy_extra
        if clean_steer is not None:
            out["clean_steer"] = clean_steer
        if shield_on is not None:
            out["shield"] = shield_on
        new_carry = (new_states, framebuf, info["done"])
        if _recurrent:
            new_carry = new_carry + (pcarry,)
        return new_carry, out

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def rollout_fn(carry, n_steps: int, policy_params=None):
        xs = {}
        states0 = carry[0]
        if noise is not None:
            n_envs = states0.t.shape[0]
            # fold the fleet's env keys into the schedule seed so each
            # collection rollout (different init rng) draws fresh noise
            key = jax.random.fold_in(
                jax.random.PRNGKey(noise.seed),
                jnp.sum(states0.rng.astype(jnp.uint32)))
            xs["noise"] = _noise_schedule(key, n_steps, n_envs, noise)
        if policy_rng is not None:
            # evolving fold: each rollout from a distinct fleet state samples
            # a distinct action stream. env rng keys only change on auto-reset,
            # so ALSO fold the per-env step counters (they advance every step)
            # — a persistent RL fleet that completes a rollout without any
            # reset must still draw fresh keys next iteration
            key = jax.random.fold_in(
                policy_rng, jnp.sum(states0.rng.astype(jnp.uint32))
                + jnp.sum(states0.t.astype(jnp.uint32)))
            xs["rng"] = jax.random.split(key, n_steps)
        body = functools.partial(one_step, policy_params=policy_params)
        return jax.lax.scan(body, carry, xs or None, length=n_steps)

    return init_fn, rollout_fn


def evaluate_policy(
    params: SimParams, town: TownMap, rcfg: RenderConfig,
    policy_fn: Callable | None, rng, n_envs: int = 64, n_steps: int = 200,
    frame_skip: int = 4, mesh=None, policy_carry_init: Callable | None = None,
    control_space: str = "discrete", shield=None,
    cameras: "tuple[str, ...]" = ("camera",),
) -> dict:
    """Driving metrics for a policy (or the expert when policy_fn is None).

    Beyond the raw per-step rates this reports the CARLA-leaderboard-shaped
    composite: per env stream, route completion (driven distance as a
    fraction of the cruise-speed ideal for the horizon, clipped to 1) times
    a multiplicative infraction penalty (0.60^collisions × 0.65^offroads ×
    0.70^red-light-violations — the leaderboard's per-event factors), then
    the mean over streams. A policy that parks forever scores ~0 despite a
    perfect infraction record; a policy that speeds through reds is cut
    multiplicatively — the same failure modes the leaderboard score exists
    to expose. A red-light *violation* is a rising edge of (red light ahead
    in the stop zone) ∧ (speed > 2 m/s): discrete run-the-light events, not
    per-step exposure (exposure is still reported separately).

    Completion is reported two ways: ``route_completion`` uses the odometer
    (∫speed·dt — distance the car moved, on-route or not) while
    ``route_completion_arc`` uses accumulated ALONG-ROUTE arclength
    (per-step wrapped ego_s deltas, ``route_ds`` in the trajectory) — a car
    spinning in place or weaving off-route earns odometer km but ~zero arc
    km, matching the CARLA leaderboard's along-route definition more
    closely. ``driving_score_arc`` is the same composite built on the arc
    completion.
    """
    init_fn, rollout_fn = make_rollout(params, town, rcfg, policy_fn, frame_skip,
                                       mesh=mesh,
                                       policy_carry_init=policy_carry_init,
                                       control_space=control_space,
                                       shield=shield, cameras=cameras)
    carry = init_fn(rng, n_envs)
    _, traj = rollout_fn(carry, n_steps)
    steps = n_envs * n_steps
    speed = np.asarray(traj["speed"], np.float64)    # (T, B)
    coll = np.asarray(traj["collision"], bool)
    off = np.asarray(traj["offroad"], bool)
    red = np.asarray(traj["red_light"], bool)
    done = np.asarray(traj["done"], bool)
    km_env = speed.sum(axis=0) * params.dt / 1000.0  # (B,) km per env stream
    km = float(km_env.sum())
    if "ran_red" in traj:
        # true stop-line crossings on red (sim/world.py step_env) — the
        # leaderboard's event, not the old exposure-edge proxy that charged
        # a braking car the instant a light ahead turned
        ran_red = np.asarray(traj["ran_red"], bool)
    else:
        viol = red & (speed > 2.0)
        ran_red = viol & ~np.vstack([np.zeros((1, n_envs), bool), viol[:-1]])

    def per_km(count: float) -> float | None:
        if km > 0:
            return count / km
        # N infractions over ~zero km: rate is unbounded — None keeps every
        # consumer strict-JSON safe (json.dumps(inf) emits the non-standard
        # `Infinity` token, which jq / JS JSON.parse reject)
        return None if count else 0.0

    ideal_km = n_steps * params.dt * params.target_speed / 1000.0
    completion = np.clip(km_env / ideal_km, 0.0, 1.0)
    # along-route tier: per-step wrapped ego_s deltas accumulated per env
    # (negative totals — a car that netted backward progress — clip to 0)
    route_km_env = np.clip(
        np.asarray(traj["route_ds"], np.float64).sum(axis=0), 0.0, None
    ) / 1000.0
    arc_completion = np.clip(route_km_env / ideal_km, 0.0, 1.0)
    penalty = (0.60 ** coll.sum(0)) * (0.65 ** off.sum(0)) \
        * (0.70 ** ran_red.sum(0))
    # comfort tier: mean per-step |Δ commanded steer| (rad of wheel command
    # per step), masked across auto-resets — a bang-bang discrete policy
    # saturates this where a continuous one glides (the CARLA leaderboard's
    # comfort criteria measure the same failure mode via accelerations)
    steer_cmd = np.asarray(traj["steer"], np.float64)      # (T, B)
    dsteer = np.abs(np.diff(steer_cmd, axis=0))
    valid = ~done[:-1]                                     # reset boundaries
    steer_rate = float((dsteer * valid).sum() / max(valid.sum(), 1))
    out = {
        "mean_speed": float(speed.mean()),
        "steer_rate": steer_rate,
        "collisions_per_1k_steps": float(coll.sum()) / steps * 1000,
        "offroad_per_1k_steps": float(off.sum()) / steps * 1000,
        "episodes_ended": int(done.sum()),
        "red_light_exposure": float(red.mean()),
        "action_agreement": float((traj["action"] == traj["expert_action"]).mean()),
        "env_steps": steps,
        # CARLA-leaderboard-style normalized tier
        "km_driven": km,
        "collisions_per_km": per_km(float(coll.sum())),
        "offroad_per_km": per_km(float(off.sum())),
        "red_violations_per_km": per_km(float(ran_red.sum())),
        # fraction of env streams with zero collision/offroad events — NOT a
        # task-success measure: a parked policy is trivially "clean" (its
        # driving_score is ~0 instead). Renamed from the round-1..4 reports'
        # misleading ``success_rate``.
        "clean_episode_rate": float((~(coll.any(0) | off.any(0))).mean()),
        "mean_episode_steps": steps / (int(done.sum()) + n_envs),
        "route_completion": float(completion.mean()),
        "driving_score": float((completion * penalty).mean()),
        "route_km": float(route_km_env.sum()),
        "route_completion_arc": float(arc_completion.mean()),
        "driving_score_arc": float((arc_completion * penalty).mean()),
    }
    if "shield" in traj:
        interventions = float(np.asarray(traj["shield"], bool).sum())
        out["shield_interventions_per_km"] = per_km(interventions)
        out["shield_active_frac"] = interventions / steps
    return out


def assign_goals(carry, goal_ids):
    """Give each env of a rollout carry a navigation goal: ``goal_ids`` (B,)
    indexes ``town.nav_goals`` (baked by sim/planner.plan_to_goals); −1 keeps
    that env free-roam (bit-identical to the pre-goal behavior)."""
    states = carry[0].replace(goal=jnp.asarray(goal_ids, jnp.int32))
    return (states,) + tuple(carry[1:])


def evaluate_routes(
    params: SimParams, town: TownMap, rcfg: RenderConfig,
    policy_fn: Callable | None, rng, n_envs: int = 64, n_steps: int = 600,
    frame_skip: int = 4, mesh=None, control_space: str = "discrete",
    goal_ids=None, cameras: "tuple[str, ...]" = ("camera",),
) -> dict:
    """Destination-based (A→B) driving evaluation — the CARLA leaderboard's
    actual task shape: each env gets a GOAL (``goal_ids`` (B,), default
    round-robin over ``town.nav_goals``, baked by sim/planner.plan_to_goals
    — pass the collection's assignment to score the exact trained
    distribution), the planner's
    tables steer the route plan, and the score is about REACHING the
    destination — arrival rate over attempted episodes, steps per arrival,
    infractions per km — rather than open-ended cruising. Requires a town
    with nav tables; the whole fleet still runs as one jitted scan (goal
    routing is pure gathers; arrivals auto-reset and re-attempt).

    An episode "attempt" ends in exactly one of: arrival (success), crash /
    off-road (failure), timeout, or unreachable-spawn respawn (excluded —
    the spawn, not the driver, failed; they are ended at t=1 with no steps
    driven). The trailing unfinished episode of each env is not counted.
    """
    if town.nav_goals is None:
        raise ValueError("evaluate_routes needs a town with nav tables "
                         "(sim/planner.plan_to_goals)")
    init_fn, rollout_fn = make_rollout(params, town, rcfg, policy_fn,
                                       frame_skip, mesh=mesh,
                                       control_space=control_space,
                                       cameras=cameras)
    carry = init_fn(rng, n_envs)
    n_goals = int(town.nav_goals.shape[0])
    if goal_ids is None:
        goal_ids = jnp.arange(n_envs, dtype=jnp.int32) % n_goals
    carry = assign_goals(carry, jnp.asarray(goal_ids, jnp.int32))
    _, traj = rollout_fn(carry, n_steps)

    done = np.asarray(traj["done"], bool)          # (T, B)
    arrived = np.asarray(traj["arrived"], bool)
    coll = np.asarray(traj["collision"], bool)
    off = np.asarray(traj["offroad"], bool)
    speed = np.asarray(traj["speed"], np.float64)
    km = float(speed.sum() * params.dt / 1000.0)

    arrivals = crashes = timeouts = 0
    steps_to_arrival = []
    for b in range(done.shape[1]):
        start = 0
        for t in np.nonzero(done[:, b])[0]:
            length = int(t) - start + 1
            start = int(t) + 1
            if arrived[t, b]:
                arrivals += 1
                steps_to_arrival.append(length)
            elif coll[t, b] or off[t, b]:
                crashes += 1
            elif length > 1:
                timeouts += 1
            # length == 1 and no infraction → unreachable-spawn respawn
    attempts = arrivals + crashes + timeouts
    # infractions are crash EPISODES, not raw flag-steps: a single impact at
    # a road edge sets collision AND offroad the same step and must count once
    failed = crashes
    return {
        "goals": n_goals,
        "attempts": int(attempts),
        "arrivals": int(arrivals),
        "arrival_rate": float(arrivals / attempts) if attempts else 0.0,
        "crashes": int(crashes),
        "timeouts": int(timeouts),
        "mean_steps_to_arrival": (float(np.mean(steps_to_arrival))
                                  if steps_to_arrival else None),
        "mean_seconds_to_arrival": (float(np.mean(steps_to_arrival))
                                    * params.dt if steps_to_arrival else None),
        "km_driven": km,
        "arrivals_per_km": float(arrivals / km) if km > 0 else None,
        "infractions_per_km": float(failed / km) if km > 0 else None,
        "env_steps": int(done.size),
    }


def semantic_stream(traj) -> np.ndarray:
    """Env-major (B·T, H, W) uint8 per-pixel semantic class ids of the
    driving view (``traj["semantic"]`` exists when the rollout was built
    with ``record_semantic=True``) — frame-aligned with the FrameStore the
    same collection wrote, so a seg-head loader can gather labels with the
    store's own window starts."""
    sem = traj["semantic"]  # (T, B, H, W)
    return np.asarray(jnp.swapaxes(sem, 0, 1).reshape((-1,) + sem.shape[2:]))


def extra_view_streams(traj) -> "list[np.ndarray]":
    """Env-major (B·T, H, W) uint8 streams for rig views 1..K−1 of a
    surround collection (``traj["views"]`` exists when make_rollout got >1
    camera) — exactly the ``extra_frames`` list DeviceDataset stacks
    camera-minor alongside the base store, matching the rollout framebuf's
    time-major/camera-minor channel layout (update_framebuf)."""
    views = traj["views"]  # (T, B, H, W, K)
    k_total = views.shape[-1]
    return [np.asarray(jnp.swapaxes(views[..., k], 0, 1)
                       .reshape((-1,) + views.shape[2:4]))
            for k in range(1, k_total)]


def collect_dataset(
    params: SimParams, town: TownMap, rcfg: RenderConfig, rng,
    n_envs: int = 16, n_steps: int = 256, frame_skip: int = 4,
    policy_fn: Callable | None = None,
    noise: NoiseConfig | None = None,
    control_space: str = "discrete",
    goal_ids=None,
    cameras: "tuple[str, ...]" = ("camera",),
    record_semantic: bool = False,
):
    """Rollouts → FrameStore (frames packed uint8 + expert labels + sensors).

    With policy_fn=None this is expert data collection (the on-device
    equivalent of the reference's CARLA autopilot logging). With a policy it
    is the DAgger aggregation step: the POLICY drives, the EXPERT labels.
    Episode boundaries are respected: frames are laid out env-major and
    ``store.starts`` marks every env-stream start and auto-reset, which
    DeviceDataset uses to never sample a window across a boundary.

    ``noise`` enables CIL-style exploration impulses on the executed steering
    (NoiseConfig): the car visits recovery states, but the state log records
    the CLEAN driver steer, so labels re-derived from the raw-log contract
    (continous_to_discreet over state.csv columns,
    imitation_dataset.py:317-339) match ``store.actions`` exactly — the same
    noise-free-supervision convention CARLA CIL collection used.

    ``goal_ids`` (B,) makes collection GOAL-DIRECTED (the town must carry
    nav tables, sim/planner.plan_to_goals): each env drives to a destination,
    so the command channel records the PLANNER's announced turns — the
    training distribution a command-conditioned (CIL) policy needs to later
    navigate routes itself (evaluate_routes). Arrivals auto-reset and
    re-attempt; the episode-start bitmap marks them like any reset.
    """
    from carla_imitation_learning_tpu.data.frame_log import StateLog
    from carla_imitation_learning_tpu.data.pipeline import FrameStore

    init_fn, rollout_fn = make_rollout(params, town, rcfg, policy_fn, frame_skip,
                                       noise=noise, control_space=control_space,
                                       cameras=cameras,
                                       record_semantic=record_semantic)
    carry = init_fn(rng, n_envs)
    if goal_ids is not None:
        carry = assign_goals(carry, goal_ids)
    _, traj = rollout_fn(carry, n_steps)

    # (T,B,...) → env-major (B*T, ...) so each env's stream is contiguous
    def flat(x):
        return np.asarray(jnp.swapaxes(x, 0, 1).reshape((-1,) + x.shape[2:]))

    frames_u8 = flat(traj["gray"])  # already uint8 from the rollout
    state = StateLog(
        steer=flat(traj.get("clean_steer", traj["steer"])).astype(np.float64),
        throttle=flat(traj["throttle"]).astype(np.float64),
        brake=flat(traj["brake"]).astype(np.float64),
        trafficlight=flat(traj["traffic"]).astype(np.float64),
        current_steer=flat(traj["sensor"])[:, 0].astype(np.float64),
        speed_long=flat(traj["sensor"])[:, 1].astype(np.float64),
        speed=flat(traj["sensor"])[:, 2].astype(np.float64),
    )
    # episode starts: each env stream's first frame + the frame after every
    # auto-reset, so datasets never sample a window across a boundary
    done_flat = flat(traj["done"]).astype(bool)
    starts = np.zeros(n_envs * n_steps, bool)
    starts[::n_steps] = True
    starts[1:] |= done_flat[:-1]
    store = FrameStore(
        frames=frames_u8,
        actions=flat(traj["expert_action"]).astype(np.int32),
        traffic=flat(traj["traffic"]).astype(np.int32),
        sensors=flat(traj["sensor"]).astype(np.float32),
        commands=flat(traj["command"]).astype(np.int32),
        starts=starts,
        controls=np.stack(
            [flat(traj["expert_steer"]).astype(np.float32),
             flat(traj["expert_accel"]).astype(np.float32)], axis=1),
    )
    return store, state, traj


def collect_multicamera(
    params: SimParams, town: TownMap, rcfg: RenderConfig, rng,
    cameras=("camera", "FL", "FR", "SL", "SR", "RR"),
    n_envs: int = 8, n_steps: int = 128,
):
    """Expert rollouts rendered from a full CARLA-style camera rig.

    → (frames: {camera: (B·T, H, W) uint8}, state_log) — the multi-camera raw
    log the reference's VAE paths consume (vae_dataset.py:90-92 FL/FR/RR/SL/SR).
    One sim trajectory, re-rendered per view inside a single jit'd scan.
    """
    import functools as _ft

    from carla_imitation_learning_tpu.data.frame_log import StateLog
    from carla_imitation_learning_tpu.sim.world import (
        make_spawn_pool, pack_spawn_pool, pick_fresh_packed,
    )

    renders = {c: jax.vmap(make_renderer(params, town, rcfg, camera=c))
               for c in cameras}
    # spawn-pooled auto-resets, same as make_rollout: without a pool every
    # env pays reset_env's PRNG splits EVERY step (world.py docstring)
    spawn_pool = pack_spawn_pool(
        make_spawn_pool(params, town, jax.random.PRNGKey(0x5EED), 1024))
    step_batch = jax.vmap(lambda s, c, f: step_env(params, town, s, c, f))
    expert_batch = jax.vmap(lambda s: autopilot_control(params, town, s))
    sensor_batch = jax.vmap(lambda s: sensor_vector(params, s))
    light_batch = jax.vmap(lambda s: traffic_light_state(params, town, s))

    def one_step(states, _):
        views = {c: jnp.clip(r(states)["gray"] * 255.0 + 0.5, 0, 255
                             ).astype(jnp.uint8) for c, r in renders.items()}
        expert = expert_batch(states)
        sensors = sensor_batch(states)
        traffic = light_batch(states)
        fresh = jax.vmap(lambda s: pick_fresh_packed(*spawn_pool, s))(states)
        new_states, info = step_batch(states, expert, fresh)
        return new_states, {"views": views, "steer": expert.steer,
                            "throttle": expert.throttle, "brake": expert.brake,
                            "sensor": sensors, "traffic": traffic,
                            "done": info["done"]}

    @_ft.partial(jax.jit, static_argnames=("n_steps",))
    def run(states, n_steps: int):
        return jax.lax.scan(one_step, states, None, length=n_steps)

    states = jax.vmap(lambda k: reset_env(params, town, k))(
        jax.random.split(rng, n_envs))
    _, traj = run(states, n_steps)

    def flat(x):
        return np.asarray(jnp.swapaxes(x, 0, 1).reshape((-1,) + x.shape[2:]))

    frames = {c: flat(v) for c, v in traj["views"].items()}
    state_log = StateLog(
        steer=flat(traj["steer"]).astype(np.float64),
        throttle=flat(traj["throttle"]).astype(np.float64),
        brake=flat(traj["brake"]).astype(np.float64),
        trafficlight=flat(traj["traffic"]).astype(np.float64),
        current_steer=flat(traj["sensor"])[:, 0].astype(np.float64),
        speed_long=flat(traj["sensor"])[:, 1].astype(np.float64),
        speed=flat(traj["sensor"])[:, 2].astype(np.float64),
    )
    # episode starts, exactly as collect_dataset: env-stream firsts + the
    # frame after every auto-reset — packed framestores carry this bitmap so
    # windowed consumers never span a crash-and-respawn
    done_flat = flat(traj["done"]).astype(bool)
    starts = np.zeros(n_envs * n_steps, bool)
    starts[::n_steps] = True
    starts[1:] |= done_flat[:-1]
    return frames, state_log, starts


def dagger_iteration(
    params: SimParams, town: TownMap, rcfg: RenderConfig,
    policy_fn: Callable, rng, n_envs: int = 16, n_steps: int = 256,
    frame_skip: int = 4, noise: NoiseConfig | None = None,
    control_space: str = "discrete", goal_ids=None,
    cameras: "tuple[str, ...]" = ("camera",),
):
    """One DAgger round: policy drives, expert labels → aggregation store.
    ``noise`` adds exploration impulses on top of the policy's steering —
    labels are the expert's regardless. ``control_space="continuous"`` lets
    a continuous policy drive; the aggregation store's discrete ``actions``
    AND continuous ``controls`` labels both stay the expert's. ``goal_ids``
    makes the round goal-directed (nav-table town): the POLICY attempts the
    routes, so aggregation covers exactly the states a navigating policy
    visits — on-policy A→B data."""
    return collect_dataset(params, town, rcfg, rng, n_envs, n_steps, frame_skip,
                           policy_fn=policy_fn, noise=noise,
                           control_space=control_space, goal_ids=goal_ids,
                           cameras=cameras)
