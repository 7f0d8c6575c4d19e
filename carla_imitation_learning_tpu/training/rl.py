"""On-device PPO fine-tuning of driving policies — fully beyond the reference.

The reference is imitation-only (BC from CARLA logs); its closed loop exists
in another process entirely. Here the 100k+ env-steps/s on-device fleet
(training/closed_loop.py) makes reinforcement-learning fine-tuning on the
REAL objective — the leaderboard-shaped driving score — practical on one
chip: rollout, reward, GAE, and the clipped-surrogate updates are all XLA
programs; one training iteration is two device dispatches (rollout scan +
update scan) with no host work between steps.

Design notes (TPU-first):
- The PPO rollout IS ``make_rollout`` — the same scan the collector and the
  evaluator use — driven by a stochastic actor via its per-step RNG stream
  (``policy_rng``); logprob/value ride the existing ``policy_extra`` channel.
  So the fine-tuned policy trains against exactly the physics/renderer it is
  evaluated on, at rollout speed (no second sim path to maintain).
- Observations are NOT stored 4× over: the trajectory already carries every
  rendered frame (``traj["gray"]``, uint8) and the episode boundaries
  (``done``); the update phase reconstructs each step's 4-frame window with
  the exact ``update_framebuf`` semantics (slide, refill on reset) via
  gathers — ``window_sources`` below. 4× less HBM for the replay buffer.
- Rewards come from the same signals the evaluator scores: along-route
  progress (``route_ds``) minus collision / red-light-violation / offroad
  penalties. Optimizing it is optimizing the driving-score numerator and
  penalty factors directly.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from carla_imitation_learning_tpu.models.cnn import ConvTrunk, MLPHead


class ActorCriticCNN(nn.Module):
    """PolicyCNN trunk + twin heads. Submodule names (ConvTrunk_0, MLPHead_0)
    deliberately match PolicyCNN's so a BC checkpoint warm-starts the actor
    branch by direct key copy (``warm_start_from_policy``); the critic head
    (MLPHead_1) is fresh.

    ``continuous=True`` swaps the categorical head for a diagonal-Gaussian
    continuous actor over (steer, accel): the mean is ``tanh(MLPHead)`` —
    EXACTLY ContinuousPolicyCNN's output, so a bc_continuous checkpoint
    warm-starts it with the same key copy — plus a state-independent
    learned ``log_std`` (fresh at warm start). Actor output becomes
    ``((mean, log_std), value)``."""

    obs_size: int = 4
    n_actions: int = 9
    dtype: jnp.dtype = jnp.bfloat16
    s2d_stem: bool = False  # match PolicyCNN's stem variant for warm starts
    continuous: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feat = ConvTrunk(dtype=self.dtype, s2d_stem=self.s2d_stem)(x)
        if self.continuous:
            mean = jnp.tanh(MLPHead((64, 32, 2), dtype=self.dtype)(feat))
            log_std = self.param(
                "log_std", lambda k: jnp.full((2,), -0.7, jnp.float32))
            value = MLPHead((64, 32, 1), dtype=self.dtype)(feat)
            return (mean.astype(jnp.float32), log_std), jnp.squeeze(value, -1)
        logits = MLPHead((64, 32, self.n_actions), dtype=self.dtype)(feat)
        value = MLPHead((64, 32, 1), dtype=self.dtype)(feat)
        return logits, jnp.squeeze(value, -1)

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
        return jnp.zeros((batch, height, width, self.obs_size), jnp.float32)


def warm_start_from_policy(ac_params: dict, policy_params: dict) -> dict:
    """Copy a trained PolicyCNN's trunk + action head into ActorCritic params
    (critic head stays at its fresh init)."""
    out = dict(ac_params)
    out["ConvTrunk_0"] = policy_params["ConvTrunk_0"]
    out["MLPHead_0"] = policy_params["MLPHead_0"]
    return out


def actor_policy_params_from(ac_params: dict) -> dict:
    """Project ActorCritic params back to a PolicyCNN params tree (for
    evaluate_policy / export / checkpoints shared with the BC world)."""
    return {"ConvTrunk_0": ac_params["ConvTrunk_0"],
            "MLPHead_0": ac_params["MLPHead_0"]}


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    # reward weights: progress is meters along route per step; penalties are
    # per discrete event, scaled so one collision cancels ~25 m of progress
    w_progress: float = 1.0
    w_collision: float = 25.0
    w_red: float = 10.0
    w_offroad: float = 10.0
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    update_epochs: int = 4
    num_minibatches: int = 8
    learning_rate: float = 3e-4
    max_grad_norm: float = 0.5
    normalize_advantages: bool = True


def reward_from_traj(traj: dict, cfg: PPOConfig) -> jnp.ndarray:
    """(T, B) dense reward from the rollout's own scored signals.

    A red-light VIOLATION is the same DISCRETE event the evaluator
    penalizes: a true stop-line crossing on red (``traj["ran_red"]``,
    sim/world.py) — one multiplicative 0.70 factor each in evaluate_policy —
    so one crossing costs w_red once, keeping the penalty calibration
    comparable to collisions/offroads, which terminate the episode and are
    genuinely one-step flags. (Pre-ran_red trajectories fall back to the
    old exposure-edge proxy.)"""
    if "ran_red" in traj:
        edge = traj["ran_red"]
    else:
        viol = traj["red_light"] & (traj["speed"] > 2.0)
        prev = jnp.concatenate(
            [jnp.zeros_like(viol[:1]), viol[:-1]], axis=0)
        edge = viol & ~prev
    return (cfg.w_progress * traj["route_ds"]
            - cfg.w_collision * traj["collision"].astype(jnp.float32)
            - cfg.w_red * edge.astype(jnp.float32)
            - cfg.w_offroad * traj["offroad"].astype(jnp.float32))


def compute_gae(rewards: jnp.ndarray, values: jnp.ndarray,
                dones: jnp.ndarray, last_value: jnp.ndarray,
                gamma: float, lam: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized advantage estimation over (T, B) arrays.

    ``dones[t]`` marks transitions that ENDED an episode (the fleet
    auto-resets next step), so bootstrap is cut there. Returns
    (advantages (T,B), returns (T,B))."""
    def step(carry, x):
        gae_next, value_next = carry
        reward, value, done = x
        nonterminal = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * value_next * nonterminal - value
        gae = delta + gamma * lam * nonterminal * gae_next
        return (gae, value), gae

    (_, _), adv = jax.lax.scan(
        step, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return adv, adv + values


def window_sources(dones: jnp.ndarray, frame_skip: int = 4) -> jnp.ndarray:
    """(T, B) dones → (T, B, frame_skip) source-frame indices that rebuild
    each step's observation window from the stored per-step frames.

    Mirrors ``update_framebuf`` exactly: the window at step t is frames
    [t-k+1..t] sliding, except a reset at step s (done[s-1], i.e. the
    window REFILL the rollout applies) floors every source at s; the
    rollout start (t=0) floors at 0 — PPO rollouts begin with a forced
    refill (see ppo_train) so the floor is exact, not an approximation.
    Channel order matches the framebuf: oldest first, newest last."""
    T, B = dones.shape
    t_idx = jnp.arange(T)[:, None]
    # just_reset[t] = done[t-1]; refill step index where it happens, else 0
    just_reset = jnp.concatenate(
        [jnp.ones((1, B), bool), dones[:-1]], axis=0)
    refill_at = jnp.where(just_reset, t_idx, 0)
    floor = jax.lax.cummax(refill_at, axis=0)          # (T, B)
    offsets = jnp.arange(frame_skip - 1, -1, -1)        # oldest..newest
    src = t_idx[..., None] - offsets[None, None, :]     # (T, B, k)
    return jnp.maximum(src, floor[..., None])


def gather_windows(gray: jnp.ndarray, src: jnp.ndarray,
                   flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather observation windows for flat transition indices.

    gray (T, B, H, W) uint8; src (T, B, k) from window_sources;
    flat_idx (m,) over t·B+b. Returns (m, H, W, k) float32 in [0, 1]."""
    B = gray.shape[1]
    t, b = flat_idx // B, flat_idx % B
    s = src[t, b]                                   # (m, k)
    w = gray[s, b[:, None]]                         # (m, k, H, W)
    return jnp.transpose(w, (0, 2, 3, 1)).astype(jnp.float32) * (1.0 / 255.0)


_LOG_2PI = 1.8378770664093453


def gaussian_logp(a: jnp.ndarray, mean: jnp.ndarray,
                  log_std: jnp.ndarray) -> jnp.ndarray:
    """Σ_d log N(a_d | μ_d, σ_d) over the last axis."""
    z = (a - mean) * jnp.exp(-log_std)
    return (-0.5 * (z * z + _LOG_2PI) - log_std).sum(axis=-1)


def make_actor(model: ActorCriticCNN, sample: bool = True) -> Callable:
    """policy_fn(obs, extras, params) for make_rollout's params-rebinding
    convention: draws an action with the rollout's per-step key
    (``extras["rng"]``) and logs what the update needs through the
    policy_extra channel — so ONE compiled rollout serves every training
    iteration with live params. ``sample=False`` gives the deterministic
    (argmax / mean) actor.

    Discrete: softmax sample, extra = (logprob, value) (B, 2).
    Continuous (``model.continuous``): diagonal-Gaussian sample around the
    tanh mean, extra = (raw_a0, raw_a1, logprob, value) (B, 4) — the RAW
    (unclipped) sample rides the extra channel because the executed control
    is clipped to the unit square by the rollout, and PPO ratios must be
    computed on what was actually drawn. Pair with
    ``control_space="continuous"``."""

    if model.continuous:
        def policy_fn(obs, extras, params):
            (mean, log_std), value = model.apply({"params": params}, obs)
            if sample:
                eps = jax.random.normal(extras["rng"], mean.shape)
                raw = mean + jnp.exp(log_std) * eps
            else:
                raw = mean
            lp = gaussian_logp(raw, mean, log_std)
            extra = jnp.concatenate(
                [raw, jnp.stack([lp, value.astype(jnp.float32)], axis=-1)],
                axis=-1)
            return raw, extra

        return policy_fn

    def policy_fn(obs, extras, params):
        logits, value = model.apply({"params": params}, obs)
        if sample:
            action = jax.random.categorical(extras["rng"], logits, axis=-1)
        else:
            action = jnp.argmax(logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.take_along_axis(logp, action[:, None], axis=-1)[:, 0]
        return action.astype(jnp.int32), jnp.stack(
            [lp, value.astype(jnp.float32)], axis=-1)

    return policy_fn


def make_ppo_update(model: ActorCriticCNN, tx, cfg: PPOConfig,
                    frame_skip: int = 4):
    """Build the jitted PPO update: epochs × minibatches of clipped-surrogate
    steps over one rollout's transitions — minibatches stratified by env so
    the whole update is SPMD-clean (see the comment at the sampling site),
    observation windows gathered on device from the stored frames."""

    def loss_fn(params, obs, action, old_logp, adv, ret, old_value):
        if model.continuous:
            (mean, log_std), value = model.apply({"params": params}, obs)
            logp = gaussian_logp(action, mean, log_std)
            # diagonal-Gaussian entropy, closed form (state-independent)
            entropy = (log_std + 0.5 * (1.0 + _LOG_2PI)).sum()
        else:
            logits, value = model.apply({"params": params}, obs)
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(
                logp_all, action[:, None], axis=-1)[:, 0]
            entropy = -jnp.mean(
                jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
        ratio = jnp.exp(logp - old_logp)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        # clipped value loss (PPO2 form)
        v_clip = old_value + jnp.clip(value - old_value,
                                      -cfg.clip_eps, cfg.clip_eps)
        v_loss = 0.5 * jnp.mean(jnp.maximum((value - ret) ** 2,
                                            (v_clip - ret) ** 2))
        total = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
        stats = {
            "pg_loss": pg_loss, "value_loss": v_loss, "entropy": entropy,
            "approx_kl": jnp.mean(old_logp - logp),
            "clip_frac": jnp.mean((jnp.abs(ratio - 1) > cfg.clip_eps)
                                  .astype(jnp.float32)),
        }
        return total, stats

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, traj, last_value, rng):
        T, B = traj["action"].shape[:2]
        H, W = traj["gray"].shape[2:]
        rewards = reward_from_traj(traj, cfg)
        # extra channel: (logprob, value) discrete; (a0, a1, logprob, value)
        # continuous — the RAW Gaussian draw (pre-clip), see make_actor
        extra = traj["policy_extra"]                     # (T, B, 2|4)
        old_logp, values = extra[..., -2], extra[..., -1]
        act_field = (extra[..., :2] if model.continuous
                     else traj["action"])                # (T, B[, 2])
        adv, ret = compute_gae(rewards, values, traj["done"], last_value,
                               cfg.gamma, cfg.gae_lambda)
        if cfg.normalize_advantages:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        src = window_sources(traj["done"], frame_skip)

        # Minibatches are STRATIFIED BY ENV (each env contributes mt random
        # steps per minibatch, a per-env no-replacement permutation over the
        # epoch) so every gather is batched over the env axis — under a mesh
        # sharded on B each device reads only its own envs' frames, and the
        # only collective per step is the gradient all-reduce (the same
        # SPMD-clean shape as online_dagger.sample_windows).
        mt = T // cfg.num_minibatches
        if mt == 0:
            raise ValueError(
                f"rollout_steps={T} < num_minibatches={cfg.num_minibatches}")
        fields = {"action": act_field, "old_logp": old_logp,
                  "adv": adv, "ret": ret, "old_value": values}  # (T, B[, d])

        def epoch(carry, key):
            params, opt_state = carry
            perm_t = jax.vmap(lambda k: jax.random.permutation(k, T))(
                jax.random.split(key, B))               # (B, T)
            perm = perm_t[:, :mt * cfg.num_minibatches].reshape(
                B, cfg.num_minibatches, mt).transpose(1, 0, 2)  # (M, B, mt)

            def minibatch(carry, t_sel):                # t_sel (B, mt)
                params, opt_state = carry

                def per_env(gray_b, src_b, f_b, t_row):
                    s = src_b[t_row]                    # (mt, k)
                    return gray_b[s], {k: v[t_row] for k, v in f_b.items()}

                w, f = jax.vmap(per_env, in_axes=(1, 1, 1, 0))(
                    traj["gray"], src, fields, t_sel)   # w (B, mt, k, H, W)
                obs = jnp.transpose(w, (0, 1, 3, 4, 2)).reshape(
                    B * mt, H, W, frame_skip).astype(jnp.float32) * (1.0 / 255.0)
                f = {k: v.reshape((B * mt,) + v.shape[2:])
                     for k, v in f.items()}
                (loss, stats), grads = grad_fn(
                    params, obs, f["action"], f["old_logp"],
                    f["adv"], f["ret"], f["old_value"])
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates)
                stats["loss"] = loss
                return (params, opt_state), stats

            return jax.lax.scan(minibatch, (params, opt_state), perm)

        (params, opt_state), stats = jax.lax.scan(
            epoch, (params, opt_state),
            jax.random.split(rng, cfg.update_epochs))
        metrics = {k: jnp.mean(v) for k, v in stats.items()}
        metrics["reward_per_step"] = jnp.mean(rewards)
        metrics["progress_m_per_step"] = jnp.mean(traj["route_ds"])
        metrics["value_mean"] = jnp.mean(values)
        # compliance telemetry: is the optimizer buying progress with
        # infractions? (the round-5 PPO-vs-expert adjudication signal)
        if "ran_red" in traj:
            metrics["ran_red_per_1k_steps"] = 1e3 * jnp.mean(
                traj["ran_red"].astype(jnp.float32))
        metrics["collisions_per_1k_steps"] = 1e3 * jnp.mean(
            traj["collision"].astype(jnp.float32))
        return params, opt_state, metrics

    return update


def ppo_train(
    sim_params, town, rcfg, model: ActorCriticCNN, params, tx, opt_state,
    rng, *, n_envs: int, rollout_steps: int, iterations: int,
    cfg: PPOConfig | None = None, frame_skip: int = 4, mesh=None,
    on_iteration: Callable | None = None,
):
    """Run PPO: alternate fleet rollouts (persistent env state) and update
    scans. Returns (params, opt_state, history list of per-iteration metric
    dicts). ``on_iteration(i, metrics)`` is called with host floats."""
    from carla_imitation_learning_tpu.training import closed_loop as cl

    cfg = cfg or PPOConfig()
    actor = make_actor(model, sample=True)
    rng, init_rng, policy_rng = jax.random.split(rng, 3)

    init_fn, rollout_fn = cl.make_rollout(
        sim_params, town, rcfg, actor, frame_skip, mesh=mesh,
        policy_rng=policy_rng,
        control_space="continuous" if model.continuous else "discrete")
    update = make_ppo_update(model, tx, cfg, frame_skip)
    carry = init_fn(init_rng, n_envs)

    @jax.jit
    def bootstrap_value(params, carry):
        """V(s_{T+1}) approximation from the final carry's window (one frame
        short of what step T+1 would render — a second render dispatch isn't
        worth the bias), zeroed where the last step ended an episode (the
        GAE nonterminal mask cuts those bootstraps anyway)."""
        states, framebuf, just_reset = carry
        obs = framebuf.astype(jnp.float32) * (1.0 / 255.0)
        _, value = model.apply({"params": params}, obs)
        return jnp.where(just_reset, 0.0, value.astype(jnp.float32))

    history = []
    for i in range(iterations):
        t0 = time.perf_counter()
        # force a window refill at rollout start so the update's window
        # reconstruction never needs frames from before this rollout
        states, framebuf, _ = carry
        carry = (states, framebuf, jnp.ones((n_envs,), bool))
        carry, traj = rollout_fn(carry, rollout_steps, policy_params=params)
        last_value = bootstrap_value(params, carry)
        rng, up_rng = jax.random.split(rng)
        params, opt_state, metrics = update(
            params, opt_state, traj, last_value, up_rng)
        # the device_get below is a real completion barrier (fetches values
        # reduced from the updated state), so the wall time is honest
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        host["iteration"] = i
        host["seconds"] = round(time.perf_counter() - t0, 3)
        host["env_steps_per_sec"] = round(
            n_envs * rollout_steps / host["seconds"], 1)
        history.append(host)
        if on_iteration is not None:
            on_iteration(i, host)
    return params, opt_state, history
