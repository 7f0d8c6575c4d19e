"""Fully on-device DAgger: the complete imitate→aggregate→retrain loop as
ONE jitted XLA program.

The host-mediated ``dagger`` experiment (experiments.py) round-trips every
round through a FrameStore: rollout → host numpy → DeviceDataset upload →
per-epoch train scans. That is the right shape for big persistent datasets,
but the DAgger inner loop itself never needs the host: the aggregation
buffer is just device memory, the expert is on-device, and training samples
are gathers. This module compiles the WHOLE algorithm — R rounds of
(β-mixed rollout → buffer append → K sampled train steps) — into a single
XLA program with zero host round-trips, so on a tunneled TPU the entire
DAgger run costs ONE dispatch (the reference's CARLA socket loop pays a
round-trip per frame; even our host-mediated dagger pays ~R×(epochs+2)).

Algorithm (Ross, Gordon & Bagnell, AISTATS 2011): at round r the executed
action is the expert's with probability β_r and the current policy's
otherwise; the stored label is ALWAYS the expert's. β_r = beta**r, so the
default beta=0.0 gives the classic schedule (pure expert at r=0 — 0**0 == 1
— pure policy after); beta>0 anneals. The executed control goes through the
same 9-class discretizer as the labels (data/actions.py — the reference's
continous_to_discreet contract, imitation_dataset.py:317-339), so expert
and policy drive through one control interface and the rollout compiles to
one program for every round.

Aggregation buffer: frames (R, T, B, H, W) uint8 + labels/dones (R, T, B)
live in HBM; round r writes its trajectory grid at index r. Training
samples are (round, t, env) triples gathered directly from the buffer —
windows that would cross an episode boundary (a done inside the trailing
``frame_skip`` frames, the same convention as collect_dataset's starts
bitmap) get ZERO weight in the masked cross-entropy instead of being
resampled, keeping the program free of data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.data.actions import continuous_to_discrete
from carla_imitation_learning_tpu.render.pipeline import RenderConfig, make_renderer
from carla_imitation_learning_tpu.sim.town import TownMap
from carla_imitation_learning_tpu.sim.world import (
    SimParams, autopilot_control, pick_fresh_packed, reset_env, step_env,
)
from carla_imitation_learning_tpu.training.closed_loop import (
    control_from_discrete, rollout_spawn_pool, update_framebuf,
)
from carla_imitation_learning_tpu.training.steps import TrainState


def sample_windows(key, frames, labels, dones, r, k_per_env: int,
                   frame_skip: int, extras: tuple = ()):
    """Draw ``B × k_per_env`` training samples from the aggregation buffer,
    stratified by env: each env stream contributes exactly ``k_per_env``
    windows per step.

    frames (R,T,B,H,W) uint8, labels/dones (R,T,B); only rounds ≤ r are
    eligible. Returns (obs (B·k,H,W,fs) float32 in [0,1], label (B·k,),
    weight (B·k,) float32) — weight is 0 where the window [t-fs+1, t] would
    start before the trajectory or cross a done (an auto-reset between its
    frames), exactly the windows DeviceDataset's starts mask forbids.
    ``extras`` are additional (R, T, B) per-step grids (e.g. the CIL speeds
    and commands) gathered at the SAME window-end (round, t) indices and
    appended flat to the return tuple.

    Stratification is what makes the program SPMD-clean: every gather is
    batched over the env axis (vmap in_axes on B), so when the buffer is
    sharded on B each device reads only ITS OWN envs' frames — no cross-chip
    gathers, and the only collective in the whole train step is the gradient
    all-reduce XLA inserts from the sharding annotations.
    """
    R, T, B = labels.shape
    fs = frame_skip
    kr, kt = jax.random.split(key)
    r_i = jax.random.randint(kr, (B, k_per_env), 0, jnp.minimum(r + 1, R))
    t_i = jax.random.randint(kt, (B, k_per_env), 0, T)

    def per_env(frames_b, labels_b, dones_b, r_row, t_row):
        # frames_b (R,T,H,W), labels_b/dones_b (R,T), r_row/t_row (k,)
        def one(ri, ti):
            # dynamic_slice clamps OOB starts; t<fs-1 is weight-0 anyway
            win = jax.lax.dynamic_slice(
                frames_b, (ri, ti - (fs - 1), 0, 0),
                (1, fs, frames_b.shape[2], frames_b.shape[3]))[0]  # (fs,H,W)
            dwin = jax.lax.dynamic_slice(
                dones_b, (ri, ti - (fs - 1)), (1, fs))[0]          # (fs,)
            # done[t] marks a reset AFTER frame t → a window is torn if any
            # of its first fs-1 frames is followed by a reset
            torn = jnp.any(dwin[:-1])
            ok = (ti >= fs - 1) & ~torn
            obs = jnp.transpose(win, (1, 2, 0)).astype(jnp.float32) / 255.0
            return obs, labels_b[ri, ti], ok.astype(jnp.float32)

        return jax.vmap(one)(r_row, t_row)

    obs, y, w = jax.vmap(per_env, in_axes=(2, 2, 2, 0, 0))(
        frames, labels, dones, r_i, t_i)
    # (B,k,...) → (B·k, ...): env-major, so a B-sharded buffer yields a
    # batch sharded the same way with zero resharding
    flat = lambda a: a.reshape((B * k_per_env,) + a.shape[2:])
    ex = tuple(
        flat(jax.vmap(lambda g, rr, tt: g[rr, tt],
                      in_axes=(2, 0, 0))(g, r_i, t_i))
        for g in extras)
    return (flat(obs), flat(y), flat(w)) + ex


def make_online_dagger(
    model_apply,
    params: SimParams,
    town: TownMap,
    rcfg: RenderConfig,
    n_envs: int,
    n_steps: int,
    rounds: int,
    train_steps: int,
    batch: int,
    frame_skip: int = 4,
    beta: float = 0.0,
    mesh=None,
    cil: bool = False,
    goal_ids=None,
    speed_weight: float = 0.1,
):
    """Build ``run(state: TrainState, rng) -> (state, metrics)`` — one jit.

    ``batch`` is rounded to a multiple of ``n_envs`` (stratified sampling
    draws batch//n_envs windows per env per step, at least one).

    metrics: per-round arrays — ``loss`` (rounds,) mean masked CE over the
    round's train steps, ``agreement`` (rounds,) fraction of rollout steps
    where the EXECUTED action equals the expert's (β_0=1 ⇒ exactly 1.0 at
    round 0), ``valid_frac`` (rounds,) mean sample weight (fraction of drawn
    windows that were trainable).

    ``mesh``: shard the env axis over the mesh's 'data' axis — env state,
    framebuf, the aggregation buffer, AND every training batch shard on B
    (stratified sampling keeps all gathers shard-local), so the single
    program runs SPMD end-to-end with exactly one collective per train step
    (the O(params) gradient all-reduce) and none in the rollout.

    ``cil=True`` makes the whole loop command-conditioned: ``model_apply``
    is BranchedCILPolicy-shaped ((obs, speed, command) → (logits,
    pred_speed)), the buffer additionally records per-step speeds and
    navigation commands, training is masked CE + ``speed_weight``·MSE on the
    speed head (the cil_loss_fn recipe), and the driving policy consumes the
    live command stream. With ``goal_ids`` (B,) on a nav-table town
    (sim/planner.plan_to_goals) every round is GOAL-DIRECTED — the
    imitate→aggregate→retrain A→B loop still compiles to ONE program.
    """
    import dataclasses as _dc

    if rcfg.backend == "pallas" and (rcfg.rgb or not rcfg.fast):
        rcfg = _dc.replace(rcfg, rgb=False, fast=True)
    k_per_env = max(1, batch // n_envs)
    render_batch = jax.vmap(make_renderer(params, town, rcfg))
    spawn_pool = rollout_spawn_pool(params, town)
    step_batch = jax.vmap(lambda s, c, f: step_env(params, town, s, c, f))
    expert_batch = jax.vmap(lambda s: autopilot_control(params, town, s))

    H, W = rcfg.height, rcfg.width

    if cil:
        from carla_imitation_learning_tpu.sim.world import navigation_command

        command_batch = jax.vmap(lambda s: navigation_command(params, town, s))

        def policy_actions(p, obs, speed, command):
            logits, _ = model_apply({"params": p}, obs, speed, command)
            return jnp.argmax(logits, axis=-1)
    else:
        def policy_actions(p, obs, speed, command):
            return jnp.argmax(model_apply({"params": p}, obs), axis=-1)

    def rollout_round(p, states, framebuf, just_reset, key, beta_r):
        """β-mixed rollout: (frames, labels, dones) grids (T,B,...) + the
        advanced env carry + executed-vs-expert agreement."""

        def one_step(carry, _):
            states, framebuf, just_reset, key = carry
            key, km = jax.random.split(key)
            gray_u8 = jnp.clip(render_batch(states)["gray"] * 255.0 + 0.5,
                               0, 255).astype(jnp.uint8)
            framebuf = update_framebuf(framebuf, gray_u8, just_reset)
            obs = framebuf.astype(jnp.float32) * (1.0 / 255.0)

            expert = expert_batch(states)
            expert_action = continuous_to_discrete(
                expert.steer, expert.throttle, expert.brake).astype(jnp.int32)
            speed = states.ego_v
            command = (command_batch(states) if cil
                       else jnp.zeros_like(expert_action))
            pol_action = policy_actions(p, obs, speed, command)
            use_expert = jax.random.bernoulli(km, beta_r, (obs.shape[0],))
            action = jnp.where(use_expert, expert_action, pol_action)

            fresh = jax.vmap(lambda s: pick_fresh_packed(*spawn_pool, s))(states)
            new_states, info = step_batch(states, control_from_discrete(action),
                                          fresh)
            out = {"gray": gray_u8, "label": expert_action,
                   "done": info["done"],
                   "agree": (action == expert_action),
                   "speed": speed, "command": command}
            return (new_states, framebuf, info["done"], key), out

        carry, traj = jax.lax.scan(
            one_step, (states, framebuf, just_reset, key), None, length=n_steps)
        return carry, traj

    def train_on_buffer(state: TrainState, key, frames, labels, dones, r,
                        speeds=None, commands=None):
        def body(carry, k):
            st = carry

            def loss_fn(p):
                if cil:
                    obs, y, w, sp, cm = sample_windows(
                        k, frames, labels, dones, r, k_per_env, frame_skip,
                        extras=(speeds, commands))
                    logits, pred_speed = model_apply({"params": p}, obs, sp, cm)
                else:
                    obs, y, w = sample_windows(k, frames, labels, dones, r,
                                               k_per_env, frame_skip)
                    logits = model_apply({"params": p}, obs)
                ce = -jax.nn.log_softmax(logits)[
                    jnp.arange(n_envs * k_per_env), y]
                denom = jnp.maximum(jnp.sum(w), 1.0)
                loss = jnp.sum(w * ce) / denom
                if cil:
                    # the cil_loss_fn recipe: the speed head predicts the
                    # CURRENT speed input (masked like the CE)
                    loss += speed_weight * (
                        jnp.sum(w * (pred_speed - sp) ** 2) / denom)
                return loss, jnp.mean(w)

            (loss, vfrac), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            return st.apply_gradients(grads), (loss, vfrac)

        keys = jax.random.split(key, train_steps)
        state, (losses, vfracs) = jax.lax.scan(body, state, keys)
        return state, jnp.mean(losses), jnp.mean(vfracs)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        env_sh = NamedSharding(mesh, P("data"))              # (B, ...) leaves
        buf_sh = NamedSharding(mesh, P(None, None, "data"))  # (R, T, B, ...)
        c_env = lambda x: jax.lax.with_sharding_constraint(x, env_sh)  # noqa: E731
        c_buf = lambda x: jax.lax.with_sharding_constraint(x, buf_sh)  # noqa: E731
    else:
        c_env = c_buf = lambda x: x  # noqa: E731

    @jax.jit
    def run(state: TrainState, rng):
        k_init, k_loop = jax.random.split(rng)
        states = jax.vmap(lambda k: reset_env(params, town, k))(
            jax.random.split(k_init, n_envs))
        if goal_ids is not None:
            # goals persist across auto-resets inside step_env, so setting
            # them once here keeps every round goal-directed
            states = states.replace(goal=jnp.asarray(goal_ids, jnp.int32))
        states = jax.tree_util.tree_map(c_env, states)
        gray0 = jnp.clip(render_batch(states)["gray"] * 255.0 + 0.5,
                         0, 255).astype(jnp.uint8)
        framebuf = c_env(jnp.repeat(gray0[..., None], frame_skip, axis=-1))

        frames = c_buf(jnp.zeros((rounds, n_steps, n_envs, H, W), jnp.uint8))
        labels = c_buf(jnp.zeros((rounds, n_steps, n_envs), jnp.int32))
        dones = c_buf(jnp.zeros((rounds, n_steps, n_envs), bool))
        speeds = c_buf(jnp.zeros((rounds, n_steps, n_envs), jnp.float32))
        commands = c_buf(jnp.zeros((rounds, n_steps, n_envs), jnp.int32))
        loss_r = jnp.zeros((rounds,))
        agree_r = jnp.zeros((rounds,))
        valid_r = jnp.zeros((rounds,))

        def round_body(r, carry):
            (state, states, framebuf, just_reset, key, frames, labels, dones,
             speeds, commands, loss_r, agree_r, valid_r) = carry
            key, k_roll, k_train = jax.random.split(key, 3)
            beta_r = jnp.power(jnp.float32(beta), r).astype(jnp.float32)
            (states, framebuf, just_reset, _), traj = rollout_round(
                state.params, states, framebuf, just_reset, k_roll, beta_r)
            frames = jax.lax.dynamic_update_slice(
                frames, traj["gray"][None], (r, 0, 0, 0, 0))
            labels = jax.lax.dynamic_update_slice(
                labels, traj["label"][None], (r, 0, 0))
            dones = jax.lax.dynamic_update_slice(
                dones, traj["done"][None], (r, 0, 0))
            speeds = jax.lax.dynamic_update_slice(
                speeds, traj["speed"][None], (r, 0, 0))
            commands = jax.lax.dynamic_update_slice(
                commands, traj["command"][None], (r, 0, 0))
            state, loss, vfrac = train_on_buffer(
                state, k_train, frames, labels, dones, r,
                speeds=speeds, commands=commands)
            loss_r = loss_r.at[r].set(loss)
            agree_r = agree_r.at[r].set(jnp.mean(traj["agree"].astype(jnp.float32)))
            valid_r = valid_r.at[r].set(vfrac)
            return (state, states, framebuf, just_reset, key, frames, labels,
                    dones, speeds, commands, loss_r, agree_r, valid_r)

        carry = (state, states, framebuf, jnp.zeros((n_envs,), bool), k_loop,
                 frames, labels, dones, speeds, commands,
                 loss_r, agree_r, valid_r)
        carry = jax.lax.fori_loop(0, rounds, round_body, carry)
        state, loss_r, agree_r, valid_r = (carry[0], carry[10], carry[11],
                                           carry[12])
        return state, {"loss": loss_r, "agreement": agree_r,
                       "valid_frac": valid_r}

    return run
