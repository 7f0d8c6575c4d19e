"""Imagination-trained driving policy (Dreamer-lite) — beyond the reference.

The reference's reports sketch a latent world model (encoder→RNN→decoder,
reports/figures/combined_archiecture.pdf) but never use it for anything.
This module closes the loop the sketch implies: a reward head and a small
latent policy are trained ENTIRELY inside the world model's imagination —
thousands of latent rollouts per second with no rendering, no simulator —
and the resulting policy is then evaluated in the real on-device sim.

TPU-first shape: the whole imagination rollout (policy sample → reward →
latent dynamics step, H steps) is one ``lax.scan`` inside one jitted update;
gradients flow through BOTH the action distribution (straight-through
Gumbel-softmax — the world model's RNN consumes one-hot floats, so relaxed
actions slot straight in) and the latent dynamics (the analytic pathwise
gradient Dreamer uses), so no high-variance REINFORCE estimator is needed.

Pipeline (experiments.dream_policy):
  collect → train LatentWorldModel (existing loss) → fit RewardHead on
  real-frame latents vs recorded rewards (rl.reward_from_traj — the SAME
  dense signal PPO optimizes) → train LatentPolicy in imagination →
  evaluate_policy in the real sim.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from carla_imitation_learning_tpu.models.world_model import LatentWorldModel


class RewardHead(nn.Module):
    """z → r̂ (the dense driving reward at the state that produced z)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden)(z))
        return jnp.squeeze(nn.Dense(1)(h), -1)


class LatentPolicy(nn.Module):
    """z → action logits. Tiny on purpose: all perception lives in the
    world model's encoder; the policy only reads the latent."""

    n_actions: int = 9
    hidden: int = 64

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden)(z))
        return nn.Dense(self.n_actions, dtype=jnp.float32)(h)


class ContinuousLatentPolicy(nn.Module):
    """z → tanh (steer, accel) for continuous-conditioned world models.
    Deterministic: in imagination, exploration comes from additive Gaussian
    noise on the emitted control (pathwise gradients flow through the mean —
    no relaxation needed, the dynamics input is already continuous)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden)(z))
        return jnp.tanh(nn.Dense(2, dtype=jnp.float32)(h))


# -- functional access to the trained world model (frozen params) ----------

def _wm_encode(mdl: LatentWorldModel, frames):
    return mdl.encoder(frames)


def _wm_carry(mdl: LatentWorldModel, batch: int):
    return mdl.rnn_layer.cell.initialize_carry(
        jax.random.PRNGKey(0), (batch, mdl.z_size + mdl.action_width))


def _wm_step(mdl: LatentWorldModel, carry, z, a_onehot):
    """One latent dynamics step with a (possibly RELAXED) one-hot action —
    mirrors LatentWorldModel.imagine exactly, including the tanh-range clip."""
    inp = jnp.concatenate([z, a_onehot], axis=-1)
    carry, h = mdl.rnn_layer.cell(carry, inp)
    return carry, jnp.clip(mdl.to_z(h), -1.0, 1.0)


def encode_frames(wm: LatentWorldModel, wm_params, frames, batch: int = 512):
    """(N, H, W, C) float frames → (N, z) latents, chunked to bound memory."""
    outs = []
    for i in range(0, frames.shape[0], batch):
        outs.append(wm.apply({"params": wm_params}, frames[i:i + batch],
                             method=_wm_encode))
    return jnp.concatenate(outs, axis=0)


def train_reward_head(zs, rewards, rng, *, steps: int = 300,
                      batch: int = 256, lr: float = 1e-3, hidden: int = 64,
                      ensemble: int = 1):
    """Fit RewardHead on (latent, recorded reward) pairs. Returns
    (head, params, history of mse).

    ``ensemble > 1`` trains E independent heads (distinct inits, distinct
    bootstrap minibatches per step) in ONE vmapped program; the returned
    params carry a leading ensemble axis. The members' DISAGREEMENT on an
    imagined latent is the epistemic-uncertainty signal the imagination
    update penalizes — the round-4 fleet run proved a single head is
    exploitable (the latent policy drove z off the data manifold to a
    region the head scored high while the real car parked;
    reports/dream_policy.json entropy 2.19→0.21, real score 3e-5)."""
    head = RewardHead(hidden=hidden)
    rng, ki = jax.random.split(rng)
    if ensemble > 1:
        params = jax.vmap(lambda k: head.init(k, zs[:1])["params"])(
            jax.random.split(ki, ensemble))
    else:
        params = head.init(ki, zs[:1])["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)  # leaf-wise: stacked params stack the state
    n = zs.shape[0]

    def loss_one(p, idx):
        pred = head.apply({"params": p}, zs[idx])
        return jnp.mean((pred - rewards[idx]) ** 2)

    @jax.jit
    def step(params, opt_state, idx):
        if ensemble > 1:
            mse, grads = jax.vmap(jax.value_and_grad(loss_one))(params, idx)
            mse = jnp.mean(mse)
        else:
            mse, grads = jax.value_and_grad(loss_one)(params, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, mse

    history = []
    idx_shape = ((ensemble, min(batch, n)) if ensemble > 1
                 else (min(batch, n),))
    for s in range(steps):
        rng, ks = jax.random.split(rng)
        idx = jax.random.randint(ks, idx_shape, 0, n)
        params, opt_state, mse = step(params, opt_state, idx)
        if s % max(1, steps // 10) == 0 or s == steps - 1:
            history.append(float(mse))
    return head, params, history


def train_latent_bc(policy, zs, targets, rng, *, steps: int = 300,
                    batch: int = 256, lr: float = 1e-3,
                    continuous: bool = False):
    """Fit a latent policy on (z, expert action) pairs — behavior cloning in
    LATENT space. Two round-5 roles (both anti-exploitation):

    - warm start: ``imagination_train(init_params=...)`` begins imagination
      from a policy that already drives like the expert, so the optimizer
      refines driving instead of discovering reward-head exploits from a
      random init;
    - anchor: ``anchor_params=...`` keeps the imagined policy within a KL
      ball of this BC policy for the whole run (Dreamer-style behavior
      prior), bounding how far off the data manifold imagination can push.

    ``targets``: (N,) int action ids (discrete) or (N, 2) float controls
    (continuous). Returns (params, history of loss)."""
    rng, ki = jax.random.split(rng)
    params = policy.init(ki, zs[:1])["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    n = zs.shape[0]

    @jax.jit
    def step(params, opt_state, idx):
        def loss_fn(p):
            out = policy.apply({"params": p}, zs[idx])
            if continuous:
                return jnp.mean((out - targets[idx]) ** 2)
            logp = jax.nn.log_softmax(out, axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(logp, targets[idx][:, None], axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for s in range(steps):
        rng, ks = jax.random.split(rng)
        idx = jax.random.randint(ks, (min(batch, n),), 0, n)
        params, opt_state, loss = step(params, opt_state, idx)
        if s % max(1, steps // 10) == 0 or s == steps - 1:
            history.append(float(loss))
    return params, history


def make_imagination_update(
    wm: LatentWorldModel, wm_params, head: RewardHead, rh_params,
    policy, tx, *, horizon: int = 15, gamma: float = 0.98,
    temperature: float = 1.0, entropy_coef: float = 3e-3,
    explore_std: float = 0.1, ensemble: int = 1,
    disagree_coef: float = 0.0, anchor_params=None, anchor_coef: float = 0.0,
    uncertainty_stop: float = 0.0,
) -> Callable:
    """Jitted policy update: imagined discounted return, maximized by
    backprop through the (frozen) reward head and latent dynamics.
    update(policy_params, opt_state, z0 (B, z), rng) →
    (policy_params, opt_state, metrics).

    Action handling follows the world model's conditioning: discrete models
    get straight-through Gumbel-softmax samples (hard one-hot forward,
    relaxed gradient); continuous models get the tanh policy's controls with
    additive Gaussian exploration noise (``explore_std``) — pure pathwise
    gradients, entropy term zero.

    Anti-exploitation terms (round 5 — the fleet-scale round-4 run showed
    the bare objective is gameable: the policy drove the latent off the data
    manifold to where a single reward head hallucinated return while the
    real car parked, reports/dream_policy.json):

    - ``ensemble > 1`` + ``disagree_coef``: rh_params carries E stacked
      heads; the per-step reward becomes mean − disagree_coef·std over
      members. Off-manifold latents are exactly where independently-trained
      heads disagree, so the exploit region is penalized in proportion to
      how little the data supports it (classic epistemic-uncertainty
      pessimism, MOPO-style).
    - ``uncertainty_stop > 0``: imagination TERMINATES (per batch row) once
      member std exceeds the threshold — rewards after the first
      high-uncertainty step stop accumulating, bounding horizon-compounding
      model error.
    - ``anchor_params`` + ``anchor_coef``: per-step KL(π_θ(·|z) ‖ π_BC(·|z))
      penalty toward a frozen latent-BC policy (same module as ``policy``;
      continuous models use squared control distance) — a behavior prior
      that keeps imagination near demonstrated behavior.
    """
    continuous = wm.action_space == "continuous"

    def step_reward(z):
        """→ (reward (B,), member std (B,) — zeros for a single head)."""
        if ensemble > 1:
            rs = jax.vmap(lambda p: head.apply({"params": p}, z))(rh_params)
            std = jnp.std(rs, axis=0)
            return jnp.mean(rs, axis=0) - disagree_coef * std, std
        r = head.apply({"params": rh_params}, z)
        return r, jnp.zeros_like(r)

    def imagined_loss(p_params, z0, rng):
        carry = wm.apply({"params": wm_params}, z0.shape[0], method=_wm_carry)
        alive0 = jnp.ones((z0.shape[0],), jnp.float32)

        def step(state, key):
            carry, z, alive = state
            out = policy.apply({"params": p_params}, z)
            anchor = jnp.zeros(())
            if continuous:
                noise = explore_std * jax.random.normal(key, out.shape)
                a = jnp.clip(out + noise, -1.0, 1.0)
                entropy = jnp.zeros(())
                if anchor_params is not None:
                    ref = jax.lax.stop_gradient(
                        policy.apply({"params": anchor_params}, z))
                    anchor = jnp.mean(jnp.sum((out - ref) ** 2, axis=-1))
            else:
                logits = out
                logp = jax.nn.log_softmax(logits, axis=-1)
                g = jax.random.gumbel(key, logits.shape)
                y = jax.nn.softmax((logits + g) / temperature, axis=-1)
                hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1])
                a = hard + y - jax.lax.stop_gradient(y)
                entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1).mean()
                if anchor_params is not None:
                    ref_logp = jax.nn.log_softmax(jax.lax.stop_gradient(
                        policy.apply({"params": anchor_params}, z)), axis=-1)
                    anchor = jnp.mean(jnp.sum(
                        jnp.exp(logp) * (logp - ref_logp), axis=-1))
            r, std = step_reward(z)
            if uncertainty_stop > 0.0:
                # rows stay terminated once std spikes (monotone alive mask);
                # the CURRENT step still pays — termination cuts the tail
                alive_next = alive * (std < uncertainty_stop).astype(
                    jnp.float32)
            else:
                alive_next = alive
            carry, z_next = wm.apply({"params": wm_params}, carry, z, a,
                                     method=_wm_step)
            return (carry, z_next, alive_next), (r * alive, entropy, anchor,
                                                 jnp.mean(std), jnp.mean(alive))

        keys = jax.random.split(rng, horizon)
        _, (rs, ents, anchors, stds, alives) = jax.lax.scan(
            step, (carry, z0, alive0), keys)
        disc = gamma ** jnp.arange(horizon, dtype=jnp.float32)
        ret = jnp.mean(jnp.sum(rs * disc[:, None], axis=0))
        entropy = jnp.mean(ents)
        anchor = jnp.mean(anchors)
        loss = -(ret + entropy_coef * entropy) + anchor_coef * anchor
        return loss, {"imagined_return": ret, "entropy": entropy,
                      "anchor_kl": anchor, "reward_std": jnp.mean(stds),
                      "alive_frac": jnp.mean(alives)}

    @jax.jit
    def update(p_params, opt_state, z0, rng):
        (loss, metrics), grads = jax.value_and_grad(
            imagined_loss, has_aux=True)(p_params, z0, rng)
        updates, opt_state = tx.update(grads, opt_state, p_params)
        p_params = optax.apply_updates(p_params, updates)
        metrics["loss"] = loss
        return p_params, opt_state, metrics

    return update


def latent_policy_fn(wm: LatentWorldModel, wm_params,
                     policy, policy_params) -> Callable:
    """Real-sim adapter: the rollout's (B, H, W, fs) float window → the
    NEWEST frame → world-model latent → latent-policy action (argmax for
    discrete; the tanh controls for continuous — pair that with
    ``control_space="continuous"``). Encoder + policy both jit-compose
    inside the rollout scan (zero host syncs)."""
    continuous = wm.action_space == "continuous"

    def policy_fn(obs):
        frame = obs[..., -1:]  # the world model sees single frames
        z = wm.apply({"params": wm_params}, frame, method=_wm_encode)
        out = policy.apply({"params": policy_params}, z)
        if continuous:
            return out
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    return policy_fn


def imagination_train(
    wm: LatentWorldModel, wm_params, head: RewardHead, rh_params,
    zs_start, rng, *, updates: int = 300, batch: int = 128,
    horizon: int = 15, gamma: float = 0.98, lr: float = 3e-4,
    entropy_coef: float = 3e-3, hidden: int = 64, explore_std: float = 0.1,
    ensemble: int = 1, disagree_coef: float = 0.0,
    anchor_params=None, anchor_coef: float = 0.0,
    init_params=None, uncertainty_stop: float = 0.0,
):
    """Train a latent policy purely in imagination, starting each rollout
    from real-frame latents (``zs_start``). The policy family follows the
    world model's action conditioning (LatentPolicy for discrete,
    ContinuousLatentPolicy for continuous). Returns
    (policy, policy_params, history of periodic metric dicts).

    ``ensemble``/``disagree_coef``/``anchor_params``/``anchor_coef``/
    ``uncertainty_stop`` are the anti-exploitation terms (see
    make_imagination_update); ``init_params`` warm-starts the policy (e.g.
    from train_latent_bc) instead of a random init."""
    if wm.action_space == "continuous":
        policy = ContinuousLatentPolicy(hidden=hidden)
    else:
        policy = LatentPolicy(n_actions=wm.n_actions, hidden=hidden)
    rng, ki = jax.random.split(rng)
    p_params = (init_params if init_params is not None
                else policy.init(ki, zs_start[:1])["params"])
    tx = optax.adam(lr)
    opt_state = tx.init(p_params)
    update = make_imagination_update(
        wm, wm_params, head, rh_params, policy, tx, horizon=horizon,
        gamma=gamma, entropy_coef=entropy_coef, explore_std=explore_std,
        ensemble=ensemble, disagree_coef=disagree_coef,
        anchor_params=anchor_params, anchor_coef=anchor_coef,
        uncertainty_stop=uncertainty_stop)
    n = zs_start.shape[0]
    history = []
    for s in range(updates):
        rng, ks, ku = jax.random.split(rng, 3)
        idx = jax.random.randint(ks, (min(batch, n),), 0, n)
        p_params, opt_state, metrics = update(p_params, opt_state,
                                              zs_start[idx], ku)
        if s % max(1, updates // 10) == 0 or s == updates - 1:
            history.append({"update": s,
                            **{k: float(v) for k, v in metrics.items()}})
    return policy, p_params, history
