"""Command-conditioned branched policy (CIL-style) with a speed head.

BASELINE.json config #2: no reference-code equivalent; modeled on the
"Conditional Imitation Learning" architecture family. TPU-first detail: all
command branches are computed in one batched einsum and the active branch is
selected with a one-hot contraction — no data-dependent control flow under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from carla_imitation_learning_tpu.models.cnn import ConvTrunk


class BranchedCILPolicy(nn.Module):
    obs_size: int = 4
    n_actions: int = 9
    n_commands: int = 4  # follow / left / right / straight
    branch_hidden: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jnp.ndarray, speed: jnp.ndarray, command: jnp.ndarray):
        """frames (B,H,W,C), speed (B,), command (B,) int32 →
        (action_logits (B,n_actions), pred_speed (B,))."""
        feat = ConvTrunk(dtype=self.dtype)(frames)  # (B, 128)
        v = nn.relu(nn.Dense(32, dtype=self.dtype, param_dtype=jnp.float32)(
            speed[:, None].astype(self.dtype)))
        fused = jnp.concatenate([feat, v], axis=-1)
        fused = nn.relu(nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32)(fused))

        # All branches at once: (B, F) x (K, F, H) → (B, K, H) → (B, K, A)
        b1 = self.param("branch_w1", nn.initializers.lecun_normal(),
                        (self.n_commands, fused.shape[-1], self.branch_hidden), jnp.float32)
        b1b = self.param("branch_b1", nn.initializers.zeros,
                         (self.n_commands, self.branch_hidden), jnp.float32)
        b2 = self.param("branch_w2", nn.initializers.lecun_normal(),
                        (self.n_commands, self.branch_hidden, self.n_actions), jnp.float32)
        b2b = self.param("branch_b2", nn.initializers.zeros,
                         (self.n_commands, self.n_actions), jnp.float32)
        h = jnp.einsum("bf,kfh->bkh", fused.astype(self.dtype), b1.astype(self.dtype)) + b1b
        h = nn.relu(h)
        logits_all = jnp.einsum("bkh,kha->bka", h, b2.astype(self.dtype)) + b2b  # (B,K,A)

        onehot = jnp.zeros((command.shape[0], self.n_commands), jnp.float32).at[
            jnp.arange(command.shape[0]), command].set(1.0)
        action_logits = jnp.einsum("bka,bk->ba", logits_all.astype(jnp.float32), onehot)
        pred_speed = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32)(
            feat.astype(jnp.float32))[:, 0]
        return action_logits, pred_speed

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
        return (
            jnp.zeros((batch, height, width, self.obs_size), jnp.float32),
            jnp.zeros((batch,), jnp.float32),
            jnp.zeros((batch,), jnp.int32),
        )

    def as_policy_fn(self, params):
        """The closed-loop ``policy_fn(obs, extras) -> int32 actions`` for
        this model — THE single convention every consumer (checkpoint eval,
        DAgger, benchmarks) must share: clip the rollout's navigation command
        into this head's taxonomy (clip, don't wrap — lane-change commands on
        a smaller-taxonomy checkpoint degrade to the highest branch it
        trained), condition on speed, argmax the active branch's logits."""
        def policy_fn(obs, extras):
            cmd = jnp.clip(extras["command"], 0, self.n_commands - 1)
            logits, _ = self.apply({"params": params}, obs,
                                   extras["speed"], cmd)
            return jnp.argmax(logits, axis=-1)
        return policy_fn
