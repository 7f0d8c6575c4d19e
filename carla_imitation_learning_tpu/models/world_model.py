"""Latent world model: Encoder → RNN (LSTM/GRU) → Decoder.

The reference's reports/ artifacts describe exactly this architecture
(reports/figures/combined_archiecture.pdf: encoder→LSTM→decoder with
predicted-latent / predicted-image / reconstruction losses) and an HPO plan
over Latent Size ∈ {64, 128, 512} × RNN ∈ {LSTM, GRU} × Loss ∈ {MSE, MS-SSIM}
(reports/Results.xlsx) — the code itself never landed in the snapshot. This
module implements that design TPU-first:

- per-frame conv encoder → latent z_t,
- an action-conditioned RNN predicts ẑ_{t+1} from (z_t, a_t) via nn.scan
  (sequence handled inside one jit, no python loops),
- a deconv decoder reconstructs frames from latents.

Losses (training.losses.world_model_loss_fn): recon ||dec(z_t) − o_t||,
latent prediction ||ẑ_{t+1} − z_{t+1}||, predicted image
||dec(ẑ_{t+1}) − o_{t+1}||; image terms selectable MSE or MS-SSIM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrameEncoder(nn.Module):
    z_size: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, z). SAME stride-2 pyramid (H → H/16).

        Latents are tanh-bounded: the RNN's prediction target is then a moving
        point inside [−1,1]^z instead of an unbounded drifting one — without
        this the latent-prediction term can run away early in training."""
        h = x.astype(self.dtype)
        for ch in (32, 64, 128, 128):
            h = nn.relu(nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, param_dtype=jnp.float32)(h))
        h = h.reshape(h.shape[0], -1)
        z = nn.Dense(self.z_size, dtype=jnp.float32, param_dtype=jnp.float32)(h)
        return nn.tanh(z)


class FrameDecoder(nn.Module):
    height: int = 64
    width: int = 64
    channels: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, z) → (B, H, W, C) sigmoid frames."""
        fh, fw = self.height // 16, self.width // 16
        h = nn.Dense(fh * fw * 128, dtype=self.dtype, param_dtype=jnp.float32)(
            z.astype(self.dtype))
        h = h.reshape(h.shape[0], fh, fw, 128)
        for i, ch in enumerate((128, 64, 32, self.channels)):
            h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = nn.relu(h) if i < 3 else nn.sigmoid(h.astype(jnp.float32))
        return h


class LatentWorldModel(nn.Module):
    z_size: int = 64        # Results.xlsx plan: {64, 128, 512}
    rnn: str = "lstm"       # {lstm, gru}
    n_actions: int = 9
    height: int = 64
    width: int = 64
    channels: int = 1
    hidden_size: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    # "discrete": actions are (B, T) int ids, one-hot-embedded (n_actions
    # wide). "continuous": actions are (B, T, 2) float (steer, accel) —
    # the continuous control tier's native conditioning, fed to the RNN
    # as-is (already in [-1, 1]).
    action_space: str = "discrete"

    @property
    def action_width(self) -> int:
        return self.n_actions if self.action_space == "discrete" else 2

    def _action_input(self, actions: jnp.ndarray) -> jnp.ndarray:
        if self.action_space == "discrete":
            return jnp.eye(self.n_actions, dtype=jnp.float32)[actions]
        return actions.astype(jnp.float32)

    def setup(self):
        if self.rnn not in ("lstm", "gru"):
            raise ValueError(f"rnn must be 'lstm' or 'gru', got {self.rnn!r}")
        if self.action_space not in ("discrete", "continuous"):
            raise ValueError(
                f"action_space must be 'discrete' or 'continuous', "
                f"got {self.action_space!r}")
        self.encoder = FrameEncoder(self.z_size, self.dtype)
        self.decoder = FrameDecoder(self.height, self.width, self.channels, self.dtype)
        cell_cls = nn.OptimizedLSTMCell if self.rnn == "lstm" else nn.GRUCell
        self.rnn_layer = nn.RNN(
            cell_cls(features=self.hidden_size, param_dtype=jnp.float32))
        self.to_z = nn.Dense(self.z_size, param_dtype=jnp.float32)

    def encode(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, C) → (B, T, z)."""
        b, t = frames.shape[:2]
        z = self.encoder(frames.reshape((b * t,) + frames.shape[2:]))
        return z.reshape(b, t, self.z_size)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, T, z) → (B, T, H, W, C)."""
        b, t = z.shape[:2]
        x = self.decoder(z.reshape(b * t, self.z_size))
        return x.reshape((b, t) + x.shape[1:])

    def predict_latents(self, z: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        """(B, T, z) + (B, T) int actions (or (B, T, 2) float controls for
        ``action_space="continuous"``) → (B, T, z) one-step predictions
        ẑ_{t+1} (aligned so output[:, t] predicts z[:, t+1])."""
        a_onehot = self._action_input(actions)
        inp = jnp.concatenate([z, a_onehot], axis=-1)  # (B, T, z+A)
        hidden = self.rnn_layer(inp)  # (B, T, hidden) — scan inside one jit
        return self.to_z(hidden)

    def imagine(self, z0: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        """Open-loop latent imagination: (B, z) start + (B, H) action plan →
        (B, H, z) predicted latents, feeding each prediction back as the next
        input (Dreamer-style rollout in latent space — no rendering, no
        encoder in the loop, so imagining is orders cheaper than simulating).

        Predictions are clipped to the encoder's tanh range [−1, 1] each step
        (identity for in-range values) so compounding one-step errors cannot
        blow up the trajectory."""
        a_onehot = self._action_input(actions)  # (B, H, A)
        carry0 = self.rnn_layer.cell.initialize_carry(
            jax.random.PRNGKey(0),
            (z0.shape[0], self.z_size + self.action_width))

        def step(mdl, carry_z, a_t):
            carry, z = carry_z
            inp = jnp.concatenate([z, a_t], axis=-1)
            carry, h = mdl.rnn_layer.cell(carry, inp)
            z_next = jnp.clip(mdl.to_z(h), -1.0, 1.0)
            return (carry, z_next), z_next

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, zs = scan(self, (carry0, z0), a_onehot)
        return zs

    def imagine_frames(self, frames0: jnp.ndarray, actions: jnp.ndarray):
        """(B, H, W, C) current frame + (B, H_steps) action plan →
        (imagined latents (B, H_steps, z), decoded frames (B, H_steps, H, W, C))."""
        z0 = self.encoder(frames0)
        zs = self.imagine(z0, actions)
        return zs, self.decode(zs)

    def __call__(self, frames: jnp.ndarray, actions: jnp.ndarray):
        """frames (B, T, H, W, C), actions (B, T) →
        (recon (B,T,H,W,C), z (B,T,z), z_pred (B,T-1,z), frames_pred)."""
        z = self.encode(frames)
        recon = self.decode(z)
        z_pred_full = self.predict_latents(z, actions)
        z_pred = z_pred_full[:, :-1]              # predicts z[:, 1:]
        frames_pred = self.decode(z_pred)
        return recon, z, z_pred, frames_pred

    def example_input(self, batch: int = 1, seq: int = 4):
        actions = (jnp.zeros((batch, seq), jnp.int32)
                   if self.action_space == "discrete"
                   else jnp.zeros((batch, seq, 2), jnp.float32))
        return (
            jnp.zeros((batch, seq, self.height, self.width, self.channels), jnp.float32),
            actions,
        )
