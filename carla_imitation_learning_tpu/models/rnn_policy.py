"""Recurrent driving policy: ConvTrunk embedding → GRU → action head.

Beyond the reference's feedforward nets (nets.py has no recurrent model):
where PolicyCNN approximates temporal context with the 4-frame channel
stack, RecurrentPolicy carries an explicit hidden state across steps — the
architecture CIL successors use for memory-dependent behaviors (waiting at
a light that has scrolled out of frame, committing to a lane change).

TPU shape: the conv embedding of a whole (B, T) training batch runs as ONE
batched conv program (T folded into the batch — MXU-sized work), and only
the cheap GRU recurrence is sequential. Training consumes the same
SequenceDataset the world model uses (episode-boundary-safe sequences);
rollouts thread the hidden state through make_rollout's policy-carry slot
with automatic zero-reset on env auto-resets.

``__call__`` (sequences) and ``step`` (one transition) share parameters via
setup(); their equivalence is asserted in tests/test_rnn_policy.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from carla_imitation_learning_tpu.models.cnn import ConvTrunk, MLPHead


class RecurrentPolicy(nn.Module):
    """frames → GRU hidden → 9-way logits.

    Training: ``apply(vars, frames_seq (B,T,H,W,C), h0?)`` →
    (logits (B,T,n_actions), h_final (B,hidden)).
    Rollout:  ``apply(vars, h (B,hidden), obs (B,H,W,C), method='step')`` →
    (h', logits (B,n_actions)).
    A fresh hidden state is zeros (``initial_state``).
    """

    obs_size: int = 1
    hidden: int = 128
    n_actions: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.trunk = ConvTrunk(dtype=self.dtype)
        self.cell = nn.GRUCell(features=self.hidden, dtype=self.dtype,
                               param_dtype=jnp.float32)
        self.head = MLPHead((64, self.n_actions), dtype=self.dtype)

    def initial_state(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden), jnp.float32)

    def __call__(self, frames_seq: jnp.ndarray, h0: jnp.ndarray | None = None):
        B, T = frames_seq.shape[:2]
        emb = self.trunk(frames_seq.reshape((B * T,) + frames_seq.shape[2:]))
        emb = emb.reshape(B, T, -1)
        h = self.initial_state(B) if h0 is None else h0
        logits = []
        for t in range(T):  # T is static under jit; the convs are done above
            h, out = self.cell(h, emb[:, t])
            logits.append(self.head(out))
        return jnp.stack(logits, axis=1), h

    def step(self, h: jnp.ndarray, obs: jnp.ndarray):
        emb = self.trunk(obs)
        h, out = self.cell(h, emb)
        return h, self.head(out)

    def example_input(self, batch: int = 1, height: int = 256,
                      width: int = 256, seq_len: int = 4):
        return jnp.zeros((batch, seq_len, height, width, self.obs_size),
                         jnp.float32)
