"""Behavior-cloning CNN policies.

TPU-first re-designs of the reference's torch nets (src/architectures/nets.py):
NHWC layout (XLA:TPU's native conv layout), bfloat16 activations on the MXU
with float32 params, logits promoted to float32 for a stable softmax-CE.
Spatial arithmetic matches the reference exactly (VALID convs + floor maxpools),
so feature sizes line up: 256→84→28→24→12→9→4→2→1 for PolicyCNN.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _maxpool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch nn.MaxPool2d(kernel_size=k): stride=k, floor (VALID) semantics."""
    return nn.max_pool(x, window_shape=(k, k), strides=(k, k), padding="VALID")


class ConvTrunk(nn.Module):
    """Conv→ReLU→MaxPool ×4 trunk shared by the BC policies.

    channels/kernels/strides/pools default to the reference ConvNet1 trunk
    (nets.py:17-30); DualStreamCNN passes the wider variant (nets.py:53-66).
    """

    channels: Sequence[int] = (16, 32, 64, 128)
    kernels: Sequence[int] = (7, 5, 4, 3)
    strides: Sequence[int] = (3, 1, 1, 1)
    pools: Sequence[int] = (3, 2, 2, 2)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """At 256² the arithmetic is exactly the reference's (VALID convs +
        floor pools: 256→84→28→24→12→9→4→2→1). Smaller inputs (the 128²
        rendered closed-loop camera, tiny test images) degrade gracefully:
        a conv falls back to SAME padding when the map is smaller than its
        kernel, and a pool is skipped when the map is smaller than its window.
        All decisions are made on static trace-time shapes — jit-safe."""
        x = x.astype(self.dtype)
        for ch, k, s, p in zip(self.channels, self.kernels, self.strides, self.pools):
            pad = "VALID" if min(x.shape[1], x.shape[2]) >= k else "SAME"
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=pad,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
            if min(x.shape[1], x.shape[2]) >= p:
                x = _maxpool(x, p)
        return x.reshape(x.shape[0], -1)  # flatten (reference nets.py:37)


class MLPHead(nn.Module):
    """Dense→ReLU stack ending in float32 logits."""

    features: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for f in self.features[:-1]:
            x = nn.relu(nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32)(x))
        return nn.Dense(self.features[-1], dtype=jnp.float32, param_dtype=jnp.float32)(x)


class PolicyCNN(nn.Module):
    """9-way discrete driving policy on a 4-frame grayscale stack.

    Capability match for reference ConvNet1 (nets.py:6-39):
    (B, 256, 256, obs_size) → (B, n_actions) logits via a 4-conv trunk
    (flatten=128) and a 128→64→32→n_actions MLP.
    """

    obs_size: int = 4
    n_actions: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = ConvTrunk(dtype=self.dtype)(x)
        return MLPHead((64, 32, self.n_actions), dtype=self.dtype)(feat)

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
        """Smoke-forward input (reference example_input_array, nets.py:14)."""
        return jnp.zeros((batch, height, width, self.obs_size), jnp.float32)


class DualStreamCNN(nn.Module):
    """Shared-trunk two-stream policy over raw + segmented frame stacks.

    Capability match for reference ConvNetRawSegment (nets.py:42-78): ONE
    shared trunk applied to both streams, features summed, 256→200→48→n_actions
    MLP. (The reference's `super(ConvNet1, self)` copy-paste bug at nets.py:44
    is not replicated.)
    """

    obs_size: int = 4
    n_actions: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_seg: jnp.ndarray) -> jnp.ndarray:
        trunk = ConvTrunk(channels=(32, 64, 128, 256), dtype=self.dtype)
        feat = trunk(x) + trunk(x_seg)  # shared weights, summed features (nets.py:71-76)
        return MLPHead((200, 48, self.n_actions), dtype=self.dtype)(feat)

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
        x = jnp.zeros((batch, height, width, self.obs_size), jnp.float32)
        return x, x
