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

    ``s2d_stem=True`` replaces the thin-input k7/s3 first conv with its
    function-preserving space-to-depth form: the input is zero-padded so the
    kernel extends to 9×9, 3×3 blocks fold into channels (4 → 36), and the
    conv becomes k3/s1 on the folded layout — the classic TPU fix for
    4-channel stems that pad to 8 MXU input lanes. ``s2d_stem_kernel``
    converts trained standard-stem weights exactly.
    """

    channels: Sequence[int] = (16, 32, 64, 128)
    kernels: Sequence[int] = (7, 5, 4, 3)
    strides: Sequence[int] = (3, 1, 1, 1)
    pools: Sequence[int] = (3, 2, 2, 2)
    dtype: jnp.dtype = jnp.bfloat16
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """At 256² the arithmetic is exactly the reference's (VALID convs +
        floor pools: 256→84→28→24→12→9→4→2→1). Smaller inputs (the 128²
        rendered closed-loop camera, tiny test images) degrade gracefully:
        a conv falls back to SAME padding when the map is smaller than its
        kernel, and a pool is skipped when the map is smaller than its window.
        All decisions are made on static trace-time shapes — jit-safe."""
        x = x.astype(self.dtype)
        for li, (ch, k, s, p) in enumerate(
                zip(self.channels, self.kernels, self.strides, self.pools)):
            small = min(x.shape[1], x.shape[2]) < k
            if (li == 0 and self.s2d_stem and k == 7 and s == 3 and not small):
                x = _space_to_depth_stem_input(x)
                x = nn.Conv(ch, (3, 3), strides=(1, 1), padding="VALID",
                            dtype=self.dtype, param_dtype=jnp.float32)(x)
            else:
                pad = "VALID" if not small else "SAME"
                x = nn.Conv(ch, (k, k), strides=(s, s), padding=pad,
                            dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
            if min(x.shape[1], x.shape[2]) >= p:
                x = _maxpool(x, p)
        return x.reshape(x.shape[0], -1)  # flatten (reference nets.py:37)


def _space_to_depth_stem_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, ⌈(H+2)/3⌉, ·, 9C): zero-pad so a stride-3 9×9
    window tiles exactly, then fold 3×3 blocks into channels. A k7/s3 VALID
    conv on x equals a k3/s1 VALID conv on this layout with the kernel from
    ``s2d_stem_kernel`` — same outputs, better MXU channel occupancy."""
    B, H, W, C = x.shape
    out_h, out_w = (H - 7) // 3 + 1, (W - 7) // 3 + 1
    hp, wp = 3 * (out_h - 1) + 9, 3 * (out_w - 1) + 9
    x = jnp.pad(x, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
    x = x.reshape(B, hp // 3, 3, wp // 3, 3, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp // 3, wp // 3, 9 * C)


def s2d_stem_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """Exact weight transform for the space-to-depth stem:
    (7, 7, C, O) standard kernel → (3, 3, 9C, O). Zero-pads the kernel to
    9×9 (the padded taps read the zero-padded input rows — contributions are
    identically zero) and folds 3×3 tap blocks into the input-channel dim in
    the same (p, q, c) order as ``_space_to_depth_stem_input``."""
    C, O = w7.shape[2], w7.shape[3]
    k9 = jnp.pad(w7, ((0, 2), (0, 2), (0, 0), (0, 0)))
    k9 = k9.reshape(3, 3, 3, 3, C, O)           # (a, p, b, q, c, o)
    return k9.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 9 * C, O)


def convert_params_to_s2d(params: dict, trunk: str = "ConvTrunk_0") -> dict:
    """Convert a trained standard-stem PolicyCNN/DualStreamCNN params pytree
    to the s2d_stem variant's pytree (Conv_0 kernel reshaped, all else
    shared) — checkpoint migration without retraining."""
    new = {k: dict(v) if isinstance(v, dict) else v
           for k, v in dict(params).items()}
    conv0 = dict(new[trunk]["Conv_0"])
    conv0["kernel"] = s2d_stem_kernel(conv0["kernel"])
    new[trunk]["Conv_0"] = conv0
    return new


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
    s2d_stem: bool = False  # space-to-depth first conv (function-preserving)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = ConvTrunk(dtype=self.dtype, s2d_stem=self.s2d_stem)(x)
        return MLPHead((64, 32, self.n_actions), dtype=self.dtype)(feat)

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
        """Smoke-forward input (reference example_input_array, nets.py:14)."""
        return jnp.zeros((batch, height, width, self.obs_size), jnp.float32)


class ContinuousPolicyCNN(nn.Module):
    """Continuous-control driving policy: (steer, accel) ∈ [-1, 1]².

    Beyond-reference tier: the reference discretizes the autopilot's controls
    into 9 classes (imitation_dataset.py:317-339) and its policy is a
    classifier; the CARLA CIL line of work regresses the continuous controls
    directly. Same ConvTrunk as PolicyCNN, tanh head — column 0 is the wheel
    command, column 1 is signed acceleration (>0 → throttle, <0 → brake),
    matching the closed loop's ``control_space="continuous"`` convention
    (training/closed_loop.py).
    """

    obs_size: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = ConvTrunk(dtype=self.dtype, s2d_stem=self.s2d_stem)(x)
        return jnp.tanh(MLPHead((64, 32, 2), dtype=self.dtype)(feat))

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
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
