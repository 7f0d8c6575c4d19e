"""Convolutional VAE (capability match for reference CNNAutoEncoder, nets.py:81-142).

Encoder: 4 VALID convs (32 k4s2, 64 k4s2, 128 k6s3, 128 k6s3) — on 1×224×224
input the feature map is 4×4×128 → hidden = 2048. Bottleneck: Dense to_mu /
to_log_var → z (default 32) → Dense z_to_hidden → 1×1×hidden map. Decoder:
5 VALID transposed convs (128 k6s2, 128 k6s2, 64 k6s2, 32 k6s3, C k4s2)
→ sigmoid, reconstructing 224×224.

Note: the reference's ``_get_flatten_size`` returns the feature-map *width*
(shape[-1] = 4 in NCHW) rather than the flattened size (nets.py:116-119), which
makes its forward pass shape-inconsistent; we use the true flattened size.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv_out(size: int, kernel: int, stride: int) -> int:
    return (size - kernel) // stride + 1


class ConvVAE(nn.Module):
    channels: int = 1
    height: int = 224
    width: int = 224
    z_size: int = 32
    enc_channels: Sequence[int] = (32, 64, 128, 128)
    enc_kernels: Sequence[int] = (4, 4, 6, 6)
    enc_strides: Sequence[int] = (2, 2, 3, 3)
    dec_channels: Sequence[int] = (128, 128, 64, 32)
    dec_kernels: Sequence[int] = (6, 6, 6, 6, 4)
    dec_strides: Sequence[int] = (2, 2, 2, 3, 2)
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def reference_chain(self) -> bool:
        """True at the reference design size (224²): exact VALID-conv chain.
        Other sizes use a SAME stride-2 pyramid (H → H/16 → H), which keeps
        the same capability on e.g. the 128² rendered closed-loop camera."""
        return (self.height, self.width) == (224, 224)

    @property
    def feature_hw(self) -> tuple[int, int]:
        if self.reference_chain:
            h, w = self.height, self.width
            for k, s in zip(self.enc_kernels, self.enc_strides):
                h, w = _conv_out(h, k, s), _conv_out(w, k, s)
            return h, w
        return self.height // 16, self.width // 16

    @property
    def hidden_size(self) -> int:
        """Flattened encoder output size, by conv arithmetic (2048 at 224²)."""
        h, w = self.feature_hw
        return h * w * self.enc_channels[-1]

    def setup(self):
        if self.reference_chain:
            enc = zip(self.enc_channels, self.enc_kernels, self.enc_strides)
            dec = zip(tuple(self.dec_channels) + (self.channels,),
                      self.dec_kernels, self.dec_strides)
            pad = "VALID"
        else:
            if self.height % 16 or self.width % 16:
                raise ValueError("non-224 ConvVAE sizes must be multiples of 16")
            enc = zip(self.enc_channels, (4,) * 4, (2,) * 4)
            dec = zip((128, 64, 32, self.channels), (4,) * 4, (2,) * 4)
            pad = "SAME"
        self.encoder = [
            nn.Conv(ch, (k, k), strides=(s, s), padding=pad,
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"enc_{i}")
            for i, (ch, k, s) in enumerate(enc)
        ]
        self.to_mu = nn.Dense(self.z_size, dtype=jnp.float32, param_dtype=jnp.float32)
        self.to_log_var = nn.Dense(self.z_size, dtype=jnp.float32, param_dtype=jnp.float32)
        self.z_to_hidden = nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32)
        self.decoder = [
            nn.ConvTranspose(ch, (k, k), strides=(s, s), padding=pad,
                             dtype=self.dtype, param_dtype=jnp.float32, name=f"dec_{i}")
            for i, (ch, k, s) in enumerate(dec)
        ]

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for conv in self.encoder:
            h = nn.relu(conv(h))
        return h.reshape(h.shape[0], -1).astype(jnp.float32)  # (B, hidden)

    def bottleneck(self, h: jnp.ndarray, rng=None):
        """(B, hidden) → (z, mu, log_var); reparameterized when rng given
        (reference nets.py:121-130)."""
        mu, log_var = self.to_mu(h), self.to_log_var(h)
        if rng is None:
            z = mu
        else:
            std = jnp.exp(0.5 * log_var)
            z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        return z, mu, log_var

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = self.z_to_hidden(z.astype(self.dtype))
        if self.reference_chain:
            h = h.reshape(h.shape[0], 1, 1, self.hidden_size)  # 1×1 map (nets.py:140)
        else:
            fh, fw = self.feature_hw
            h = h.reshape(h.shape[0], fh, fw, self.enc_channels[-1])
        for i, deconv in enumerate(self.decoder):
            h = deconv(h)
            h = nn.relu(h) if i < len(self.decoder) - 1 else nn.sigmoid(h.astype(jnp.float32))
        return h

    def __call__(self, x: jnp.ndarray, rng=None):
        """x: (B, H, W, C) in [0,1] → (recon, mu, log_var)."""
        z, mu, log_var = self.bottleneck(self.encode(x), rng)
        return self.decode(z), mu, log_var

    def representation(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic latent embedding (mu)."""
        _, mu, _ = self.bottleneck(self.encode(x), None)
        return mu

    def example_input(self, batch: int = 1):
        return jnp.zeros((batch, self.height, self.width, self.channels), jnp.float32)
