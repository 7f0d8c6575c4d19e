"""ViT driving policy: a transformer alternative to the ConvNet trunk.

Beyond-reference tier. The reference's only policy architecture is the
4-conv ConvNet1 (src/architectures/nets.py:6-39); its first conv has 4 input
channels — padded to 8 MXU lanes, the root of the ~30% MFU ceiling measured
in PERFORMANCE.md. A ViT is the TPU-native counterpoint: patch embedding is
ONE dense contraction of depth patch²·obs_size (16·16·4 = 1024 for the
default patch), and every subsequent FLOP is a full-width matmul — exactly
what the MXU wants. Attention over the ~100-300 patch tokens of a driving
frame is tiny, so the model stays latency-competitive with the CNN while
removing the thin-channel stem problem entirely.

Drop-in for the discrete family: same (B, H, W, obs_size) float [0,1] input,
same (B, n_actions) float32 logits, same checkpoint/eval/export surfaces
(``policy_arch=vit`` in the experiment config selects it everywhere
_policy_bits builds the discrete policy).

Resolution independence: position embeddings are stored on a fixed canonical
``pos_grid``² grid and bilinearly resized to the actual token grid at trace
time (standard ViT fine-tuning practice) — a checkpoint trained at 256²
restores and runs at the 128² rollout camera, matching ConvTrunk's
any-resolution contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (LN → MHA → +, LN → MLP → +).

    LayerNorms compute in float32 (flax default promotes for the reduction);
    matmuls run in ``dtype`` (bfloat16 on TPU) with float32 params.
    """

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
            param_dtype=jnp.float32)(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


class ViTPolicy(nn.Module):
    """Discrete driving policy: patchify → transformer → mean-pool → logits.

    (B, H, W, obs_size) float [0,1] → (B, n_actions) float32 logits. H and W
    need not be multiples of ``patch``: the input is zero-padded up (static,
    trace-time) so every pixel lands in some token.
    """

    obs_size: int = 4
    n_actions: int = 9
    patch: int = 16
    dim: int = 192
    depth: int = 4
    heads: int = 3
    mlp_ratio: int = 4
    pos_grid: int = 16      # canonical pos-emb grid (resized to fit)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = x.shape
        p = self.patch
        ph, pw = -H % p, -W % p
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = x.astype(self.dtype)
        # patch embed: one k=s=patch conv == a dense over patch²·C-deep rows
        x = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        gh, gw = x.shape[1], x.shape[2]
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.pos_grid, self.pos_grid, self.dim), jnp.float32)
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            pos = jax.image.resize(pos, (gh, gw, self.dim), "bilinear")
        x = (x + pos.astype(self.dtype)).reshape(B, gh * gw, self.dim)
        for _ in range(self.depth):
            x = TransformerBlock(dim=self.dim, heads=self.heads,
                                 mlp_ratio=self.mlp_ratio, dtype=self.dtype)(x)
        # valid-fraction weighted pool: when H/W aren't multiples of patch,
        # boundary tokens cover partly (or entirely) zero-padding — weight
        # each token by its valid-pixel fraction so pad content can't dilute
        # the pooled representation (e.g. 50×70 @ patch 8 has 7/63 pad-only
        # tokens). Weights are static (trace-time ints), so this is one
        # elementwise multiply, no masking in attention (pad tokens carry
        # only pos-emb there — accepted).
        if ph or pw:
            wh = jnp.clip((H - jnp.arange(gh) * p) / p, 0.0, 1.0)
            ww = jnp.clip((W - jnp.arange(gw) * p) / p, 0.0, 1.0)
            w = (wh[:, None] * ww[None, :]).reshape(1, gh * gw, 1)
            pooled = (x * w.astype(self.dtype)).sum(axis=1) / w.sum()
        else:
            pooled = x.mean(axis=1)
        x = nn.LayerNorm(dtype=jnp.float32)(pooled)
        return nn.Dense(self.n_actions, dtype=jnp.float32,
                        param_dtype=jnp.float32)(x)

    def example_input(self, batch: int = 1, height: int = 256, width: int = 256):
        return jnp.zeros((batch, height, width, self.obs_size), jnp.float32)
