"""On-device image augmentation for the BC input pipeline (BASELINE config #3).

The reference has no augmentation (its only transform is ToTensor
normalization, imitation_dataset.py:37,113). These are pure jit-able ops that
fuse into the train step — random crop-resize, brightness/contrast jitter,
horizontal flip WITH the matching steer-class relabel, and gaussian noise.
All take (B, H, W, C) stacks + a PRNG key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def random_brightness_contrast(rng, x, brightness: float = 0.15, contrast: float = 0.15):
    kb, kc = jax.random.split(rng)
    b = jax.random.uniform(kb, (x.shape[0], 1, 1, 1), minval=-brightness, maxval=brightness)
    c = jax.random.uniform(kc, (x.shape[0], 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((x - mean) * c + mean + b, 0.0, 1.0)


def random_noise(rng, x, sigma: float = 0.02):
    return jnp.clip(x + sigma * jax.random.normal(rng, x.shape, x.dtype), 0.0, 1.0)


def _crop_resize_one(img, y0, x0, crop_h, crop_w):
    """Dynamic-slice crop + bilinear resize back to the original size."""
    h, w = img.shape[0], img.shape[1]
    crop = jax.lax.dynamic_slice(img, (y0, x0, 0), (crop_h, crop_w, img.shape[2]))
    return jax.image.resize(crop, (h, w, img.shape[2]), method="bilinear")


def random_crop_resize(rng, x, min_scale: float = 0.85):
    """Random crop (same scale per batch — static shapes) resized back."""
    h, w = x.shape[1], x.shape[2]
    ks, ky, kx = jax.random.split(rng, 3)
    # one crop SIZE per batch (shape must be static), random offsets per image
    scale = float(min_scale)
    ch, cw = int(h * scale), int(w * scale)
    y0 = jax.random.randint(ky, (x.shape[0],), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (x.shape[0],), 0, w - cw + 1)
    return jax.vmap(lambda im, a, b: _crop_resize_one(im, a, b, ch, cw))(x, y0, x0)


def random_hflip_with_labels(rng, x, actions):
    """Horizontal flip + steer-class relabel: class = acc*3 + steer with
    steer ∈ {0:left, 1:straight, 2:right} → flip swaps 0↔2
    (discretizer semantics, reference imitation_dataset.py:317-339)."""
    flip = jax.random.bernoulli(rng, 0.5, (x.shape[0],))
    x_f = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    acc = actions // 3
    steer = actions % 3
    steer_f = jnp.where(flip, 2 - steer, steer)
    return x_f, acc * 3 + steer_f


@functools.partial(jax.jit, static_argnames=("crop", "flip", "jitter", "noise"))
def augment_batch(rng, x, actions, crop: bool = True, flip: bool = True,
                  jitter: bool = True, noise: bool = True):
    """Composed augmentation — one fused XLA program ahead of the model."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if flip:
        x, actions = random_hflip_with_labels(k1, x, actions)
    if crop:
        x = random_crop_resize(k2, x)
    if jitter:
        x = random_brightness_contrast(k3, x)
    if noise:
        x = random_noise(k4, x)
    return x, actions
