"""AuxNet — multi-task BC net with sensor fusion.

The reference imports ``CNNAuxNet`` (train.py:7) and trains it in the 'aux'
block (train.py:131-165), but the class is missing from the snapshot
(SURVEY.md §2.1). Its interface is fully determined by its call sites:

- input  x = (frame_stack (B,256,256,4), sensor (B,3)=(current_steer,
  speed_long, speed)) — SequentialAuxTorchDataset, imitation_dataset.py:178-191.
- output = (recon_image, trafficlight_logits, action_logits) — lossCriterion
  uses out[2] vs action and (commented) out[0] vs the input image and out[1]
  vs trafficlight, imitation.py:11-24.

Design: PolicyCNN trunk on the frames, small MLP on the sensor vector, fused
feature drives three heads — a deconv reconstruction decoder, a traffic-light
classifier, and the 9-way action classifier.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from carla_imitation_learning_tpu.models.cnn import ConvTrunk, MLPHead


class ReconDecoder(nn.Module):
    """(B, F) feature → (B, H, W, C) reconstruction via 2× upsampling
    transposed convs from a 4×4 seed (4 → 256 in 6 doublings). The final
    activation is sigmoid for image reconstruction; ``logits_out=True``
    emits raw float32 logits instead (per-pixel classification heads)."""

    out_hw: int = 256
    out_channels: int = 4
    seed_hw: int = 4
    logits_out: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        n_ups = (self.out_hw // self.seed_hw).bit_length() - 1  # log2
        h = nn.Dense(self.seed_hw * self.seed_hw * 64, dtype=self.dtype,
                     param_dtype=jnp.float32)(feat.astype(self.dtype))
        h = h.reshape(h.shape[0], self.seed_hw, self.seed_hw, 64)
        chans = [64, 64, 32, 32, 16, 16, 16][:n_ups - 1] + [self.out_channels]
        for i, ch in enumerate(chans):
            h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, param_dtype=jnp.float32)(h)
            if i < len(chans) - 1:
                h = nn.relu(h)
            elif self.logits_out:
                h = h.astype(jnp.float32)
            else:
                h = nn.sigmoid(h.astype(jnp.float32))
        return h


class AuxNet(nn.Module):
    """``seg_classes > 0`` adds BASELINE config #3's auxiliary semantic-
    segmentation decoder: per-pixel class logits (B, H, W, seg_classes) over
    the renderer's semantic taxonomy (render/geometry.py SEM_*, 8 classes),
    appended as a 4th output. 0 keeps the reference-inferred 3-output
    contract bit-for-bit."""

    obs_size: int = 4
    n_actions: int = 9
    n_traffic_classes: int = 2
    sensor_dim: int = 3
    image_hw: int = 256
    seg_classes: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        frames, sensor = x
        feat = ConvTrunk(dtype=self.dtype)(frames)  # (B, 128)
        s = sensor.astype(self.dtype)
        s = nn.relu(nn.Dense(32, dtype=self.dtype, param_dtype=jnp.float32)(s))
        s = nn.relu(nn.Dense(32, dtype=self.dtype, param_dtype=jnp.float32)(s))
        fused = jnp.concatenate([feat, s], axis=-1)
        fused = nn.relu(nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32)(fused))
        recon = ReconDecoder(out_hw=self.image_hw, out_channels=self.obs_size,
                             dtype=self.dtype)(fused)
        traffic_logits = MLPHead((32, self.n_traffic_classes), dtype=self.dtype)(fused)
        action_logits = MLPHead((64, 32, self.n_actions), dtype=self.dtype)(fused)
        if self.seg_classes > 0:
            seg_logits = ReconDecoder(out_hw=self.image_hw,
                                      out_channels=self.seg_classes,
                                      logits_out=True, dtype=self.dtype)(fused)
            return recon, traffic_logits, action_logits, seg_logits
        return recon, traffic_logits, action_logits

    def example_input(self, batch: int = 1):
        return (
            jnp.zeros((batch, self.image_hw, self.image_hw, self.obs_size), jnp.float32),
            jnp.zeros((batch, self.sensor_dim), jnp.float32),
        )

    def as_policy_fn(self, params):
        """Closed-loop ``policy_fn(obs, extras) -> int32 actions``: the
        rollout's per-env sensor vector (current_steer, speed_long, speed)
        feeds the fusion MLP, the action head's argmax drives — so a
        seg-supervised AuxNet checkpoint can be driving-score A/B'd against
        a plain one (benchmarks/seg_ab.py)."""
        def policy_fn(obs, extras):
            outs = self.apply({"params": params}, (obs, extras["sensor"]))
            return jnp.argmax(outs[2], axis=-1)
        return policy_fn
