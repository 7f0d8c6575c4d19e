"""Loss functions, as pure fns of (params, apply_fn, batch, rng) → (loss, metrics).

Behavioral matches:
- BC: softmax cross-entropy on 9-way logits (reference imitation.py:42-45).
- VAE: alpha·MSE(recon, x) + beta·KL, KL = mean over batch of -0.5·Σ_z(1 +
  logσ² - μ² - σ²) (reference vae.py:26-35; alpha=0.75, beta=0.1 from config).
- Aux: weighted recon MSE + traffic CE + action CE; reference lossCriterion
  keeps only the action CE active (imitation.py:11-24), so default weights are
  (0, 0, 1) — set via config aux_*_weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax CE with integer labels (torch nn.CrossEntropyLoss semantics)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels).mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return (jnp.argmax(logits, axis=-1) == labels).mean()


def kl_divergence(mu: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    """Reference vae.py:26-28: (-0.5 * (1 + logσ² - μ² - σ²).sum(dim=1)).mean()."""
    return (-0.5 * (1 + log_var - mu**2 - jnp.exp(log_var)).sum(axis=1)).mean()


def bc_loss_fn(params, apply_fn, batch, rng=None):
    x, y = batch
    logits = apply_fn({"params": params}, x)
    loss = cross_entropy(logits, y)
    return loss, {"loss": loss, "accuracy": accuracy(logits, y)}


def bc_augmented_loss_fn(crop: bool = True, flip: bool = True, jitter: bool = True,
                         noise: bool = True):
    """BC loss with fused on-device augmentation ahead of the model
    (BASELINE config #3): crop-resize, brightness/contrast, gaussian noise,
    and horizontal flip WITH the matching steer-class relabel. Augmentation
    runs inside the same jit as the train step (and the fused epoch scan)."""
    from carla_imitation_learning_tpu.ops.augment import augment_batch

    def loss_fn(params, apply_fn, batch, rng=None):
        x, y = batch
        if rng is not None:  # eval passes rng=None → no augmentation
            x, y = augment_batch(rng, x, y, crop=crop, flip=flip,
                                 jitter=jitter, noise=noise)
        logits = apply_fn({"params": params}, x)
        loss = cross_entropy(logits, y)
        return loss, {"loss": loss, "accuracy": accuracy(logits, y)}

    return loss_fn


def continuous_bc_loss_fn(steer_weight: float = 1.0, accel_weight: float = 0.5):
    """Regression BC for ContinuousPolicyCNN: weighted MSE on (steer, accel)
    targets (CIL-style — steering dominates because it is the hard, rare
    signal; acceleration is mostly cruise). Batch = (x, y) with y (B, 2)
    float32 from DeviceDataset(continuous_labels=...)."""

    def loss_fn(params, apply_fn, batch, rng=None):
        x, y = batch
        pred = apply_fn({"params": params}, x).astype(jnp.float32)  # (B, 2)
        err2 = (pred - y) ** 2
        steer_mse = err2[:, 0].mean()
        accel_mse = err2[:, 1].mean()
        loss = steer_weight * steer_mse + accel_weight * accel_mse
        return loss, {
            "loss": loss,
            "steer_mse": steer_mse,
            "accel_mse": accel_mse,
            "steer_mae": jnp.abs(pred[:, 0] - y[:, 0]).mean(),
            "accel_mae": jnp.abs(pred[:, 1] - y[:, 1]).mean(),
        }

    return loss_fn


def dual_stream_loss_fn(params, apply_fn, batch, rng=None):
    """(x_raw, x_seg, y) batch for DualStreamCNN (reference train.py:205-239)."""
    x, x_seg, y = batch
    logits = apply_fn({"params": params}, x, x_seg)
    loss = cross_entropy(logits, y)
    return loss, {"loss": loss, "accuracy": accuracy(logits, y)}


def vae_loss_fn(alpha: float = 0.75, beta: float = 0.1):
    def loss_fn(params, apply_fn, batch, rng=None):
        x = batch[0] if isinstance(batch, tuple) else batch
        recon, mu, log_var = apply_fn({"params": params}, x, rng)
        recon_loss = jnp.mean((x.astype(jnp.float32) - recon) ** 2)
        kl = kl_divergence(mu, log_var)
        loss = alpha * recon_loss + beta * kl
        return loss, {"loss": loss, "recon_loss": recon_loss, "kl_loss": kl}

    return loss_fn


def aux_loss_fn(recon_weight: float = 0.0, traffic_weight: float = 0.0,
                action_weight: float = 1.0):
    def loss_fn(params, apply_fn, batch, rng=None):
        (frames, sensor), y = batch  # y: (B, 2) = (trafficlight, action)
        recon, traffic_logits, action_logits = apply_fn({"params": params}, (frames, sensor))
        recon_loss = jnp.mean((frames.astype(jnp.float32) - recon) ** 2)
        traffic_loss = cross_entropy(traffic_logits, y[:, 0])
        action_loss = cross_entropy(action_logits, y[:, 1])
        loss = (recon_weight * recon_loss + traffic_weight * traffic_loss
                + action_weight * action_loss)
        return loss, {
            "loss": loss,
            "image_recons_loss": recon_loss,
            "traffic_loss": traffic_loss,
            "autopilot_action_loss": action_loss,
            "accuracy": accuracy(action_logits, y[:, 1]),
        }

    return loss_fn


def mean_iou(seg_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean intersection-over-union over the classes PRESENT in the batch
    (union > 0) — the standard segmentation quality score. seg_logits
    (B, H, W, C) float, labels (B, H, W) int."""
    preds = jnp.argmax(seg_logits, axis=-1)
    n_classes = seg_logits.shape[-1]
    ious = []
    present = []
    for c in range(n_classes):
        p = preds == c
        y = labels == c
        inter = jnp.sum(p & y)
        union = jnp.sum(p | y)
        ious.append(inter / jnp.maximum(union, 1))
        present.append(union > 0)
    ious = jnp.stack(ious)
    present = jnp.stack(present)
    return jnp.sum(jnp.where(present, ious, 0.0)) / jnp.maximum(
        jnp.sum(present), 1)


def aux_seg_loss_fn(recon_weight: float = 0.0, traffic_weight: float = 0.0,
                    action_weight: float = 1.0, seg_weight: float = 0.5):
    """Multi-task BC with the auxiliary semantic-segmentation decoder
    (BASELINE config #3): the aux_loss_fn terms plus per-pixel CE of the
    seg head against the renderer's semantic ground truth, and mIoU as a
    tracked metric. Batch contract: ((frames, sensor), (traffic, action),
    seg_labels (B, H, W) int32) — AuxSegDataset (data/pipeline.py)."""

    def loss_fn(params, apply_fn, batch, rng=None):
        (frames, sensor), y, seg_y = batch
        recon, traffic_logits, action_logits, seg_logits = apply_fn(
            {"params": params}, (frames, sensor))
        recon_loss = jnp.mean((frames.astype(jnp.float32) - recon) ** 2)
        traffic_loss = cross_entropy(traffic_logits, y[:, 0])
        action_loss = cross_entropy(action_logits, y[:, 1])
        n_cls = seg_logits.shape[-1]
        seg_loss = cross_entropy(seg_logits.reshape(-1, n_cls),
                                 seg_y.reshape(-1))
        loss = (recon_weight * recon_loss + traffic_weight * traffic_loss
                + action_weight * action_loss + seg_weight * seg_loss)
        return loss, {
            "loss": loss,
            "image_recons_loss": recon_loss,
            "traffic_loss": traffic_loss,
            "autopilot_action_loss": action_loss,
            "seg_loss": seg_loss,
            "seg_miou": mean_iou(seg_logits, seg_y),
            "accuracy": accuracy(action_logits, y[:, 1]),
        }

    return loss_fn


def world_model_loss_fn(recon_weight: float = 1.0, latent_weight: float = 1.0,
                        pred_image_weight: float = 1.0, image_loss: str = "mse"):
    """Latent world-model loss (reference reports/figures architecture:
    reconstruction + predicted-latent + predicted-image terms; image term
    selectable MSE or MS-SSIM per the Results.xlsx sweep plan)."""

    def image_term(a, b):
        if image_loss == "ms_ssim":
            from carla_imitation_learning_tpu.ops.ssim import ms_ssim_loss

            flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
            return ms_ssim_loss(flat(a), flat(b))
        return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)

    def loss_fn(params, apply_fn, batch, rng=None):
        frames, actions = batch  # (B, T, H, W, C), (B, T)
        recon, z, z_pred, frames_pred = apply_fn({"params": params}, frames, actions)
        recon_loss = image_term(recon, frames)
        latent_loss = jnp.mean(
            (z_pred - jax.lax.stop_gradient(z[:, 1:])) ** 2)
        pred_image_loss = image_term(frames_pred, frames[:, 1:])
        loss = (recon_weight * recon_loss + latent_weight * latent_loss
                + pred_image_weight * pred_image_loss)
        return loss, {"loss": loss, "recon_loss": recon_loss,
                      "latent_pred_loss": latent_loss,
                      "image_pred_loss": pred_image_loss}

    return loss_fn


def cil_loss_fn(speed_weight: float = 0.1):
    def loss_fn(params, apply_fn, batch, rng=None):
        frames, speed, command, y = batch
        logits, pred_speed = apply_fn({"params": params}, frames, speed, command)
        action_loss = cross_entropy(logits, y)
        speed_loss = jnp.mean((pred_speed - speed) ** 2)
        loss = action_loss + speed_weight * speed_loss
        return loss, {
            "loss": loss,
            "action_loss": action_loss,
            "speed_loss": speed_loss,
            "accuracy": accuracy(logits, y),
        }

    return loss_fn


def rnn_bc_loss_fn(params, apply_fn, batch, rng=None):
    """Sequence BC for RecurrentPolicy: mean CE over every step of every
    sequence (labels are the expert actions AT each frame; sequences are
    episode-boundary-safe by SequenceDataset construction)."""
    frames_seq, actions_seq = batch
    logits, _ = apply_fn({"params": params}, frames_seq)  # (B, T, A)
    loss = cross_entropy(logits.reshape((-1,) + logits.shape[2:]),
                         actions_seq.reshape(-1))
    acc = accuracy(logits, actions_seq)
    return loss, {"loss": loss, "accuracy": acc}
