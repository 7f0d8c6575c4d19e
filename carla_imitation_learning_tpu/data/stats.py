"""Evaluation statistics.

Reference parity:
- ``calculate_accuracy`` — argmax accuracy over a loader split
  (src/data/stat.py:4-45).
- ``predictions_and_labels`` + ``save_predictions`` — the offline eval that
  prints per-batch accuracy and dumps predWlabels.npy
  (ImitationAux.calc_accuracy, imitation.py:161-203).
- ``action_histogram`` — the label-distribution view behind
  ImitationAux.sample_output (imitation.py:205-235).
- ``confusion_matrix`` / ``per_class_prf`` — the metric math behind the wandb
  heatmap/confusion callbacks (wandb_callbacks.py:63-148), implemented
  directly (no sklearn dependency).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def _batch_logits(apply_fn, params, x, head: int | None):
    out = apply_fn({"params": params}, x)
    if isinstance(out, tuple):
        out = out[head if head is not None else -1]
    return out


def predictions_and_labels(apply_fn, params, loader, head: int | None = None,
                           verbose: bool = False):
    """→ (predicted (N,), labels (N,)) over a loader. For aux batches
    ((x, sensor), (traffic, action)) the action column is used."""
    pred_fn = jax.jit(lambda p, x: jnp.argmax(_batch_logits(apply_fn, p, x, head), -1))
    preds, labels = [], []
    for i, (x, y) in enumerate(loader):
        if isinstance(y, (tuple, list)):
            y = y[-1]
        if hasattr(y, "ndim") and y.ndim == 2:  # aux target (traffic, action)
            y = y[:, 1]
        p = pred_fn(params, x)
        preds.append(np.asarray(p))
        labels.append(np.asarray(y))
        if verbose:
            acc = float((preds[-1] == labels[-1]).mean())
            print(f"batch {i}/{len(loader)} - batch acc: {acc}")
    return np.concatenate(preds), np.concatenate(labels)


def calculate_accuracy(apply_fn, params, data_iterator, key: str = "val_dataloader",
                       head: int | None = None) -> float:
    """Split accuracy (reference stat.calculate_accuracy, stat.py:4-45)."""
    preds, labels = predictions_and_labels(apply_fn, params, data_iterator[key], head)
    return float((preds == labels).mean())


def save_predictions(apply_fn, params, loader, out_path: str = "predWlabels.npy",
                     head: int | None = None) -> Path:
    """predWlabels.npy dump (reference imitation.py:193-197)."""
    preds, labels = predictions_and_labels(apply_fn, params, loader, head, verbose=True)
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.save(out, {"predicted": preds, "labels": labels}, allow_pickle=True)
    print(f"accuracy total: {(preds == labels).sum()}/{len(labels)}")
    return out


def action_histogram(labels: np.ndarray, n_classes: int = 9) -> np.ndarray:
    return np.bincount(np.asarray(labels).astype(int), minlength=n_classes)


def sample_output_plot(apply_fn, params, loader, out_path: str,
                       n_classes: int = 9, head: int | None = None) -> Path:
    """Predicted-vs-label action histogram PNG — the plot artifact of the
    reference's ImitationAux.sample_output (imitation.py:205-235)."""
    preds, labels = predictions_and_labels(apply_fn, params, loader, head)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.arange(n_classes)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(x - 0.2, action_histogram(labels, n_classes), width=0.4,
           label="labels")
    ax.bar(x + 0.2, action_histogram(preds, n_classes), width=0.4,
           label="predicted")
    ax.set_xlabel("discrete action class")
    ax.set_ylabel("count")
    ax.set_xticks(x)
    ax.legend()
    ax.set_title("action distribution: labels vs predictions")
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out


def confusion_matrix(labels, preds, n_classes: int) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    np.add.at(cm, (np.asarray(labels).astype(int), np.asarray(preds).astype(int)), 1)
    return cm


def per_class_prf(labels, preds, n_classes: int):
    """→ (precision, recall, f1) arrays of shape (n_classes,)."""
    cm = confusion_matrix(labels, preds, n_classes)
    tp = np.diag(cm).astype(np.float64)
    precision = tp / np.maximum(cm.sum(axis=0), 1)
    recall = tp / np.maximum(cm.sum(axis=1), 1)
    f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-12)
    return precision, recall, f1
