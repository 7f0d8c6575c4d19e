"""Callback implementations.

Parity map (reference → here):
- ExampleCallback (custom_callbacks.py:4-15)        → ExampleCallback
- UnfreezeModelCallback (custom_callbacks.py:18-29) → UnfreezeModelCallback
  (freezing in optax terms: a zero-update mask until wait_epochs)
- SaveCodeToWandb (wandb_callbacks.py:25-39)        → SaveCodeSnapshot (zip to
  the run dir; uploads to wandb when a run is live)
- UploadAllCheckpointsToWandb (:42-60)              → UploadCheckpointsToWandb
- SaveMetricsHeatmapToWandb (:63-106)               → SaveMetricsHeatmap
  (per-class precision/recall/f1 table, CSV + optional wandb; no sklearn)
- SaveConfusionMatrixToWandb (:109-148)             → SaveConfusionMatrix
- SaveBestMetricScoresToWandb (:151-188)            → SaveBestMetricScores
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import numpy as np

from carla_imitation_learning_tpu.data.stats import (
    confusion_matrix, per_class_prf, predictions_and_labels,
)


class Callback:
    def on_fit_start(self, trainer, state, **kw):
        pass

    def on_epoch_end(self, trainer, state, epoch, metrics, loaders, **kw):
        pass

    def on_fit_end(self, trainer, state, history, **kw):
        pass


class ExampleCallback(Callback):
    def __init__(self):
        print("Callback initialized.")

    def on_fit_start(self, trainer, state, **kw):
        print("Starting to train!")

    def on_fit_end(self, trainer, state, history, **kw):
        print("Training is done.")


class UnfreezeModelCallback(Callback):
    """Zero out updates for matching params until wait_epochs have passed
    (reference unfreezes requires_grad at wait_epochs, custom_callbacks.py:18-29).

    Usage: wrap your optimizer with ``optax.multi_transform`` or simply read
    ``self.frozen`` inside a masked tx; this callback flips the flag, and the
    Trainer's loss_fn can consult it via ``trainer.callbacks``.
    """

    def __init__(self, wait_epochs: int = 5):
        self.wait_epochs = wait_epochs
        self.frozen = True

    def on_epoch_end(self, trainer, state, epoch, metrics, loaders, **kw):
        if epoch + 1 >= self.wait_epochs:
            self.frozen = False


def _wandb_run():
    try:
        import wandb

        return wandb.run
    except Exception:
        return None


class SaveCodeSnapshot(Callback):
    """Zip the framework source next to the run logs (code artifact)."""

    def __init__(self, out_dir: str, code_dir: str | None = None):
        self.out_dir = Path(out_dir)
        self.code_dir = Path(code_dir) if code_dir else Path(__file__).resolve().parents[1]

    def on_fit_start(self, trainer, state, **kw):
        self.out_dir.mkdir(parents=True, exist_ok=True)
        out = self.out_dir / "code_snapshot.zip"
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for p in sorted(self.code_dir.rglob("*.py")):
                z.write(p, p.relative_to(self.code_dir.parent))
        run = _wandb_run()
        if run is not None:
            run.log_code(str(self.code_dir))


class UploadCheckpointsToWandb(Callback):
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = Path(ckpt_dir)

    def on_fit_end(self, trainer, state, history, **kw):
        run = _wandb_run()
        if run is None:
            return
        import wandb

        art = wandb.Artifact("experiment-ckpts", type="checkpoints")
        if self.ckpt_dir.exists():
            art.add_dir(str(self.ckpt_dir))
        run.log_artifact(art)


class _ValPredictionCallback(Callback):
    """Shared: compute val-set predictions at fit end."""

    def __init__(self, n_classes: int = 9, head: int | None = None,
                 out_dir: str | None = None):
        self.n_classes = n_classes
        self.head = head
        self.out_dir = Path(out_dir) if out_dir else None

    def _preds(self, state, loaders):
        return predictions_and_labels(state.apply_fn, state.params,
                                      loaders["val_dataloader"], self.head)


class SaveMetricsHeatmap(_ValPredictionCallback):
    """Per-class precision/recall/f1 'heatmap' table (wandb_callbacks.py:63-106)."""

    def on_fit_end(self, trainer, state, history, loaders=None, **kw):
        if loaders is None:
            return
        preds, labels = self._preds(state, loaders)
        p, r, f1 = per_class_prf(labels, preds, self.n_classes)
        table = {"precision": p.tolist(), "recall": r.tolist(), "f1": f1.tolist()}
        if self.out_dir:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            (self.out_dir / "per_class_metrics.json").write_text(json.dumps(table, indent=1))
        run = _wandb_run()
        if run is not None:
            import wandb

            run.log({"f1_p_r_heatmap": wandb.Table(
                columns=["class", "precision", "recall", "f1"],
                data=[[i, p[i], r[i], f1[i]] for i in range(self.n_classes)])})
        self.last = table


class SaveConfusionMatrix(_ValPredictionCallback):
    """Confusion matrix at fit end (wandb_callbacks.py:109-148)."""

    def on_fit_end(self, trainer, state, history, loaders=None, **kw):
        if loaders is None:
            return
        preds, labels = self._preds(state, loaders)
        cm = confusion_matrix(labels, preds, self.n_classes)
        if self.out_dir:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            np.save(self.out_dir / "confusion_matrix.npy", cm)
        run = _wandb_run()
        if run is not None:
            import wandb

            run.log({"confusion_matrix": wandb.Table(
                columns=[str(i) for i in range(self.n_classes)],
                data=cm.tolist())})
        self.last = cm


class SaveBestMetricScores(Callback):
    """Track best train/val loss+accuracy so far, log each epoch
    (wandb_callbacks.py:151-188)."""

    def __init__(self):
        self.best: dict[str, float] = {}

    def on_epoch_end(self, trainer, state, epoch, metrics, loaders, **kw):
        for key, mode in (("train_loss", min), ("val_loss", min),
                          ("train_accuracy", max), ("val_accuracy", max)):
            if key in metrics:
                cur = self.best.get(f"best_{key}")
                self.best[f"best_{key}"] = metrics[key] if cur is None else mode(cur, metrics[key])
        if trainer.logger is not None and self.best:
            trainer.logger.add_scalars_flat(dict(self.best), step=epoch)
