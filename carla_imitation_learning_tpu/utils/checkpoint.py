"""Checkpointing: Orbax-backed sharded save/restore with best-k retention.

Replaces PL's ModelCheckpoint(monitor='val_loss', save_top_k=1, mode='min')
(reference train.py:106-111) and load_from_checkpoint (train.py:198-201).
Checkpoints are sharded pytrees (params, opt state, step, rng, anything) —
safe under a multi-device mesh; Orbax handles per-shard IO.
"""

from __future__ import annotations

import json
import math
import shutil
from pathlib import Path
from typing import Any


class BestKCheckpointManager:
    def __init__(
        self,
        directory: str | Path,
        monitor: str = "val_loss",
        mode: str = "min",
        save_top_k: int = 1,
        save_last: bool = False,
        filename: str = "ckpt",
    ):
        assert mode in ("min", "max")
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.filename = filename
        self._index_path = self.directory / "index.json"
        self._index: list[dict] = []
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())
        self._ckptr = None

    @property
    def checkpointer(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def _score(self, metrics: dict) -> float:
        v = float(metrics.get(self.monitor, math.nan))
        return v if self.mode == "min" else -v

    def _write_index(self) -> None:
        self._index_path.write_text(json.dumps(self._index, indent=1))

    def save(self, step: int, state: Any, metrics: dict) -> Path | None:
        """Save if within top-k on the monitored metric; prune the worst."""
        score = self._score(metrics)
        path = self.directory / f"{self.filename}-step{step}"
        keep = (
            len([e for e in self._index if not e.get("is_last")]) < self.save_top_k
            or score < max(e["score"] for e in self._index if not e.get("is_last"))
        )
        if keep and not math.isnan(score):
            if path.exists():
                shutil.rmtree(path)
            self.checkpointer.save(path, state)
            self.checkpointer.wait_until_finished()
            self._index.append({
                "step": int(step), "score": score, "path": str(path),
                "metric": float(metrics.get(self.monitor, math.nan)),
            })
            ranked = sorted([e for e in self._index if not e.get("is_last")],
                            key=lambda e: e["score"])
            for e in ranked[self.save_top_k:]:
                self._index.remove(e)
                shutil.rmtree(e["path"], ignore_errors=True)
            self._write_index()
        else:
            path = None
        if self.save_last:
            last = self.directory / f"{self.filename}-last"
            if last.exists():
                shutil.rmtree(last)
            self.checkpointer.save(last, state)
            self.checkpointer.wait_until_finished()
        return path

    @property
    def best(self) -> dict | None:
        ranked = sorted([e for e in self._index if not e.get("is_last")],
                        key=lambda e: e["score"])
        return ranked[0] if ranked else None

    def restore(self, target: Any, path: str | Path | None = None) -> Any:
        """Restore into the structure/shardings of ``target`` (abstract ok)."""
        if path is None:
            best = self.best
            if best is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = best["path"]
        return self.checkpointer.restore(Path(path).resolve(), target)


def save_pytree(path: str | Path, tree: Any) -> None:
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    if p.exists():
        shutil.rmtree(p)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(p, tree)
    ckptr.wait_until_finished()


def restore_pytree(path: str | Path, target: Any) -> Any:
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(Path(path).resolve(), target)


def restore_params(path: str | Path, params_template: Any) -> Any:
    """Model params from EITHER checkpoint payload shape: params-only
    (``save_pytree({"params": ...})`` — export/import/test fixtures) or a
    full training checkpoint (``{"params", "opt_state", "step"}`` — what
    BestKCheckpointManager saves each epoch, i.e. every ``best_path``).
    Restores templateless (this orbax has no partial_restore), takes the
    params subtree, and casts leaves onto the template's dtypes; a tree
    mismatch fails loudly via tree_map, and a LEAF SHAPE mismatch (e.g. a
    9-action checkpoint into an n_actions=5 model) raises instead of loading
    silently — the apply would run and emit garbage otherwise."""
    import jax
    import jax.numpy as jnp
    import numpy as _np
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(Path(path).resolve())
    if isinstance(raw, dict) and "ema_params" in raw:
        # EMA-tracked checkpoint: the best-k val metric that selected this
        # file was scored on the EMA shadow (loop.py), so that IS the
        # deployable set — serve it, not the raw training params.
        src = raw["ema_params"]
    else:
        src = raw.get("params", raw) if isinstance(raw, dict) else raw
    if isinstance(src, dict) and isinstance(params_template, dict) and \
            set(src) != set(params_template) and "params" in src:
        src = src["params"]  # {"params": {"params": ...}} templates

    def _cast(keypath, t, a):
        ts = getattr(t, "shape", None)
        if ts is not None and tuple(_np.shape(a)) != tuple(ts):
            raise ValueError(
                f"checkpoint {path} leaf {jax.tree_util.keystr(keypath)} has "
                f"shape {tuple(_np.shape(a))} but the model expects "
                f"{tuple(ts)} — wrong n_actions/n_commands/frame_skip or "
                "policy_family for this checkpoint?")
        return jnp.asarray(a, getattr(t, "dtype", None))

    return jax.tree_util.tree_map_with_path(_cast, params_template, src)
