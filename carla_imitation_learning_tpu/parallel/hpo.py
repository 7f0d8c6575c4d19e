"""Hyperparameter search: vmap'd sweeps + a tune-like driver.

The reference's HPO path is Ray Tune's ``tune.run(trainable, num_samples=4,
metric='mean_accuracy')`` over a torch-DDP trainable (ray_trainer.py:39-53;
latently broken and never invoked). The TPU-native designs:

1. ``vmap_sweep`` — vectorize the *whole training run* over a hyperparameter
   axis: one compiled program trains all trials simultaneously (each trial's
   params are one slice of a stacked pytree). Ideal for small nets like the
   reference's ~1M-param CNNs — trials batch onto the MXU together.
2. ``tune_run`` — sequential/sharded trial driver with the familiar
   (num_samples, metric, mode) surface for arbitrary non-vmappable trainables,
   including per-trial checkpointing like Ray's ``distributed_checkpoint_dir``
   (ray_trainer.py:66-77).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from pathlib import Path
from typing import Any, Callable, Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Trial:
    trial_id: int
    config: dict
    metrics: dict
    checkpoint_path: str | None = None
    error: str | None = None  # traceback of a failed trial (sweep continues)

    @property
    def failed(self) -> bool:
        return self.error is not None


def grid_space(space: Mapping[str, Sequence[Any]]) -> list[dict]:
    keys = list(space.keys())
    return [dict(zip(keys, combo)) for combo in itertools.product(*space.values())]


def sample_space(space: Mapping[str, Any], num_samples: int, seed: int = 0) -> list[dict]:
    """Random search: values may be sequences (choice) or (lo, hi) tuples of
    floats (log-uniform when both positive)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_samples):
        cfg = {}
        for k, v in space.items():
            if isinstance(v, tuple) and len(v) == 2 and all(
                    isinstance(x, (int, float)) for x in v):
                lo, hi = float(v[0]), float(v[1])
                if lo > 0 and hi > 0:
                    cfg[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
                else:
                    cfg[k] = float(rng.uniform(lo, hi))
            else:
                cfg[k] = v[rng.integers(len(v))]
        out.append(cfg)
    return out


def tune_run(
    trainable: Callable[[dict], dict],
    space: Mapping[str, Any] | None = None,
    trial_configs: Sequence[dict] | None = None,
    num_samples: int = 4,
    metric: str = "mean_accuracy",
    mode: str = "max",
    seed: int = 0,
    results_dir: str | None = None,
    checkpoint_fn: Callable[[int, dict], str] | None = None,
    max_concurrent: int = 1,
) -> tuple[Trial, list[Trial]]:
    """Run trials of ``trainable(config) -> metrics`` and return (best, all).

    Mirrors the surface of reference ray_trainer.py:49-53 without the broken
    plumbing. ``trial_configs`` (explicit grid) overrides random sampling.

    Fault tolerance matches Ray's trial-level isolation: a RAISING trainable
    records a failed Trial (``error`` = traceback) and the sweep continues;
    only an all-failed sweep raises. ``max_concurrent > 1`` runs trials on a
    thread pool (Ray ran 4 concurrent trials, ray_trainer.py:49-53) —
    concurrency overlaps each trial's host-side work (tracing, data prep,
    metric fetches) while the device interleaves their dispatched programs.
    The trainable must be thread-isolated: no shared mutable loaders/PRNGs
    (DeviceDataset.fork gives per-trial loader state over shared device
    arrays — see the `hpo` experiment).
    """
    if trial_configs is None:
        if space is None:
            raise ValueError("need space or trial_configs")
        trial_configs = sample_space(space, num_samples, seed)

    def run_one(i_tc):
        i, tc = i_tc
        try:
            metrics = trainable(dict(tc))
            ckpt = checkpoint_fn(i, metrics) if checkpoint_fn else None
            return Trial(i, dict(tc), dict(metrics), ckpt)
        except Exception:  # noqa: BLE001 — trial-level fault isolation
            import traceback

            return Trial(i, dict(tc), {}, None, error=traceback.format_exc())

    if max_concurrent > 1 and len(trial_configs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            trials = list(pool.map(run_one, enumerate(trial_configs)))
    else:
        trials = [run_one(x) for x in enumerate(trial_configs)]
    ok = [t for t in trials if not t.failed]
    if not ok:
        raise RuntimeError(
            "every trial failed; first error:\n" + (trials[0].error or ""))
    sign = -1.0 if mode == "max" else 1.0
    best = min(ok, key=lambda t: sign * float(t.metrics.get(metric, float("inf") * sign)))
    if results_dir:
        p = Path(results_dir)
        p.mkdir(parents=True, exist_ok=True)
        (p / "trials.json").write_text(json.dumps(
            [dataclasses.asdict(t) for t in trials], indent=1, default=str))
    return best, trials


def vmap_sweep(
    init_fn: Callable[[jax.Array, jnp.ndarray], Any],
    train_fn: Callable[[Any, jnp.ndarray], tuple[Any, dict]],
    hparam_values: jnp.ndarray,
    rng: jax.Array,
) -> tuple[Any, dict]:
    """Vectorized sweep: ``init_fn(rng, h)`` builds one trial's state,
    ``train_fn(state, h)`` trains it; both are vmapped over the trial axis so
    ALL trials run inside one jit program.

    Returns stacked (states, metrics) — index trial i with tree_map(x[i]).
    """
    rngs = jax.random.split(rng, hparam_values.shape[0])
    states = jax.vmap(init_fn)(rngs, hparam_values)
    return jax.jit(jax.vmap(train_fn))(states, hparam_values)


def pbt_run(
    init_fn: Callable[[jax.Array, jnp.ndarray], Any],
    train_fn: Callable[[Any, jnp.ndarray], tuple[Any, dict]],
    hparam_init: jnp.ndarray,
    rng: jax.Array,
    metric: str = "score",
    mode: str = "max",
    n_generations: int = 5,
    exploit_frac: float = 0.25,
    perturb: tuple[float, float] = (0.8, 1.25),
):
    """Population Based Training over a vmapped population.

    The whole population trains as ONE jit program per generation
    (``jax.vmap(train_fn)``), then an on-device exploit/explore step replaces
    the bottom ``exploit_frac`` of members with perturbed copies of the top:
    truncation selection as in Jaderberg et al. 2017, but with zero host
    round-trips inside a generation — ranking (argsort on the metric),
    weight copying (one gather over the stacked pytree) and hyperparameter
    perturbation (random ×0.8 / ×1.25) are all compiled. This supersedes the
    reference's Ray Tune surface (ray_trainer.py:49-53) for schedules Ray
    could only express with its PopulationBasedTraining scheduler.

    init_fn(rng, h) -> state;  train_fn(state, h) -> (state, metrics) runs one
    generation segment; ``hparam_init`` is (P,) or (P, K).

    Returns (states, hparams, history) — history is a list of per-generation
    {metric, hparams} numpy snapshots (host-fetched once per generation).
    """
    P = hparam_init.shape[0]
    n_exploit = max(1, int(P * exploit_frac))
    sign = 1.0 if mode == "max" else -1.0
    states = jax.vmap(init_fn)(jax.random.split(rng, P), hparam_init)
    seg = jax.jit(jax.vmap(train_fn))

    @jax.jit
    def exploit_explore(states, h, scores, key):
        order = jnp.argsort(sign * scores)  # worst → best
        src = jnp.arange(P, dtype=jnp.int32)
        # bottom n copies from top n (pairing worst-i ← best-i)
        src = src.at[order[:n_exploit]].set(order[P - n_exploit:])
        replaced = src != jnp.arange(P)
        states = jax.tree_util.tree_map(lambda x: jnp.take(x, src, axis=0), states)
        h_src = jnp.take(h, src, axis=0)
        factors = jnp.where(
            jax.random.bernoulli(key, 0.5, h_src.shape),
            perturb[1], perturb[0])
        mask = replaced.reshape((P,) + (1,) * (h_src.ndim - 1))
        return states, jnp.where(mask, h_src * factors, h_src)

    h = jnp.asarray(hparam_init)
    history = []
    for g in range(n_generations):
        rng, kseg, kex = jax.random.split(rng, 3)
        states, metrics = seg(states, h)
        scores = jnp.asarray(metrics[metric], jnp.float32)
        history.append({"generation": g,
                        metric: np.asarray(scores).copy(),
                        "hparams": np.asarray(h).copy()})
        if g < n_generations - 1:
            states, h = exploit_explore(states, h, scores, kex)
    return states, h, history
