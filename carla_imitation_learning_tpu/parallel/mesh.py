"""Device mesh + sharding helpers.

The scaling recipe: build a Mesh, annotate array shardings (batch/env axes on
'data', params replicated — 'model' axis reserved for TP), and let XLA insert
the collectives. Works identically on one chip, a v5p slice, or a CPU host
mesh forced with ``--xla_force_host_platform_device_count``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None, axis_sizes: dict[str, int] | None = None) -> Mesh:
    """Create a mesh from config (mesh.axes with -1 = all remaining devices)."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axes = dict(cfg.get_dotted("mesh.axes", {"data": -1})) if cfg is not None \
            else {"data": -1}
        axis_sizes = {str(k): int(v) for k, v in axes.items()}
    n = len(devices)
    fixed = 1
    wildcard = None
    for name, size in axis_sizes.items():
        if size == -1:
            if wildcard is not None:
                raise ValueError("only one mesh axis may be -1")
            wildcard = name
        else:
            fixed *= size
    if wildcard is not None:
        axis_sizes[wildcard] = max(1, n // fixed)
    total = int(np.prod(list(axis_sizes.values())))
    mesh_devices = np.asarray(devices[:total]).reshape(tuple(axis_sizes.values()))
    return Mesh(mesh_devices, tuple(axis_sizes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data", ndim_leading: int = 1) -> NamedSharding:
    """Shard the leading (batch/env) dim on ``axis``; rest replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a (pytree of) batch array(s) with the leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def shard_train_state(mesh: Mesh, state):
    """Replicate params/opt-state across the mesh (DP layout; TP would use
    per-param PartitionSpecs here)."""
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), state)


def maybe_mesh(cfg=None, batch_size: int | None = None) -> Mesh | None:
    """Mesh when >1 device is visible and the global batch divides evenly
    across them (or cfg forces mesh.enabled); else None — single-chip runs
    skip sharding entirely."""
    forced = bool(cfg.get_dotted("mesh.enabled", False)) if cfg is not None else False
    n = jax.device_count()
    if n <= 1 and not forced:
        return None
    if batch_size is not None and batch_size % n != 0 and not forced:
        return None
    return make_mesh(cfg)


def multihost_initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> bool:
    """Multi-process JAX runtime init — the TPU-native replacement for Ray's
    ``DistributedTrainableCreator(num_workers, num_workers_per_host)``
    (reference ray_trainer.py:41-45). Returns True when a multi-process
    runtime is (now) initialized.

    Resolution order, BEFORE touching any backend (calling
    ``jax.process_count()`` first would initialize the local backend and turn
    the subsequent ``jax.distributed.initialize`` into a silent no-op —
    round-1's bug):

    1. explicit ``coordinator_address``/``num_processes``/``process_id`` args;
    2. cluster env vars JAX understands (``JAX_COORDINATOR_ADDRESS`` et al. /
       TPU metadata), via argless ``jax.distributed.initialize()``;
    3. otherwise: single-process — return False without initializing anything.

    Raises RuntimeError when explicit args are given but initialization fails
    (never swallows a real multi-host misconfiguration).
    """
    import os

    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # already initialized (by a launcher)

    explicit = coordinator_address is not None
    env_driven = any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        # per-worker task id on multi-host Cloud TPU (never set single-chip)
        "CLOUD_TPU_TASK_ID"))
    # Cloud TPU pod slices set worker topology env instead of a coordinator
    # address; argless initialize() autodetects the cluster from TPU metadata
    # there (jax cluster.GceTpuCluster/GkeTpuCluster). Only a list of MORE
    # THAN ONE worker means multi-host — single-chip dev containers export
    # e.g. TPU_WORKER_HOSTNAMES=localhost.
    for k in ("TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES"):
        if len([h for h in os.environ.get(k, "").split(",") if h.strip()]) > 1:
            env_driven = True
    if not explicit and not env_driven:
        return False  # single-process dev run; leave the backend untouched

    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id, **kwargs)
        else:
            jax.distributed.initialize(**kwargs)
    except Exception as e:
        raise RuntimeError(
            f"multi-host initialization failed (coordinator="
            f"{coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')}, "
            f"num_processes={num_processes}, process_id={process_id}): {e}"
        ) from e
    return jax.process_count() > 1
