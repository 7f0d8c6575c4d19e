"""carla_imitation_learning_tpu — a TPU-native driving-simulation + imitation-learning framework.

A brand-new framework (JAX / XLA / Pallas / pjit) with the capabilities of the
reference ``HemuManju/carla-imitation-learning`` codebase, redesigned TPU-first:

- ``config``   — layered YAML/dict experiment composition (reference: configs/ + hydra
  compose API in train.py:17,95).
- ``data``     — CARLA-style frame-log data contract, 9-class action discretizer,
  on-device 4-frame-stacking input pipeline (reference: src/dataset/*).
- ``models``   — flax.linen model zoo: PolicyCNN, DualStreamCNN, ConvVAE, AuxNet,
  BranchedCILPolicy (reference: src/architectures/nets.py).
- ``training`` — jit'd train steps (BC, VAE, aux multi-task), optax optimizers,
  epoch loop, checkpointing (reference: src/models/*, train.py).
- ``parallel`` — device mesh, sharding rules, vmap'd HPO sweeps, multi-host init
  (reference: ray_trainer.py, PL gpus= data-parallel path).
- ``sim``      — NEW: batched on-device world simulator (kinematic bicycle +
  tire slip, traffic agents, lights, collisions) replacing CARLA's C++ server.
- ``render``   — NEW: Pallas tile rasterizer producing RGB/semantic camera frames.
- ``ops``      — Pallas TPU kernels + fused ops.
- ``callbacks``— training callbacks (checkpoint, confusion matrix, metric heatmaps,
  best-metric tracking; reference: src/callbacks/*).
- ``utils``    — logging/metrics sinks, profiling, misc (reference: utils.py).
"""

__version__ = "0.1.0"

from carla_imitation_learning_tpu.config import compose  # noqa: F401
