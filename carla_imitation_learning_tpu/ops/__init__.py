"""Pallas TPU kernels: the hand-written fast paths.

- ``raster``  — tile z-buffer rasterizer (the hot op of closed-loop rollouts).
- ``augment`` — fused on-device image augmentation for the BC input pipeline.
"""

from carla_imitation_learning_tpu.ops.raster import rasterize_pallas  # noqa: F401
