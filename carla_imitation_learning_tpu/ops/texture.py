"""Procedural surface textures — perspective-correct, memory-fetch-free.

CARLA's renderer drapes sampled texture atlases over its meshes; the
TPU-native equivalent avoids per-pixel gathers entirely: surface detail is a
pure VPU function of the perspective-correct world-space surface point. The
projection stage emits two extra interpolation rows per triangle
(``unum``/``vnum``, built exactly like the depth numerator ``znum`` —
render/camera.py), so a pixel's (u, v) costs two affine evals + two divides,
and the pattern itself is a handful of elementwise ops.

``texture_factor`` is THE single pattern definition: both rasterizer
backends (render/jax_raster.py and the ops/raster.py Pallas kernel) call
this same function, so their textured outputs stay pixel-exact with each
other by construction — the same guarantee the flat-shaded parity tests
rely on.

UV parameterization (set in camera.project_triangles from world vertices —
no per-vertex attribute plumbing needed):
  - SEM_BUILDING walls: u = world x + y (runs along either axis-aligned
    facade), v = world z (height) → window grid with floors every 2.5 m.
  - SEM_ROAD / SEM_TERRAIN: u, v = world x, y → cell-quantized speckle
    (asphalt aggregate / grass mottle).
  - everything else: factor 1.0 (flat).
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_imitation_learning_tpu.render.geometry import (
    SEM_BUILDING, SEM_ROAD, SEM_TERRAIN,
)

# Window grid: 1/0.7 ≈ 1.4 m column pitch, 1/0.4 = 2.5 m floor pitch.
_WIN_U, _WIN_V = 0.7, 0.4
# Hash-noise cell sizes (1/freq meters) and contrast per class.
_ROAD_FREQ, _ROAD_BASE, _ROAD_AMP = 2.0, 0.88, 0.24
_TERR_FREQ, _TERR_BASE, _TERR_AMP = 0.5, 0.92, 0.16


def _cell_noise(u, v, freq: float):
    """Deterministic per-cell hash in [0, 1) (classic sin-dot fract hash,
    quantized to a freq-spaced grid so each cell reads as one speckle)."""
    cu = jnp.floor(u * freq)
    cv = jnp.floor(v * freq)
    h = jnp.sin(cu * 12.9898 + cv * 78.233) * 43758.5453
    return h - jnp.floor(h)


def texture_factor(u, v, cls):
    """Multiplicative shading factor for surface point (u, v) of semantic
    class ``cls``. Shapes broadcast (tiles in the Pallas kernel, (C, H, W)
    chunks in the XLA reference); cls may be scalar or broadcastable."""
    wx = u * _WIN_U - jnp.floor(u * _WIN_U)
    wy = v * _WIN_V - jnp.floor(v * _WIN_V)
    window = (wx > 0.2) & (wx < 0.8) & (wy > 0.25) & (wy < 0.75)
    fac_building = jnp.where(window, 0.55, 1.05)
    fac_road = _ROAD_BASE + _ROAD_AMP * _cell_noise(u, v, _ROAD_FREQ)
    fac_terrain = _TERR_BASE + _TERR_AMP * _cell_noise(u, v, _TERR_FREQ)
    return jnp.where(cls == SEM_BUILDING, fac_building,
                     jnp.where(cls == SEM_ROAD, fac_road,
                               jnp.where(cls == SEM_TERRAIN, fac_terrain,
                                         1.0)))
