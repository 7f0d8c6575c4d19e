"""Camera rendering: RGB + semantic frames from the sim scene graph.

TPU-native replacement for CARLA's UnrealEngine renderer (the source of the
reference's camera/semantic training frames, SURVEY.md L0). Two backends with
identical semantics:

- ``jax_raster``   — pure-JAX chunked z-buffer rasterizer (XLA-fused scan over
  triangle chunks); runs everywhere, the correctness reference.
- ``ops.raster``   — Pallas tile kernel (VMEM z-buffer, per-tile triangle
  culling); the TPU fast path.

Pipeline: scene assembly (triangles, world space) → 2D-homogeneous projection
(edge/interpolation coefficient setup, batched matmuls) → tile rasterization.
Projection uses homogeneous edge functions (no near-plane clipping needed:
triangles crossing the eye plane rasterize correctly).
"""

from carla_imitation_learning_tpu.render.geometry import (  # noqa: F401
    SEM_SKY, SEM_TERRAIN, SEM_ROAD, SEM_BUILDING, SEM_VEHICLE, SEM_LIGHT,
    SEMANTIC_PALETTE, StaticScene, build_static_scene, assemble_scene,
)
from carla_imitation_learning_tpu.render.camera import (  # noqa: F401
    Camera, camera_from_ego, project_triangles,
)
from carla_imitation_learning_tpu.render.jax_raster import rasterize_jax  # noqa: F401
from carla_imitation_learning_tpu.render.pipeline import (  # noqa: F401
    RenderConfig, make_renderer,
)
from carla_imitation_learning_tpu.render.weather import (  # noqa: F401
    apply_fog, apply_rain, visibility_far,
)
from carla_imitation_learning_tpu.render.lidar import (  # noqa: F401
    cast_rays, lidar_image, make_lidar,
)
