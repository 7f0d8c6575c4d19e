"""Render pipeline: world state → camera frames, as one jit-able function.

make_renderer() closes over the static scene and returns render(state) for a
single env — vmap it for fleets; the backend is selectable:
'jax' (portable scan rasterizer) or 'pallas' (TPU tile kernel).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from carla_imitation_learning_tpu.render import geometry as geo
from carla_imitation_learning_tpu.render.camera import camera_from_ego, project_triangles
from carla_imitation_learning_tpu.render.jax_raster import rasterize_jax, semantic_to_rgb
from carla_imitation_learning_tpu.sim import agents as agent_lib
from carla_imitation_learning_tpu.sim.town import TownMap
from carla_imitation_learning_tpu.sim.world import SimParams, WorldState

LUMA = jnp.asarray([0.299, 0.587, 0.114])  # reference imitation_dataset.py:121


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    height: int = 128
    width: int = 128
    fov_deg: float = 90.0
    max_triangles: int = 512
    near: float = 0.5
    far: float = 300.0
    backend: str = "jax"  # 'jax' | 'pallas'
    rgb: bool = True      # False → grayscale-only fast path (pallas backend)
    semantic: bool = True
    fast: bool = False    # grayscale-ONLY rollout kernel (ops/raster_fast.py):
                          # packed z|luma key, approx-reciprocal depth, corner
                          # -culled tile lists; no semantic/depth planes
    active_cap: int | None = None  # fast path: pre-compact the valid tris to
                                   # this table width (raster_fast.compact_setup)
    fog_density: float = 0.0  # exponential fog β (1/m); 0 = clear weather
    lod_px: float = -1.0      # fast path: cull triangles whose projected bbox
                              # is under this many pixels both ways (scene LOD).
                              # -1 = auto (2 px inside rollouts, off in direct
                              # renders); 0 = explicitly OFF everywhere
    rain: float = 0.0         # rain intensity in [0, 1]; 0 = dry
    sun: float = 1.0          # time-of-day exposure: 1 = noon, ~0.5 dusk,
                              # ~0.2 night. Scales the FINAL gray/rgb frame
                              # (sky included) so both backends stay exact;
                              # semantic labels are unaffected (CARLA's
                              # semantic camera ignores lighting)
    facade_bands: int = 0     # >0: window-floor stripes on building walls
                              # (+~(8·bands−6) tris per building)
    shadows: bool = False     # blob contact shadows under vehicles/walkers
    markings: bool = False    # lane markings + zebra crosswalks (SEM_ROADLINE)
    texture_detail: bool = False  # perspective-correct procedural textures
                                  # (window grids, asphalt/grass speckle —
                                  # ops/texture.py). Exact backends only; the
                                  # fast rollout kernel ignores it.
    vec: bool = False         # fast path: vectorized band passes — P prims
                              # per loop body as (P, rows·W) VPU broadcasts
                              # from band-resident coefficient tables instead
                              # of per-triangle SMEM scalar loads
                              # (raster_fast._vec_kernel; bit-exact vs the
                              # triangle kernel). Ignored when quads=True.
    quads: bool = False       # fast path: fuse coplanar triangle pairs into
                              # 4-edge quad primitives (raster_fast.fuse_prims
                              # — ~0.56× the band passes on paper, but MEASURED
                              # on-chip it is a wash on standard scenes (1.008×)
                              # and a 0.83× regression on rich ones (the wider
                              # prim rows cost more VPU work per pass than the
                              # saved passes; benchmarks/quad_ab.py →
                              # reports/quad_ab.json). Kept as an opt-in A/B.

    @classmethod
    def from_cfg(cls, cfg, backend: str | None = None) -> "RenderConfig":
        r = cfg.render
        return cls(height=int(r.height), width=int(r.width),
                   fov_deg=float(r.fov_deg), max_triangles=int(r.max_triangles),
                   near=float(r.near), far=float(r.far),
                   backend=backend or str(r.get("backend", "jax")),
                   rgb=bool(r.get("rgb", True)), semantic=bool(r.get("semantic", True)),
                   fast=bool(r.get("fast", False)),
                   active_cap=(int(r["active_cap"]) if r.get("active_cap")
                               else None),
                   fog_density=float(r.get("fog_density", 0.0)),
                   lod_px=float(r.get("lod_px", -1.0)),
                   rain=float(r.get("rain", 0.0)),
                   sun=float(r.get("sun", 1.0)),
                   facade_bands=int(r.get("facade_bands", 0)),
                   shadows=bool(r.get("shadows", False)),
                   markings=bool(r.get("markings", False)),
                   texture_detail=bool(r.get("texture_detail", False)),
                   quads=bool(r.get("quads", False)),
                   vec=bool(r.get("vec", False)))


def make_renderer(params: SimParams, town: TownMap, rcfg: RenderConfig,
                  camera: str = "camera"):
    """→ render(state) -> {'rgb','semantic','gray','depth'} for ONE env.

    ``camera`` selects a rig preset (render.camera.CAMERA_PRESETS): the
    reference's forward/semantic/narrow-FOV/side/rear views."""
    from carla_imitation_learning_tpu.render.camera import CAMERA_PRESETS

    yaw_off, fov_override = CAMERA_PRESETS.get(camera, (0.0, None))
    fov = fov_override or rcfg.fov_deg
    static = geo.build_static_scene(town, facade_bands=rcfg.facade_bands,
                                    markings=rcfg.markings)

    fast_raster = None
    if rcfg.backend == "pallas":
        if rcfg.fast and not rcfg.rgb:
            from carla_imitation_learning_tpu.ops.raster_fast import (
                rasterize_luma_fast as fast_raster,
            )
            raster = luma_raster = None
        elif rcfg.rgb:
            from carla_imitation_learning_tpu.ops.raster import rasterize_pallas as raster
            luma_raster = None
        else:
            from carla_imitation_learning_tpu.ops.raster import (
                rasterize_pallas_luma as luma_raster,
            )
            raster = None
    else:
        raster = luma_raster = None

    from carla_imitation_learning_tpu.render.jax_raster import (
        sky_image,
    )
    from carla_imitation_learning_tpu.render.weather import apply_fog, apply_rain

    def _sky_luma(height: int, width: int):
        return sky_image(height, width) @ LUMA  # one source for the gradient

    def _rain(img, state):
        if rcfg.rain <= 0.0:
            return img
        return apply_rain(img, state.rng, state.t, rcfg.rain)

    def _sun(img):
        # applied LAST (after fog/rain) — a pure exposure scale, so rain
        # streaks dim with the scene and the XLA/Pallas outputs stay equal
        if rcfg.sun >= 1.0:
            return img
        return img * rcfg.sun

    def render(state: WorldState):
        phases = agent_lib.light_phases(
            town, state.t.astype(jnp.float32) * params.dt,
            params.light_green, params.light_yellow, params.light_red)
        agents_pos, agents_yaw = agent_lib.agent_positions(
            town, state.agents_route, state.agents_s)
        peds_pos = None
        if state.peds_s.shape[0] > 0:
            from carla_imitation_learning_tpu.sim.pedestrians import ped_positions

            peds_pos = ped_positions(town, state.peds_crossing, state.peds_s)
        tris, colors, classes = geo.assemble_scene(
            static, town.lights_pos, phases, agents_pos, agents_yaw,
            rcfg.max_triangles, peds_pos=peds_pos, shadows=rcfg.shadows)
        cam = camera_from_ego(state.ego_pos, state.ego_yaw,
                              yaw_offset_deg=yaw_off)
        # Buildings, vehicles and walkers are closed boxes with outward-wound
        # faces → backface-cullable (cuts ~half their triangle passes in the
        # rasterizer). Ground/roads/poles/light heads stay double-sided.
        cullable = ((classes == geo.SEM_BUILDING) | (classes == geo.SEM_VEHICLE)
                    | (classes == geo.SEM_PEDESTRIAN))
        setup = project_triangles(tris, colors, classes, cam,
                                  rcfg.width, rcfg.height, fov, rcfg.near,
                                  cullable=cullable,
                                  textures=(rcfg.texture_detail
                                            and fast_raster is None))
        if fast_raster is not None:  # rollout kernel: gray plane ONLY
            gray = fast_raster(setup, rcfg.height, rcfg.width,
                               near=rcfg.near, far=rcfg.far,
                               compact_cap=rcfg.active_cap,
                               fog_density=rcfg.fog_density,  # fused in-kernel
                               lod_px=max(rcfg.lod_px, 0.0),
                               quads=None if rcfg.quads else False,
                               vec=rcfg.vec)
            return {"gray": _sun(_rain(gray, state))}
        if luma_raster is not None:  # grayscale fast path (policy rollouts)
            gray, sem, depth = luma_raster(setup, rcfg.height, rcfg.width,
                                           near=rcfg.near, far=rcfg.far)
            gray = apply_fog(gray, depth, _sky_luma(*gray.shape),
                             rcfg.fog_density)
            # semantic labels stay fog-free (CARLA's semantic camera behavior)
            return {"semantic": sem, "gray": _sun(_rain(gray, state)),
                    "depth": depth, "semantic_rgb": semantic_to_rgb(sem)}
        if raster is not None:
            rgb, sem, depth = raster(setup, rcfg.height, rcfg.width,
                                     near=rcfg.near, far=rcfg.far)
        else:
            rgb, sem, depth = rasterize_jax(setup, rcfg.height, rcfg.width,
                                            near=rcfg.near, far=rcfg.far)
        rgb = _sun(_rain(apply_fog(rgb, depth, sky_image(*depth.shape),
                                   rcfg.fog_density), state))
        gray = rgb @ LUMA  # (H,W) in [0,1] — the policy's observation channel
        return {"rgb": rgb, "semantic": sem, "gray": gray, "depth": depth,
                "semantic_rgb": semantic_to_rgb(sem)}

    return render
