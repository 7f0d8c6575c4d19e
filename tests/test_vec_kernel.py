"""Vectorized band-pass kernel (raster_fast._vec_kernel) correctness.

Contract: BIT-exact vs the scalar triangle kernel on the same setup — same
f32 operands combined in the same order per pixel, same approx reciprocal,
same packed-key min (see the kernel docstring). Stronger than the quad
path's quantization-tolerance contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.ops.raster_fast import rasterize_luma_fast
from carla_imitation_learning_tpu.render import geometry as geo
from carla_imitation_learning_tpu.render.camera import (
    camera_from_ego, project_triangles,
)
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.sim import agents as agent_lib
from carla_imitation_learning_tpu.sim.world import reset_env

H = W = 64
TOWN = make_town(blocks=2, n_buildings=6, n_lights=2)
PARAMS = SimParams(n_agents=3)
STATIC = geo.build_static_scene(TOWN)


def make_setup(seed: int):
    st = reset_env(PARAMS, TOWN, jax.random.PRNGKey(seed))
    phases = agent_lib.light_phases(
        TOWN, st.t.astype(jnp.float32) * PARAMS.dt,
        PARAMS.light_green, PARAMS.light_yellow, PARAMS.light_red)
    ap, ay = agent_lib.agent_positions(TOWN, st.agents_route, st.agents_s)
    tris, colors, classes = geo.assemble_scene(
        STATIC, TOWN.lights_pos, phases, ap, ay, 256)
    cam = camera_from_ego(st.ego_pos, st.ego_yaw)
    return project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vec_kernel_bitexact(seed):
    setup = make_setup(seed)
    g_tri = rasterize_luma_fast(setup, H, W, interpret=True, quads=False)
    g_vec = rasterize_luma_fast(setup, H, W, interpret=True, quads=False,
                                vec=True)
    assert np.array_equal(np.asarray(g_tri), np.asarray(g_vec))


def test_vec_path_with_cap_fog_lod_bandfactor():
    """vec must compose with compaction, fused fog, LOD, and coarse shared
    band lists. Bit-exact everywhere EXCEPT the fog blend: XLA fuses the
    ``lit·f + sky·(1−f)`` chain into fma differently for the (rows, W) vs
    (1, rows·W) shapes, so fogged pixels may differ by 1 ULP (the packed-key
    winner per pixel is still exact — only the final blend rounds)."""
    setup = make_setup(1)
    for kw in (dict(compact_cap=128), dict(fog_density=0.02),
               dict(lod_px=1.0), dict(max_tris_per_tile=64),
               dict(compact_cap=96, fog_density=0.01,
                    lod_px=1.0, list_band_factor=2)):
        g_tri = rasterize_luma_fast(setup, H, W, interpret=True, quads=False,
                                    **kw)
        g_vec = rasterize_luma_fast(setup, H, W, interpret=True, quads=False,
                                    vec=True, **kw)
        a, b = np.asarray(g_tri), np.asarray(g_vec)
        if kw.get("fog_density"):
            assert np.abs(a - b).max() <= 1.2e-7, kw  # 1 ULP at this scale
        else:
            assert np.array_equal(a, b), kw


def test_vec_empty_scene_is_sky():
    """A setup with zero valid triangles must produce the pure sky gradient
    (the group loop runs zero iterations)."""
    setup = make_setup(0)
    empty = setup.replace(valid=jnp.zeros_like(setup.valid))
    g = rasterize_luma_fast(empty, H, W, interpret=True, vec=True)
    g_ref = rasterize_luma_fast(empty, H, W, interpret=True)
    assert np.array_equal(np.asarray(g), np.asarray(g_ref))
    # sky gradient: rows are constant, top differs from horizon
    a = np.asarray(g)
    assert np.allclose(a, a[:, :1])
    assert abs(a[0, 0] - a[-1, 0]) > 1e-3
