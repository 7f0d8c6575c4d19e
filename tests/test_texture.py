"""Procedural surface textures (ops/texture.py): perspective-correct UV
interpolation + backend parity.

The reference system's visual richness comes from CARLA's texture-mapped
meshes; this is the TPU-native equivalent (pure VPU pattern functions of the
interpolated world-space surface point — no per-pixel memory fetches)."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.ops.raster import rasterize_pallas
from carla_imitation_learning_tpu.render.camera import Camera, project_triangles
from carla_imitation_learning_tpu.render.geometry import SEM_BUILDING, SEM_ROAD
from carla_imitation_learning_tpu.render.jax_raster import rasterize_jax

H = W = 64


def _cam():
    return Camera(
        pos=jnp.array([0.0, 0.0, 1.0]),
        forward=jnp.array([1.0, 0.0, 0.0]),
        right=jnp.array([0.0, -1.0, 0.0]),
        down=jnp.array([0.0, 0.0, -1.0]),
    )


def _random_setup(n=64, seed=0, textures=True):
    rng = np.random.default_rng(seed)
    centers = rng.uniform([2, -15, -3], [60, 15, 8], size=(n, 3))
    offsets = rng.uniform(-4, 4, size=(n, 3, 3))
    tris = jnp.asarray((centers[:, None, :] + offsets).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    classes = jnp.asarray(rng.integers(1, 6, n).astype(np.int32))
    return project_triangles(tris, colors, classes, _cam(), W, H, 90.0, 0.5,
                             textures=textures)


def test_textured_pallas_matches_jax():
    """The single-source texture_factor guarantee, end to end: both backends
    textured → pixel-exact semantic plane, matching RGB."""
    setup = _random_setup(n=64, seed=1, textures=True)
    assert setup.unum is not None
    rgb_j, sem_j, depth_j = rasterize_jax(setup, H, W, chunk=64)
    rgb_p, sem_p, depth_p = rasterize_pallas(setup, H, W, interpret=True)
    np.testing.assert_array_equal(np.asarray(sem_j), np.asarray(sem_p))
    np.testing.assert_allclose(np.asarray(depth_j), np.asarray(depth_p),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_j), np.asarray(rgb_p),
                               rtol=1e-4, atol=1e-5)


def test_texture_modulates_surfaces_only():
    """Textures change building/road pixels, never the semantic plane, the
    depth plane, or other-class pixels."""
    flat = _random_setup(n=64, seed=2, textures=False)
    tex = _random_setup(n=64, seed=2, textures=True)
    rgb_f, sem_f, depth_f = rasterize_jax(flat, H, W, chunk=64)
    rgb_t, sem_t, depth_t = rasterize_jax(tex, H, W, chunk=64)
    np.testing.assert_array_equal(np.asarray(sem_f), np.asarray(sem_t))
    np.testing.assert_array_equal(np.asarray(depth_f), np.asarray(depth_t))
    sem = np.asarray(sem_f)
    rgb_f, rgb_t = np.asarray(rgb_f), np.asarray(rgb_t)
    textured_mask = (sem == SEM_BUILDING) | (sem == SEM_ROAD) | (sem == 1)
    other = ~textured_mask
    if other.any():
        np.testing.assert_array_equal(rgb_f[other], rgb_t[other])
    changed = np.abs(rgb_f - rgb_t).max(axis=-1) > 1e-6
    assert changed[textured_mask].mean() > 0.5  # patterns actually show


def test_window_grid_structure():
    """A single head-on facade renders a periodic window grid: the textured
    image has distinct dark (window) and light (wall) pixel populations."""
    wall = jnp.asarray([
        [[10.0, -8.0, 0.0], [10.0, 8.0, 0.0], [10.0, 8.0, 10.0]],
        [[10.0, -8.0, 0.0], [10.0, 8.0, 10.0], [10.0, -8.0, 10.0]],
    ], jnp.float32)
    colors = jnp.full((2, 3), 0.6)
    classes = jnp.full((2,), SEM_BUILDING, jnp.int32)
    setup = project_triangles(wall, colors, classes, _cam(), W, H, 90.0, 0.5,
                              textures=True)
    rgb, sem, _ = rasterize_jax(setup, H, W, chunk=2)
    hit = np.asarray(sem) == SEM_BUILDING
    vals = np.asarray(rgb)[..., 0][hit]
    assert hit.mean() > 0.3  # the wall fills a good part of the frame
    lo, hi = vals.min(), vals.max()
    assert hi / max(lo, 1e-6) > 1.5  # window vs wall contrast
    # both populations are well represented (a grid, not a blanket tint)
    dark = (vals < (lo + hi) / 2).mean()
    assert 0.1 < dark < 0.9


def test_pipeline_texture_gating():
    """texture_detail renders through the pipeline; the fast rollout kernel
    ignores it (projects untextured)."""
    from carla_imitation_learning_tpu.render import RenderConfig, make_renderer
    from carla_imitation_learning_tpu.sim import SimParams, make_town, reset_env

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=4)
    state = reset_env(params, town, jax.random.PRNGKey(5))
    out_flat = make_renderer(params, town, RenderConfig(
        64, 64, max_triangles=256, backend="jax"))(state)
    out_tex = make_renderer(params, town, RenderConfig(
        64, 64, max_triangles=256, backend="jax", texture_detail=True))(state)
    assert np.asarray(out_flat["semantic"] == out_tex["semantic"]).all()
    assert np.abs(np.asarray(out_flat["rgb"] - out_tex["rgb"])).max() > 0.01
    assert np.isfinite(np.asarray(out_tex["rgb"])).all()
