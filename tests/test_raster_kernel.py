"""Pallas rasterizer (interpret mode) vs the pure-JAX reference — pixel-exact
agreement on random scenes and on a real sim scene."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.ops.raster import rasterize_pallas
from carla_imitation_learning_tpu.render.camera import Camera, project_triangles
from carla_imitation_learning_tpu.render.jax_raster import rasterize_jax

H = W = 64


def _cam():
    return Camera(
        pos=jnp.array([0.0, 0.0, 1.0]),
        forward=jnp.array([1.0, 0.0, 0.0]),
        right=jnp.array([0.0, -1.0, 0.0]),
        down=jnp.array([0.0, 0.0, -1.0]),
    )


def _random_setup(n=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform([2, -15, -3], [60, 15, 8], size=(n, 3))
    offsets = rng.uniform(-4, 4, size=(n, 3, 3))
    tris = jnp.asarray((centers[:, None, :] + offsets).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    classes = jnp.asarray(rng.integers(1, 6, n).astype(np.int32))
    return project_triangles(tris, colors, classes, _cam(), W, H, 90.0, 0.5)


def test_pallas_matches_jax_random_scene():
    setup = _random_setup(n=64, seed=1)
    rgb_j, sem_j, depth_j = rasterize_jax(setup, H, W, chunk=64)
    rgb_p, sem_p, depth_p = rasterize_pallas(setup, H, W, interpret=True)
    np.testing.assert_array_equal(np.asarray(sem_j), np.asarray(sem_p))
    np.testing.assert_allclose(np.asarray(depth_j), np.asarray(depth_p), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_j), np.asarray(rgb_p), rtol=1e-4, atol=1e-5)


def test_pallas_matches_jax_sim_scene():
    from carla_imitation_learning_tpu.render import RenderConfig, make_renderer
    from carla_imitation_learning_tpu.sim import SimParams, make_town, reset_env

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=4)
    state = reset_env(params, town, jax.random.PRNGKey(5))
    out_j = make_renderer(params, town, RenderConfig(64, 64, max_triangles=256,
                                                     backend="jax"))(state)

    import carla_imitation_learning_tpu.ops.raster as rk
    import functools
    # patch interpret=True for CPU execution of the pallas backend
    orig = rk.rasterize_pallas
    patched = functools.partial(orig, interpret=True)
    try:
        rk.rasterize_pallas = patched
        out_p = make_renderer(params, town, RenderConfig(64, 64, max_triangles=256,
                                                         backend="pallas"))(state)
    finally:
        rk.rasterize_pallas = orig
    np.testing.assert_array_equal(np.asarray(out_j["semantic"]),
                                  np.asarray(out_p["semantic"]))
    np.testing.assert_allclose(np.asarray(out_j["rgb"]), np.asarray(out_p["rgb"]),
                               rtol=1e-4, atol=1e-5)


def test_pallas_vmap_batch():
    setups = [_random_setup(n=64, seed=s) for s in range(3)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *setups)
    rgb, sem, depth = jax.vmap(
        lambda s: rasterize_pallas(s, H, W, interpret=True))(batched)
    assert rgb.shape == (3, H, W, 3) and sem.shape == (3, H, W)
    for i in range(3):
        _, sem_i, _ = rasterize_jax(setups[i], H, W, chunk=64)
        np.testing.assert_array_equal(np.asarray(sem[i]), np.asarray(sem_i))
