"""Renderer tests: projection math golden cases, known-scene rasterization,
full pipeline on a sim state."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.render import (
    SEM_BUILDING, SEM_ROAD, SEM_SKY, SEM_TERRAIN, SEM_VEHICLE,
    RenderConfig, build_static_scene, make_renderer,
)
from carla_imitation_learning_tpu.render.camera import (
    Camera, camera_from_ego, project_triangles,
)
from carla_imitation_learning_tpu.render.jax_raster import rasterize_jax
from carla_imitation_learning_tpu.sim import SimParams, make_town, reset_env

H = W = 64


def _cam_at_origin():
    """Camera at origin looking along +x, image y down."""
    return Camera(
        pos=jnp.array([0.0, 0.0, 0.0]),
        forward=jnp.array([1.0, 0.0, 0.0]),
        right=jnp.array([0.0, -1.0, 0.0]),
        down=jnp.array([0.0, 0.0, -1.0]),
    )


def _setup_for(tris, classes=None):
    tris = jnp.asarray(tris, jnp.float32)
    n = tris.shape[0]
    colors = jnp.ones((n, 3)) * jnp.arange(1, n + 1)[:, None] / n
    classes = jnp.asarray(classes if classes is not None else np.full(n, 2), jnp.int32)
    return project_triangles(tris, colors, classes, _cam_at_origin(), W, H,
                             fov_deg=90.0, near=0.1)


def test_centered_triangle_covers_center():
    """A big triangle straight ahead must cover the image center with its
    class and a depth equal to its distance."""
    d = 10.0
    tri = [[[d, -8.0, -8.0], [d, 8.0, -8.0], [d, 0.0, 8.0]]]
    rgb, sem, depth = rasterize_jax(_setup_for(tri, [3]), H, W, chunk=1)
    assert int(sem[H // 2, W // 2]) == 3
    np.testing.assert_allclose(float(depth[H // 2, W // 2]), d, rtol=1e-3)
    # corners remain sky
    assert int(sem[0, 0]) == SEM_SKY


def test_zbuffer_orders_by_depth():
    near_tri = [[5.0, -4.0, -4.0], [5.0, 4.0, -4.0], [5.0, 0.0, 4.0]]
    far_tri = [[20.0, -16.0, -16.0], [20.0, 16.0, -16.0], [20.0, 0.0, 16.0]]
    # far triangle listed FIRST: z-buffer must still pick the near one
    rgb, sem, depth = rasterize_jax(_setup_for([far_tri, near_tri], [4, 3]), H, W, chunk=2)
    assert int(sem[H // 2, W // 2]) == 3
    np.testing.assert_allclose(float(depth[H // 2, W // 2]), 5.0, rtol=1e-3)


def test_behind_camera_triangle_invisible():
    tri = [[[-5.0, -4.0, -4.0], [-5.0, 4.0, -4.0], [-5.0, 0.0, 4.0]]]
    rgb, sem, depth = rasterize_jax(_setup_for(tri, [3]), H, W, chunk=1)
    assert int((sem == 3).sum()) == 0


def test_eye_plane_crossing_triangle_renders_front_part():
    """Triangle spanning from behind the camera to in front (the case naive
    clipping-free rasterizers get wrong): front part must render, and no
    pixels may show garbage depth beyond it."""
    tri = [[[-5.0, 0.0, 1.0], [30.0, -12.0, 1.0], [30.0, 12.0, 1.0]]]
    rgb, sem, depth = rasterize_jax(_setup_for(tri, [2]), H, W, chunk=1)
    hit = np.asarray(sem == 2)
    assert hit.sum() > 10  # front part visible
    d = np.asarray(depth)[hit]
    assert d.min() > 0.1  # nothing behind the near plane


def test_offscreen_triangle_invisible():
    tri = [[[10.0, 100.0, 0.0], [10.0, 102.0, 0.0], [10.0, 101.0, 2.0]]]
    _, sem, _ = rasterize_jax(_setup_for(tri, [3]), H, W, chunk=1)
    assert int((sem == 3).sum()) == 0


def test_static_scene_budget_and_classes():
    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    static = build_static_scene(town)
    n = static.tris.shape[0]
    # ground 2 + roads 8*2 + buildings 24*10 + poles 8*2 = 274
    assert n == 2 + 16 + 240 + 16
    assert set(np.unique(np.asarray(static.classes))) <= {SEM_TERRAIN, SEM_ROAD,
                                                          SEM_BUILDING, 5}


def test_full_pipeline_renders_road_scene():
    """Render from a real sim state: the view ahead must contain road and
    terrain/sky — a sanity check that geometry, camera and raster agree."""
    town = make_town(blocks=2, n_buildings=10, n_lights=4)
    params = SimParams(n_agents=4)
    state = reset_env(params, town, jax.random.PRNGKey(3))
    rcfg = RenderConfig(height=64, width=64, max_triangles=256, backend="jax")
    render = make_renderer(params, town, rcfg)
    out = jax.jit(render)(state)
    sem = np.asarray(out["semantic"])
    assert out["rgb"].shape == (64, 64, 3)
    assert out["gray"].shape == (64, 64)
    # ego sits on a road looking along it: road pixels must appear low-center
    lower = sem[40:, 16:48]
    assert (lower == SEM_ROAD).mean() > 0.2, f"road not visible: {np.unique(lower)}"
    assert (sem == SEM_SKY).mean() > 0.05  # some sky above the horizon
    assert np.isfinite(np.asarray(out["rgb"])).all()
    g = np.asarray(out["gray"])
    assert 0.0 <= g.min() and g.max() <= 1.0


def test_vmapped_batch_render():
    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=4)
    states = jax.vmap(lambda k: reset_env(params, town, k))(
        jax.random.split(jax.random.PRNGKey(0), 4))
    rcfg = RenderConfig(height=32, width=32, max_triangles=256)
    render = make_renderer(params, town, rcfg)
    outs = jax.jit(jax.vmap(render))(states)
    assert outs["gray"].shape == (4, 32, 32)
    assert np.isfinite(np.asarray(outs["gray"])).all()


def test_backface_culling_is_image_invariant():
    """Backface-culling closed boxes (buildings/vehicles) must not change a
    single pixel — every culled face is occluded by a front face of the same
    box — while cutting the number of live triangles substantially."""
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.sim import agents as agent_lib

    town = make_town(blocks=3, n_buildings=24, n_lights=8)
    params = SimParams(n_agents=8)
    static = geo.build_static_scene(town)
    for seed in range(4):
        state = reset_env(params, town, jax.random.PRNGKey(seed))
        phases = agent_lib.light_phases(
            town, state.t.astype(jnp.float32) * params.dt,
            params.light_green, params.light_yellow, params.light_red)
        ap, ay = agent_lib.agent_positions(town, state.agents_route, state.agents_s)
        tris, colors, classes = geo.assemble_scene(
            static, town.lights_pos, phases, ap, ay, 512)
        cam = camera_from_ego(state.ego_pos, state.ego_yaw)
        cullable = (classes == SEM_BUILDING) | (classes == SEM_VEHICLE)
        full = project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5)
        culled = project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5,
                                   cullable=cullable)
        n_full = int(full.valid.sum())
        n_culled = int(culled.valid.sum())
        assert n_culled < n_full * 0.75, (n_full, n_culled)
        rgb_a, sem_a, dep_a = rasterize_jax(full, H, W)
        rgb_b, sem_b, dep_b = rasterize_jax(culled, H, W)
        np.testing.assert_array_equal(np.asarray(sem_a), np.asarray(sem_b))
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b))


def test_banded_facades_render_stripes():
    """facade_bands adds triangles and produces vertical brightness variation
    on building walls (window floors)."""
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.render.pipeline import (
        RenderConfig, make_renderer,
    )
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim.world import reset_env

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    plain = geo.build_static_scene(town)
    banded = geo.build_static_scene(town, facade_bands=3)
    assert banded.tris.shape[0] > plain.tris.shape[0]
    # walls of one building now carry >1 distinct color
    b_colors = np.asarray(banded.colors[np.asarray(banded.classes) == geo.SEM_BUILDING])
    p_colors = np.asarray(plain.colors[np.asarray(plain.classes) == geo.SEM_BUILDING])
    assert len(np.unique(b_colors.round(4), axis=0)) > len(np.unique(p_colors.round(4), axis=0))

    params = SimParams(n_agents=2)
    rcfg = RenderConfig(height=64, width=64, backend="jax",
                        max_triangles=1024, facade_bands=3)
    out = make_renderer(params, town, rcfg)(
        reset_env(params, town, jax.random.PRNGKey(0)))
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_blob_shadows_darken_under_vehicles():
    from carla_imitation_learning_tpu.render import geometry as geo

    agents_pos = jnp.asarray([[10.0, 0.0]])
    agents_yaw = jnp.zeros(1)
    static = geo.StaticScene(
        tris=jnp.zeros((0, 3, 3)), colors=jnp.zeros((0, 3)),
        classes=jnp.zeros((0,), jnp.int32))
    lights = jnp.zeros((0, 2))
    phases = jnp.zeros((0,), jnp.int32)
    t_no, c_no, k_no = geo.assemble_scene(static, lights, phases, agents_pos,
                                          agents_yaw, 64, shadows=False)
    t_sh, c_sh, k_sh = geo.assemble_scene(static, lights, phases, agents_pos,
                                          agents_yaw, 64, shadows=True)
    # four extra dark quads classified as road: the core blob + the wider,
    # lighter penumbra ring beneath it (two-tier soft shadow)
    extra = int((np.asarray(t_sh) != 0).any(axis=(1, 2)).sum()
                - (np.asarray(t_no) != 0).any(axis=(1, 2)).sum())
    assert extra == 4
    zs = np.asarray(t_sh)[:, :, 2]
    core = (np.asarray(k_sh) == geo.SEM_ROAD) & np.isclose(zs, geo.SHADOW_Z).all(axis=1)
    pen = (np.asarray(k_sh) == geo.SEM_ROAD) & np.isclose(zs, geo.PENUMBRA_Z).all(axis=1)
    assert core.sum() == 2 and pen.sum() == 2
    assert (np.asarray(c_sh)[core] < 0.3).all()
    # penumbra is lighter than the core and wider than it
    assert (np.asarray(c_sh)[pen] > np.asarray(c_sh)[core].max()).all()
    span = lambda m: np.abs(np.asarray(t_sh)[m][:, :, :2] - agents_pos[0]).max()  # noqa: E731
    assert span(pen) > span(core)
    # core sits ABOVE the penumbra so it wins the depth test where they overlap
    assert geo.SHADOW_Z > geo.PENUMBRA_Z


def test_road_markings_render():
    """markings=True paints SEM_ROADLINE quads: solid center line per road
    segment, zebra stripes per crossing, dashed dividers when lanes > 1 —
    visible in both the semantic plane and (brighter than the road) the gray
    plane."""
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.render.pipeline import (
        RenderConfig, make_renderer,
    )
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim.world import reset_env

    town = make_town(blocks=2, n_buildings=4, n_lights=4)
    plain = geo.build_static_scene(town)
    marked = geo.build_static_scene(town, markings=True)
    n_lines = int((np.asarray(marked.classes) == geo.SEM_ROADLINE).sum())
    assert n_lines > 0 and (np.asarray(plain.classes) != geo.SEM_ROADLINE).all()
    # every segment gets a 2-tri center line; every crossing >= 2 stripes
    n_segs = town.road_segments.shape[0]
    n_cross = town.crossings.shape[0]
    assert n_lines >= 2 * n_segs + 4 * n_cross
    # markings sit above the road plane, below shadows
    line_z = np.asarray(marked.tris)[np.asarray(marked.classes)
                                     == geo.SEM_ROADLINE][:, :, 2]
    np.testing.assert_allclose(line_z, geo.MARKING_Z)
    assert geo.MARKING_Z < geo.SHADOW_Z

    # multi-lane towns add dashed dividers on top of the center lines
    multi = make_town(blocks=2, n_buildings=4, n_lights=4,
                      lanes_per_direction=2)
    m2 = geo.build_static_scene(multi, markings=True)
    assert int((np.asarray(m2.classes) == geo.SEM_ROADLINE).sum()) > n_lines

    params = SimParams(n_agents=2)
    render = make_renderer(params, town, RenderConfig(
        height=64, width=64, backend="jax", max_triangles=512, markings=True))
    out = render(reset_env(params, town, jax.random.PRNGKey(0)))
    sem = np.asarray(out["semantic"])
    gray = np.asarray(out["gray"])
    assert (sem == geo.SEM_ROADLINE).any()  # ego starts ON a marked road
    # painted pixels are brighter than the road they cover
    road_l = gray[sem == geo.SEM_ROAD].mean()
    line_l = gray[sem == geo.SEM_ROADLINE].mean()
    assert line_l > road_l


def test_band_rows_divides_any_height():
    """TILE_ROWS=32 must not break heights that are multiples of 16 but not
    32 (48, 80, 112...): the band grid picks the largest divisor ≤ the cap."""
    from carla_imitation_learning_tpu.ops.raster import band_rows

    for h in (8, 16, 32, 48, 64, 80, 112, 128, 144, 176, 208, 240, 256):
        rows = band_rows(h)
        assert h % rows == 0, (h, rows)
        assert rows <= 32
    assert band_rows(48) == 24
    assert band_rows(128) == 32
    # interpreted Pallas render at a 48-row viewport must build (CPU)
    import functools

    import carla_imitation_learning_tpu.ops.raster as rk

    town = make_town(blocks=2, n_buildings=6, n_lights=4)
    params = SimParams(n_agents=2)
    orig = rk.rasterize_pallas
    try:
        rk.rasterize_pallas = functools.partial(orig, interpret=True)
        rcfg = RenderConfig(height=48, width=64, max_triangles=256,
                            backend="pallas")
        out = make_renderer(params, town, rcfg)(
            reset_env(params, town, jax.random.PRNGKey(0)))
    finally:
        rk.rasterize_pallas = orig
    assert out["gray"].shape == (48, 64)
    assert np.isfinite(np.asarray(out["gray"])).all()


def test_sun_factor_darkens_gray_not_semantic():
    """render.sun is a pure exposure scale: night frames are exactly
    sun x day frames; semantic labels ignore lighting (CARLA behavior)."""
    town = make_town(blocks=2, n_buildings=6, n_lights=4)
    params = SimParams(n_agents=2)
    state = reset_env(params, town, jax.random.PRNGKey(1))
    day = make_renderer(params, town, RenderConfig(
        height=32, width=32, max_triangles=256, backend="jax"))(state)
    night = make_renderer(params, town, RenderConfig(
        height=32, width=32, max_triangles=256, backend="jax", sun=0.2))(state)
    np.testing.assert_allclose(np.asarray(night["gray"]),
                               np.asarray(day["gray"]) * 0.2, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(night["semantic"]),
                                  np.asarray(day["semantic"]))
    assert night["gray"].mean() < day["gray"].mean()
