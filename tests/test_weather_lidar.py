"""Weather (fog/rain) and LIDAR ray-caster tests.

Covers the CARLA-side capabilities (WeatherParameters, the ray-cast LIDAR
sensor) the reference system outsourced to the simulator server."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.render.lidar import (
    building_segments, cast_rays, lidar_image, make_lidar, vehicle_segments,
)
from carla_imitation_learning_tpu.render.weather import (
    apply_fog, apply_rain, visibility_far,
)


# ---------------------------------------------------------------- weather

def test_fog_zero_density_is_identity():
    img = jnp.linspace(0, 1, 16).reshape(4, 4)
    depth = jnp.full((4, 4), 50.0)
    out = apply_fog(img, depth, 0.5, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_fog_far_pixels_fade_to_sky():
    img = jnp.zeros((4, 4))
    sky = jnp.full((4, 4), 0.8)
    near_d = jnp.full((4, 4), 1.0)
    far_d = jnp.full((4, 4), 500.0)
    near_out = np.asarray(apply_fog(img, near_d, sky, 0.05))
    far_out = np.asarray(apply_fog(img, far_d, sky, 0.05))
    assert near_out.max() < 0.05          # close geometry barely fogged
    np.testing.assert_allclose(far_out, 0.8, atol=1e-6)  # fully sky


def test_fog_rgb_broadcast():
    rgb = jnp.zeros((4, 4, 3))
    depth = jnp.full((4, 4), 30.0)
    sky = jnp.asarray([0.3, 0.5, 0.9])
    out = np.asarray(apply_fog(rgb, depth, sky, 0.1))
    # e^-3 ≈ 0.0498 transmittance → out ≈ 0.95 · sky
    np.testing.assert_allclose(out[0, 0], 0.9502 * np.array([0.3, 0.5, 0.9]),
                               atol=1e-3)


def test_visibility_far_shrinks_with_fog():
    assert visibility_far(0.0, 300.0) == 300.0
    assert visibility_far(0.046, 300.0) == pytest.approx(100.0)
    assert visibility_far(0.001, 300.0) == 300.0  # clearer than far plane


def test_rain_deterministic_and_animated():
    img = jnp.full((32, 32), 0.5)
    key = jnp.asarray([7, 9], jnp.uint32)
    a = np.asarray(apply_rain(img, key, jnp.int32(3), 0.8))
    b = np.asarray(apply_rain(img, key, jnp.int32(3), 0.8))
    c = np.asarray(apply_rain(img, key, jnp.int32(4), 0.8))
    np.testing.assert_array_equal(a, b)       # stateless: same (key, t) → same
    assert np.abs(a - c).max() > 0            # pattern advances with t
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert (a != 0.5).any()                   # something actually drawn
    np.testing.assert_array_equal(
        np.asarray(apply_rain(img, key, jnp.int32(3), 0.0)), np.asarray(img))


def test_fast_kernel_fog_matches_postpass(sim_scene_setup):
    """Fused in-kernel fog (interpret mode) == exact-luma render + post-pass
    fog, up to the fast kernel's documented quantization tolerance."""
    from carla_imitation_learning_tpu.ops.raster import rasterize_pallas_luma
    from carla_imitation_learning_tpu.ops.raster_fast import rasterize_luma_fast

    setup, H, W = sim_scene_setup
    beta = 0.03
    gray_f = rasterize_luma_fast(setup, H, W, interpret=True, fog_density=beta)
    gray_e, _, depth = rasterize_pallas_luma(setup, H, W, interpret=True)
    t = jnp.linspace(0.0, 1.0, H)[:, None]
    luma_w = jnp.asarray([0.299, 0.587, 0.114])
    from carla_imitation_learning_tpu.render.jax_raster import SKY_HORIZON, SKY_TOP
    sky = jnp.broadcast_to((SKY_TOP @ luma_w) * (1 - t) + (SKY_HORIZON @ luma_w) * t,
                           (H, W))
    ref = apply_fog(gray_e, depth, sky, beta)
    # visibility-far culling turns <1%-transmittance geometry into sky; allow
    # that + 12-bit luma quantization
    frac_off = float((jnp.abs(gray_f - ref) > 0.02).mean())
    assert frac_off < 0.02, f"fogged fast kernel off on {frac_off:.2%} of pixels"


@pytest.fixture(scope="module")
def sim_scene_setup():
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.render.camera import (
        camera_from_ego, project_triangles,
    )
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim import agents as agent_lib
    from carla_imitation_learning_tpu.sim.world import reset_env

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=6)
    static = geo.build_static_scene(town)
    H = W = 64
    st = reset_env(params, town, jax.random.PRNGKey(1))
    phases = agent_lib.light_phases(
        town, st.t.astype(jnp.float32) * params.dt,
        params.light_green, params.light_yellow, params.light_red)
    ap, ay = agent_lib.agent_positions(town, st.agents_route, st.agents_s)
    tris, colors, classes = geo.assemble_scene(
        static, town.lights_pos, phases, ap, ay, 512)
    cam = camera_from_ego(st.ego_pos, st.ego_yaw)
    return project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5), H, W


def test_foggy_render_pipeline_runs():
    from carla_imitation_learning_tpu.render.pipeline import (
        RenderConfig, make_renderer,
    )
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim.world import reset_env

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=6)
    rcfg = RenderConfig(height=64, width=64, backend="jax",
                        fog_density=0.05, rain=0.7)
    render = make_renderer(params, town, rcfg)
    out = render(reset_env(params, town, jax.random.PRNGKey(0)))
    assert out["gray"].shape == (64, 64)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # heavy fog: distant pixels approach sky, image differs from clear render
    clear = make_renderer(params, town, RenderConfig(
        height=64, width=64, backend="jax"))(
            reset_env(params, town, jax.random.PRNGKey(0)))
    assert np.abs(np.asarray(out["gray"]) - np.asarray(clear["gray"])).max() > 0.01


# ---------------------------------------------------------------- lidar

def test_cast_rays_known_wall():
    # wall x=10 spanning y ∈ [-5, 5]; beam +x from origin hits at 10 m
    segs = jnp.asarray([[[10.0, -5.0], [10.0, 5.0]]])
    r = cast_rays(jnp.zeros(2), jnp.asarray([0.0, jnp.pi / 2, jnp.pi]),
                  segs, 60.0)
    np.testing.assert_allclose(np.asarray(r), [10.0, 60.0, 60.0], atol=1e-5)


def test_cast_rays_diagonal_distance():
    segs = jnp.asarray([[[5.0, -9.0], [5.0, 9.0]]])
    ang = jnp.asarray([jnp.pi / 4])  # 45°: hits x=5 at distance 5·√2
    r = cast_rays(jnp.zeros(2), ang, segs, 60.0)
    np.testing.assert_allclose(np.asarray(r), [5.0 * np.sqrt(2.0)], atol=1e-4)


def test_cast_rays_nearest_of_two():
    segs = jnp.asarray([[[20.0, -5.0], [20.0, 5.0]],
                        [[7.0, -5.0], [7.0, 5.0]]])
    r = cast_rays(jnp.zeros(2), jnp.asarray([0.0]), segs, 60.0)
    np.testing.assert_allclose(np.asarray(r), [7.0], atol=1e-5)


def test_building_and_vehicle_segments_shapes():
    b = jnp.asarray([[0.0, 0.0, 2.0, 3.0, 10.0], [5.0, 5.0, 1.0, 1.0, 8.0]])
    assert building_segments(b).shape == (8, 2, 2)
    v = vehicle_segments(jnp.zeros((3, 2)), jnp.zeros(3))
    assert v.shape == (12, 2, 2)
    # unrotated vehicle: x extent ±2.25, y extent ±1.0
    corners = np.asarray(v).reshape(-1, 2)
    assert corners[:, 0].max() == pytest.approx(2.25)
    assert corners[:, 1].max() == pytest.approx(1.0)


def test_make_lidar_in_world():
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.sim.agents import agent_positions
    from carla_imitation_learning_tpu.sim.world import reset_env

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=6)
    scan = make_lidar(town, n_beams=90, max_range=60.0)
    st = reset_env(params, town, jax.random.PRNGKey(3))
    ap, ay = agent_positions(town, st.agents_route, st.agents_s)
    r = np.asarray(jax.jit(scan)(st, ap, ay))
    assert r.shape == (90,)
    assert (r > 0).all() and (r <= 60.0).all()
    assert (r < 60.0).any()  # something in view of a town-center spawn

    img = np.asarray(lidar_image(jnp.asarray(r), max_range=60.0))
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_rollout_with_lidar_channel():
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    town = make_town(blocks=2, n_buildings=8, n_lights=4)
    params = SimParams(n_agents=6)
    rcfg = RenderConfig(height=32, width=32, backend="jax")
    init_fn, rollout_fn = make_rollout(params, town, rcfg, None,
                                       lidar_beams=36)
    carry = init_fn(jax.random.PRNGKey(0), 4)
    _, traj = rollout_fn(carry, 3)
    assert traj["lidar"].shape == (3, 4, 36)
    assert np.isfinite(np.asarray(traj["lidar"])).all()
