"""Simulator tests: dynamics golden values, town geometry, traffic behavior,
collision predicates, autopilot closed loop."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.sim import (
    SimParams, VehicleControl, autopilot_control, bicycle_step,
    make_batched_env, make_town, reset_env, sensor_vector, step_env,
)
from carla_imitation_learning_tpu.sim import collision as col
from carla_imitation_learning_tpu.sim.agents import light_phases, GREEN, YELLOW, RED
from carla_imitation_learning_tpu.sim.town import route_point


def _params(**kw):
    return SimParams(**kw)


def test_straight_line_motion():
    """No steering: straight-line kinematics, v ≈ a·t with drag."""
    pos, yaw, v, steer = jnp.zeros(2), jnp.zeros(()), jnp.zeros(()), jnp.zeros(())
    dt = 0.05
    for _ in range(100):
        pos, yaw, v, steer = bicycle_step(
            pos, yaw, v, steer, jnp.zeros(()), jnp.ones(()), jnp.zeros(()),
            dt=dt, max_accel=4.0, drag=0.0)
    np.testing.assert_allclose(float(v), 4.0 * 100 * dt, rtol=1e-5)
    np.testing.assert_allclose(float(pos[1]), 0.0, atol=1e-6)
    assert float(pos[0]) > 0  # moved forward along +x
    np.testing.assert_allclose(float(yaw), 0.0, atol=1e-6)


def test_turning_radius_golden():
    """At low constant speed the kinematic turning radius is L/tan(delta)."""
    L, delta, v_set = 2.9, 0.3, 2.0
    pos, yaw, v, steer = jnp.zeros(2), jnp.zeros(()), jnp.asarray(v_set), jnp.asarray(delta)
    dt = 0.01
    traj = []
    for _ in range(3000):
        pos, yaw, v, steer = bicycle_step(
            pos, yaw, v, steer, jnp.asarray(delta), jnp.zeros(()), jnp.zeros(()),
            dt=dt, wheelbase=L, drag=0.0, max_accel=0.0)
        v = jnp.asarray(v_set)  # hold speed constant
        traj.append(np.asarray(pos))
    traj = np.stack(traj)
    # circle fit: radius = half the max pairwise distance (diameter)
    center = traj.mean(axis=0)
    radii = np.linalg.norm(traj - center, axis=1)
    expected = L / np.tan(delta)
    # slip correction slightly enlarges the radius at v=2 (a_lat≈0.4g·0.05)
    np.testing.assert_allclose(radii.mean(), expected, rtol=0.05)
    assert radii.std() < 0.1 * expected  # it is a circle


def test_tire_slip_widens_radius_at_speed():
    """Same steering at higher speed must trace a LARGER radius (slip)."""

    def radius_at(v_set):
        pos, yaw, v, steer = jnp.zeros(2), jnp.zeros(()), jnp.asarray(v_set), jnp.asarray(0.3)
        pts = []
        for _ in range(2000):
            pos, yaw, v, steer = bicycle_step(
                pos, yaw, v, steer, jnp.asarray(0.3), jnp.zeros(()), jnp.zeros(()),
                dt=0.01, drag=0.0)
            v = jnp.asarray(v_set)
            pts.append(np.asarray(pos))
        pts = np.stack(pts)
        c = pts.mean(axis=0)
        return np.linalg.norm(pts - c, axis=1).mean()

    assert radius_at(15.0) > 1.5 * radius_at(2.0)


def test_town_geometry():
    town = make_town(blocks=3, block_size=80.0, n_buildings=24, n_lights=8)
    assert town.routes.shape == (10, 128, 2)  # 9 block loops + perimeter
    assert town.buildings.shape == (24, 5)
    assert town.lights_pos.shape == (8, 2)
    # block loop total ≈ perimeter of (80-2·1.75)² square
    np.testing.assert_allclose(float(town.route_total[0]), 4 * (80 - 3.5), rtol=1e-3)
    # route_point wraps and interpolates
    pos0, yaw0 = route_point(town, 0, jnp.asarray(0.0))
    pos_wrap, _ = route_point(town, 0, town.route_total[0])
    np.testing.assert_allclose(np.asarray(pos0), np.asarray(pos_wrap), atol=1e-3)


def test_light_phases_schedule():
    town = make_town(blocks=2, n_lights=4)
    town = town.replace(lights_offset=jnp.zeros(4))
    g, y, r = 8.0, 2.0, 6.0
    assert int(light_phases(town, jnp.asarray(0.0), g, y, r)[0]) == GREEN
    assert int(light_phases(town, jnp.asarray(8.5), g, y, r)[0]) == YELLOW
    assert int(light_phases(town, jnp.asarray(11.0), g, y, r)[0]) == RED
    assert int(light_phases(town, jnp.asarray(16.5), g, y, r)[0]) == GREEN  # wraps


def test_collision_predicates():
    assert bool(col.circle_circle(jnp.zeros(2), 1.0, jnp.ones((1, 2)), 1.0)[0])
    assert not bool(col.circle_circle(jnp.zeros(2), 0.5, jnp.array([[3.0, 0.0]]), 0.5)[0])
    boxes = jnp.array([[5.0, 0.0, 2.0, 2.0, 10.0]])
    assert bool(col.circle_aabb(jnp.array([2.5, 0.0]), 0.6, boxes)[0])
    assert not bool(col.circle_aabb(jnp.array([2.0, 0.0]), 0.5, boxes)[0])
    segs = jnp.array([[0.0, 0.0, 10.0, 0.0]])
    assert not bool(col.offroad(jnp.array([5.0, 1.0]), segs, 3.5))
    assert bool(col.offroad(jnp.array([5.0, 9.0]), segs, 3.5))


def test_reset_spawns_on_road():
    town = make_town(blocks=3)
    params = _params()
    for i in range(8):
        state = reset_env(params, town, jax.random.PRNGKey(i))
        assert not bool(col.offroad(state.ego_pos, town.road_segments,
                                    town.road_half_width))


def test_step_env_runs_and_autoresets():
    town = make_town(blocks=2)
    params = _params(n_agents=6, episode_len=5)
    state = reset_env(params, town, jax.random.PRNGKey(0))
    ctrl = VehicleControl(steer=jnp.zeros(()), throttle=jnp.ones(()), brake=jnp.zeros(()))
    for i in range(5):
        state, info = step_env(params, town, state, ctrl)
    # episode_len=5 → 5th step triggers timeout auto-reset → t back to 0
    assert int(state.t) == 0
    assert bool(info["done"])


def test_autopilot_closed_loop_no_collision():
    """Autopilot drives 300 steps: stays on road, no collisions, moves."""
    town = make_town(blocks=3, n_lights=0 or 8)
    params = _params(n_agents=0 or 4, episode_len=10_000)
    state = reset_env(params, town, jax.random.PRNGKey(42))

    def body(state, _):
        ctrl = autopilot_control(params, town, state)
        state, info = step_env(params, town, state, ctrl)
        return state, (info["offroad"], info["collision"], state.ego_v)

    state, (offs, cols_, vs) = jax.lax.scan(body, state, None, length=300)
    assert not bool(jnp.any(offs)), "autopilot went off-road"
    assert not bool(jnp.any(cols_)), "autopilot collided"
    assert float(vs[-50:].mean()) > 1.0, "autopilot failed to drive"


def test_batched_env_vmap():
    town = make_town(blocks=2)
    params = _params(n_agents=4, episode_len=50)
    reset_batch, step_batch = make_batched_env(params, town)
    states = reset_batch(jax.random.PRNGKey(0), 16)
    assert states.ego_pos.shape == (16, 2)
    ctrl = VehicleControl(
        steer=jnp.zeros((16,)), throttle=jnp.ones((16,)), brake=jnp.zeros((16,)))
    states2, infos = jax.jit(step_batch)(states, ctrl)
    assert states2.ego_pos.shape == (16, 2)
    assert infos["done"].shape == (16,)
    assert np.all(np.isfinite(np.asarray(states2.ego_pos)))


def test_sensor_vector_contract():
    town = make_town(blocks=2)
    params = _params()
    state = reset_env(params, town, jax.random.PRNGKey(1))
    sv = sensor_vector(params, state)
    assert sv.shape == (3,)  # (current_steer, speed_long, speed)
    np.testing.assert_allclose(float(sv[2]), float(state.ego_v), rtol=1e-6)
