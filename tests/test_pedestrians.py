"""Pedestrian (crosswalk walker) tests: stepping, collision, expert braking,
rendering and the zero-walker default.

Covers the walker-actor capability the reference system outsourced to the
CARLA server (SURVEY.md L0)."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.sim.pedestrians import (
    PED_RADIUS, ped_positions, pedestrian_ahead, spawn_pedestrians,
    step_pedestrians,
)
from carla_imitation_learning_tpu.sim.world import (
    autopilot_control, reset_env, step_env,
)


def town():
    return make_town(blocks=2, n_buildings=8, n_lights=4)


def test_town_has_crossings():
    t = town()
    assert t.crossings.ndim == 3 and t.crossings.shape[1:] == (2, 2)
    assert t.crossings.shape[0] >= 2
    # crossings span roughly a road width
    lengths = np.linalg.norm(
        np.asarray(t.crossings[:, 1] - t.crossings[:, 0]), axis=-1)
    assert (lengths > 4.0).all() and (lengths < 20.0).all()


def test_walkers_traverse_and_bounce():
    t = town()
    crossing = jnp.zeros((1,), jnp.int32)
    s = jnp.asarray([0.5])
    phase = jnp.asarray([1.0])  # walking, +1 direction
    dt = 0.05
    seen_s = []
    for _ in range(600):  # 30 s: enough to cross (≈8 m at 1.4 m/s) and bounce
        s, phase = step_pedestrians(t, crossing, s, phase, dt=dt)
        seen_s.append(float(s[0]))
    seen = np.asarray(seen_s)
    assert seen.max() >= 1.0 - 1e-6   # reached the far curb
    assert seen.min() >= 0.0 and seen.max() <= 1.0
    assert seen[-1] < seen.max()      # came back after the pause: ping-pong
    # curb pause: the walker holds the far curb for ~CURB_WAIT_S / dt steps
    from carla_imitation_learning_tpu.sim.pedestrians import CURB_WAIT_S

    # length of the FIRST contiguous stay at the far curb
    at_end = seen >= 1.0 - 1e-6
    first = int(np.argmax(at_end))
    run = int(np.argmin(at_end[first:])) if not at_end[first:].all() else \
        int(at_end[first:].sum())
    expect = CURB_WAIT_S / dt
    assert 0.8 * expect <= run <= 1.3 * expect, (
        f"waited {run} steps at the curb, expected ≈{expect:.0f}")


def test_positions_on_crossing_segment():
    t = town()
    crossing = jnp.asarray([0, 1], jnp.int32)
    s = jnp.asarray([0.0, 1.0])
    pos = np.asarray(ped_positions(t, crossing, s))
    np.testing.assert_allclose(pos[0], np.asarray(t.crossings)[0, 0], atol=1e-6)
    np.testing.assert_allclose(pos[1], np.asarray(t.crossings)[1, 1], atol=1e-6)


def test_spawn_shapes_and_zero():
    t = town()
    c, s, p = spawn_pedestrians(t, jax.random.PRNGKey(0), 6)
    assert c.shape == s.shape == p.shape == (6,)
    assert (np.abs(np.asarray(p)) == 1.0).all()  # spawn walking
    c0, s0, p0 = spawn_pedestrians(t, jax.random.PRNGKey(0), 0)
    assert c0.shape == (0,)


def test_pedestrian_ahead_cone():
    peds = jnp.asarray([[5.0, 0.0]])
    assert bool(pedestrian_ahead(jnp.zeros(2), jnp.asarray(0.0), peds))
    # behind the ego
    assert not bool(pedestrian_ahead(jnp.zeros(2), jnp.asarray(np.pi), peds))
    # far to the side
    side = jnp.asarray([[5.0, 9.0]])
    assert not bool(pedestrian_ahead(jnp.zeros(2), jnp.asarray(0.0), side))
    # no walkers at all
    assert not bool(pedestrian_ahead(jnp.zeros(2), jnp.asarray(0.0),
                                     jnp.zeros((0, 2))))


def test_step_env_with_walkers_and_collision_flag():
    t = town()
    params = SimParams(n_agents=4, n_pedestrians=6)
    st = reset_env(params, t, jax.random.PRNGKey(0))
    assert st.peds_s.shape == (6,)
    from carla_imitation_learning_tpu.sim.world import VehicleControl

    ctl = VehicleControl(steer=jnp.asarray(0.0), throttle=jnp.asarray(0.5),
                         brake=jnp.asarray(0.0))
    st2, info = step_env(params, t, st, ctl)
    assert "pedestrian" in info
    assert st2.peds_s.shape == (6,)

    # teleport the ego onto a walker → pedestrian collision ends the episode
    peds_pos = ped_positions(t, st.peds_crossing, st.peds_s)
    st_hit = st.replace(ego_pos=peds_pos[0])
    _, info_hit = step_env(params, t, st_hit, ctl)
    assert bool(info_hit["pedestrian"])
    assert bool(info_hit["done"])


def test_expert_brakes_for_crossing_walker():
    t = town()
    params = SimParams(n_agents=0, n_pedestrians=2, target_speed=8.0)
    st = reset_env(params, t, jax.random.PRNGKey(1))
    # plant a walker right in front of the ego, moving at speed
    heading = jnp.stack([jnp.cos(st.ego_yaw), jnp.sin(st.ego_yaw)])
    ahead_pos = st.ego_pos + 8.0 * heading
    # find s on crossing 0 closest is irrelevant — instead override positions
    # by moving a crossing endpoint test: use pedestrian_ahead directly + the
    # autopilot integration via a synthetic state on crossing 0
    seg = np.asarray(t.crossings)[0]
    # place ego before the crossing midpoint, facing it
    mid = (seg[0] + seg[1]) / 2.0
    ego_pos = jnp.asarray(mid - np.array([8.0, 0.0]), jnp.float32)
    st = st.replace(ego_pos=ego_pos, ego_yaw=jnp.asarray(0.0),
                    ego_v=jnp.asarray(6.0),
                    peds_crossing=jnp.zeros((2,), jnp.int32),
                    peds_s=jnp.asarray([0.5, 0.5]),
                    peds_phase=jnp.asarray([1.0, 1.0]))
    ctl = autopilot_control(params, t, st)
    assert float(ctl.brake) == 1.0 and float(ctl.throttle) == 0.0

    # same scene with walkers disabled → no phantom braking from this check
    params_clear = SimParams(n_agents=0, n_pedestrians=0, target_speed=8.0)
    st_clear = reset_env(params_clear, t, jax.random.PRNGKey(1)).replace(
        ego_pos=ego_pos, ego_yaw=jnp.asarray(0.0), ego_v=jnp.asarray(6.0))
    ctl_clear = autopilot_control(params_clear, t, st_clear)
    # (a red light could still brake it — only assert the ped path is gated)
    assert ctl_clear.brake.shape == ()


def test_walkers_render_with_semantic_class():
    from carla_imitation_learning_tpu.render import geometry as geo
    from carla_imitation_learning_tpu.render.pipeline import (
        RenderConfig, make_renderer,
    )

    t = town()
    params = SimParams(n_agents=2, n_pedestrians=8)
    rcfg = RenderConfig(height=64, width=64, backend="jax", max_triangles=640)
    render = make_renderer(params, t, rcfg)
    # drop the ego next to a crossing so walkers are in view
    st = reset_env(params, t, jax.random.PRNGKey(2))
    seg = np.asarray(t.crossings)[0]
    mid = (seg[0] + seg[1]) / 2.0
    st = st.replace(ego_pos=jnp.asarray(mid - np.array([10.0, 0.0]), jnp.float32),
                    ego_yaw=jnp.asarray(0.0),
                    peds_crossing=jnp.zeros((8,), jnp.int32),
                    peds_s=jnp.linspace(0.2, 0.8, 8),
                    peds_phase=jnp.ones((8,)))
    out = render(st)
    sem = np.asarray(out["semantic"])
    assert (sem == geo.SEM_PEDESTRIAN).any(), "walkers not visible in semantic"


def test_zero_walker_default_unchanged():
    """P=0 states flow through step/render identically to before the feature."""
    t = town()
    params = SimParams(n_agents=4)
    st = reset_env(params, t, jax.random.PRNGKey(0))
    assert st.peds_s.shape == (0,)
    from carla_imitation_learning_tpu.render.pipeline import (
        RenderConfig, make_renderer,
    )
    from carla_imitation_learning_tpu.sim.world import VehicleControl

    out = make_renderer(params, t, RenderConfig(height=32, width=32,
                                                backend="jax"))(st)
    assert out["gray"].shape == (32, 32)
    ctl = VehicleControl(steer=jnp.asarray(0.0), throttle=jnp.asarray(1.0),
                        brake=jnp.asarray(0.0))
    st2, info = step_env(params, t, st, ctl)
    assert not bool(info["pedestrian"])


def test_rollout_with_walkers_jits():
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    t = town()
    params = SimParams(n_agents=4, n_pedestrians=6)
    rcfg = RenderConfig(height=32, width=32, backend="jax", max_triangles=640)
    init_fn, rollout_fn = make_rollout(params, t, rcfg, None, lidar_beams=24)
    carry = init_fn(jax.random.PRNGKey(0), 4)
    _, traj = rollout_fn(carry, 3)
    assert traj["gray"].shape == (3, 4, 32, 32)
    assert traj["lidar"].shape == (3, 4, 24)
    assert np.isfinite(np.asarray(traj["speed"])).all()


def test_sidewalk_strollers():
    """sidewalk_frac=1 walkers stroll their block's sidewalk loop: path ids
    address town.sidewalks, s wraps (no curb pauses), and every position
    stays OFF the roadway (sidewalks sit 1.2 m beyond the road edge)."""
    t = town()
    n_cross = t.crossings.shape[0]
    path, s, phase = spawn_pedestrians(t, jax.random.PRNGKey(1), 8,
                                       sidewalk_frac=1.0)
    assert (np.asarray(path) >= n_cross).all()
    assert (np.asarray(path) < n_cross + t.sidewalks.shape[0]).all()

    road_half = float(t.road_half_width)
    segs = np.asarray(t.road_segments)

    def min_road_dist(pos):
        d = np.inf
        for x0, y0, x1, y1 in segs:
            a, b = np.array([x0, y0]), np.array([x1, y1])
            ab = b - a
            tt = np.clip(((pos - a) @ ab) / (ab @ ab), 0.0, 1.0)
            proj = a + tt[:, None] * ab if pos.ndim == 2 else a + tt * ab
            d = np.minimum(d, np.linalg.norm(pos - proj, axis=-1))
        return d

    moved = 0.0
    for _ in range(200):
        s, phase = step_pedestrians(t, path, s, phase, dt=0.05)
        pos = np.asarray(ped_positions(t, path, s))
        assert np.isfinite(pos).all()
        assert (min_road_dist(pos) > road_half).all()  # never on the roadway
        assert ((np.asarray(s) >= 0.0) & (np.asarray(s) < 1.0)).all()
    # strollers never pause: phase stays at +-1 (always walking)
    assert (np.abs(np.asarray(phase)) == 1.0).all()
    # and they actually move around the loop
    p0 = np.asarray(ped_positions(t, path, s))
    s2, _ = step_pedestrians(t, path, s, phase, dt=0.05)
    p1 = np.asarray(ped_positions(t, path, s2))
    moved = np.linalg.norm(p1 - p0, axis=-1)
    np.testing.assert_allclose(moved, 1.4 * 0.05, rtol=0.2)


def test_sidewalk_strollers_do_not_brake_ego():
    """The autopilot's braking corridor ignores sidewalk-mode walkers
    (pedestrian_ahead mask): a stroller directly ahead must not stop the
    ego, an identically-placed crosswalk walker must."""
    peds = jnp.asarray([[5.0, 0.0]])
    assert bool(pedestrian_ahead(jnp.zeros(2), jnp.asarray(0.0), peds))
    assert not bool(pedestrian_ahead(jnp.zeros(2), jnp.asarray(0.0), peds,
                                     mask=jnp.asarray([False])))

    t = town()
    params = SimParams(n_agents=2, n_pedestrians=4, ped_sidewalk_frac=1.0)
    state = reset_env(params, t, jax.random.PRNGKey(3))
    n_cross = t.crossings.shape[0]
    assert (np.asarray(state.peds_crossing) >= n_cross).all()
    # stepping with all-sidewalk walkers stays finite and collision-free
    for _ in range(20):
        state, info = step_env(params, t, state,
                               autopilot_control(params, t, state))
    assert np.isfinite(float(state.ego_v))


def test_mixed_spawn_covers_both_modes():
    t = town()
    path, _, _ = spawn_pedestrians(t, jax.random.PRNGKey(7), 64,
                                   sidewalk_frac=0.5)
    n_cross = t.crossings.shape[0]
    frac = float((np.asarray(path) >= n_cross).mean())
    assert 0.2 < frac < 0.8  # both modes present
