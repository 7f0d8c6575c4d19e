"""Safety shield (training/shield.py): trigger semantics, clean-label
contract, eval integration. No reference equivalent — deployment capability."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.sim.world import VehicleControl, reset_env
from carla_imitation_learning_tpu.training.shield import (
    ShieldConfig, make_shield, shield_from_cfg,
)

TOWN = make_town(blocks=2, n_buildings=6, n_lights=2)
PARAMS = SimParams(n_agents=3)


def _fleet(n=4, seed=0):
    return jax.vmap(lambda k: reset_env(PARAMS, TOWN, k))(
        jax.random.split(jax.random.PRNGKey(seed), n))


def _face_agent0(states, gap: float, speed: float):
    """Point env 0's ego straight at agent 0 from ``gap`` meters away."""
    from carla_imitation_learning_tpu.sim.agents import agent_positions

    ap, _ = agent_positions(TOWN, states.agents_route[0], states.agents_s[0])
    target = ap[0]
    yaw = jnp.arctan2(0.0, 1.0)  # face +x; place ego west of the target
    pos = target - jnp.asarray([gap, 0.0])
    return states.replace(
        ego_pos=states.ego_pos.at[0].set(pos),
        ego_yaw=states.ego_yaw.at[0].set(yaw),
        ego_v=states.ego_v.at[0].set(speed),
    )


def test_shield_triggers_head_on_and_brakes():
    states = _fleet()
    states = _face_agent0(states, gap=6.0, speed=8.0)
    apply = make_shield(TOWN, ShieldConfig())
    n = states.t.shape[0]
    control = VehicleControl(steer=jnp.zeros(n), throttle=jnp.ones(n),
                             brake=jnp.zeros(n))
    out, trig = apply(states, control)
    trig = np.asarray(trig)
    assert trig[0], "6 m gap at 8 m/s is inside both envelopes"
    assert float(out.throttle[0]) == 0.0 and float(out.brake[0]) == 1.0
    # steering is untouched everywhere
    np.testing.assert_array_equal(np.asarray(out.steer),
                                  np.asarray(control.steer))
    # untriggered envs keep their command
    for i in range(1, n):
        if not trig[i]:
            assert float(out.throttle[i]) == 1.0 and float(out.brake[i]) == 0.0


def test_shield_clear_road_is_noop():
    """Ego parked far from every obstacle at low speed: no intervention."""
    states = _fleet(n=2, seed=3)
    # a spot far outside the town grid, facing away from it
    states = states.replace(
        ego_pos=jnp.tile(jnp.asarray([[-500.0, -500.0]]), (2, 1)),
        ego_yaw=jnp.full((2,), jnp.pi),  # facing further away
        ego_v=jnp.full((2,), 5.0))
    apply = make_shield(TOWN, ShieldConfig())
    control = VehicleControl(steer=jnp.zeros(2), throttle=jnp.ones(2),
                             brake=jnp.zeros(2))
    out, trig = apply(states, control)
    assert not np.asarray(trig).any()
    np.testing.assert_array_equal(np.asarray(out.throttle), 1.0)


def test_shield_in_rollout_logs_and_keeps_labels_clean():
    """make_rollout(shield=...): traj gains a (T, B) shield mask, and the
    recorded action labels equal the UNSHIELDED policy output (full-throttle
    policy → labels stay the throttle action even on shielded steps)."""
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    rcfg = RenderConfig(height=32, width=32, backend="jax", rgb=False,
                        semantic=False, max_triangles=128)

    def full_throttle(obs):
        return jnp.full((obs.shape[0],), 7, jnp.int32)  # straight + throttle

    init_fn, rollout_fn = make_rollout(PARAMS, TOWN, rcfg, full_throttle,
                                       shield=ShieldConfig())
    carry = init_fn(jax.random.PRNGKey(0), 4)
    _, traj = rollout_fn(carry, 30)
    assert "shield" in traj and traj["shield"].shape == (30, 4)
    # labels are the policy's own choice on every step, shielded or not
    assert np.asarray(traj["action"] == 7).all()
    # shielded steps actually brake in the executed control
    trig = np.asarray(traj["shield"], bool)
    if trig.any():
        assert np.asarray(traj["brake"])[trig].min() == 1.0
        assert np.asarray(traj["throttle"])[trig].max() == 0.0

    # shield=None path is bit-identical to the pre-shield rollout
    init2, roll2 = make_rollout(PARAMS, TOWN, rcfg, full_throttle)
    _, traj2 = roll2(init2(jax.random.PRNGKey(0), 4), 30)
    assert "shield" not in traj2
    np.testing.assert_array_equal(np.asarray(traj["frames"] if "frames" in traj
                                             else traj["action"]),
                                  np.asarray(traj2["frames"] if "frames" in traj2
                                             else traj2["action"]))


def test_evaluate_policy_reports_interventions():
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.training.closed_loop import (
        evaluate_policy,
    )

    rcfg = RenderConfig(height=32, width=32, backend="jax", rgb=False,
                        semantic=False, max_triangles=128)

    def full_throttle(obs):
        return jnp.full((obs.shape[0],), 7, jnp.int32)

    m = evaluate_policy(PARAMS, TOWN, rcfg, full_throttle,
                        jax.random.PRNGKey(0), n_envs=4, n_steps=30,
                        shield=ShieldConfig())
    assert "shield_interventions_per_km" in m
    assert 0.0 <= m["shield_active_frac"] <= 1.0
    m2 = evaluate_policy(PARAMS, TOWN, rcfg, full_throttle,
                         jax.random.PRNGKey(0), n_envs=4, n_steps=30)
    assert "shield_interventions_per_km" not in m2


def test_shield_from_cfg():
    class FakeCfg(dict):
        pass

    assert shield_from_cfg(FakeCfg()) is None
    cfg = FakeCfg(safety_shield=True, shield_ttc_s=1.5)
    sc = shield_from_cfg(cfg)
    assert sc is not None and sc.ttc_s == 1.5 and sc.hard_m == 3.0
