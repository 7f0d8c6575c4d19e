"""Mirrored-town collection + per-command balanced sampling — the two
levers that fix CIL command starvation (r3 measured: right-turn got 66 of
51,200 goal-directed frames and both lane-change commands got zero, because
make_town's loops are all counterclockwise and epoch balancing only knew
action classes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.data.pipeline import DeviceDataset, FrameStore
from carla_imitation_learning_tpu.sim import (
    SimParams, make_town, navigation_command, reset_env,
)
from carla_imitation_learning_tpu.sim.town import mirror_town, route_point


def _town():
    return make_town(blocks=3, superblocks=True, turn_fans=True, seed=0)


def test_mirror_preserves_metric_structure():
    town = _town()
    m = mirror_town(town)
    np.testing.assert_allclose(np.asarray(m.route_total),
                               np.asarray(town.route_total), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.route_arclen),
                               np.asarray(town.route_arclen), rtol=1e-6)
    assert float(m.extent) == float(town.extent)
    assert float(m.road_half_width) == float(town.road_half_width)
    # pure reflection: x negated, y untouched
    np.testing.assert_allclose(np.asarray(m.routes)[..., 0],
                               -np.asarray(town.routes)[..., 0])
    np.testing.assert_allclose(np.asarray(m.routes)[..., 1],
                               np.asarray(town.routes)[..., 1])
    np.testing.assert_allclose(np.asarray(m.road_segments)[:, [0, 2]],
                               -np.asarray(town.road_segments)[:, [0, 2]])


def test_mirror_transfers_stay_position_preserving():
    """The turn-fan tables survive reflection untouched: taking slot k at
    (r, p) still lands on the same world point (coincidence is geometric and
    reflection is an isometry)."""
    m = mirror_town(_town())
    tr = np.asarray(m.transfer_route)
    ts = np.asarray(m.transfer_s)
    tv = np.asarray(m.transfer_valid)
    rs, ps, ks = np.nonzero(tv)
    sel = np.random.default_rng(0).choice(len(rs), size=min(64, len(rs)),
                                          replace=False)
    for i in sel:
        r, p, k = int(rs[i]), int(ps[i]), int(ks[i])
        src = np.asarray(m.routes)[r, p]
        dst, _ = route_point(m, jnp.asarray(tr[r, p, k], jnp.int32),
                             jnp.asarray(ts[r, p, k]))
        assert float(jnp.linalg.norm(dst - src)) < 1.5, (r, p, k)


def test_mirror_flips_turn_commands():
    """navigation_command at the same (route, s) swaps left(1) and right(2)
    between the town and its mirror; follow(0) and straight(3) are fixed."""
    town = _town()
    m = mirror_town(town)
    params = SimParams(n_agents=0, n_pedestrians=0)
    base = reset_env(params, town, jax.random.PRNGKey(0))
    seen = set()
    for r in range(int(town.routes.shape[0])):
        for s in np.linspace(0, float(town.route_total[r]) - 1, 40):
            st = base.replace(ego_route=jnp.asarray(r, jnp.int32),
                              ego_s=jnp.asarray(float(s)))
            c = int(navigation_command(params, town, st))
            cm = int(navigation_command(params, m, st))
            assert cm == {0: 0, 1: 2, 2: 1, 3: 3}[c], (r, s, c, cm)
            seen.add(c)
        if {1, 2} <= seen:
            break
    assert 1 in seen, "no left turn found — trivial test"


def _store(n, commands, actions=None):
    return FrameStore(
        frames=np.zeros((n, 8, 8), np.uint8),
        actions=(np.zeros(n, np.int32) if actions is None
                 else np.asarray(actions, np.int32)),
        traffic=np.zeros(n, np.int32),
        sensors=np.zeros((n, 3), np.float32),
        commands=np.asarray(commands, np.int32),
    )


def test_balance_key_command():
    """balance_key='command' draws every command ~equally even at 9:1 skew."""
    n = 400
    commands = np.where(np.arange(n) % 10 == 0, 1, 0)
    ds = DeviceDataset(_store(n, commands), batch_size=16, frame_skip=2,
                       cil=True, balanced=True, balance_key="command", seed=0)
    drawn = np.concatenate([ds.epoch_indices() for _ in range(4)])
    labels = commands[np.asarray(jax.device_get(
        ds.start_indices(drawn))) + ds.label_offset]
    frac1 = float((labels == 1).mean())
    assert 0.4 < frac1 < 0.6, frac1


def test_balance_key_action_command_joint():
    """Joint balancing: every (action, command) cell present draws ~equally."""
    n = 600
    commands = np.where(np.arange(n) % 3 == 0, 1, 0)
    actions = np.where(np.arange(n) % 20 == 0, 4, 0)
    ds = DeviceDataset(_store(n, commands, actions), batch_size=16,
                       frame_skip=2, cil=True, balanced=True,
                       balance_key="action_command", seed=0)
    drawn = np.concatenate([ds.epoch_indices() for _ in range(4)])
    starts = np.asarray(jax.device_get(ds.start_indices(drawn)))
    cells = actions[starts + ds.label_offset] * 10 + commands[
        starts + ds.label_offset]
    _, counts = np.unique(cells, return_counts=True)
    ratio = counts.max() / counts.min()
    assert ratio < 2.0, counts


def test_balance_key_rejects_unknown():
    with pytest.raises(ValueError, match="balance_key"):
        DeviceDataset(_store(40, np.zeros(40)), batch_size=8, frame_skip=2,
                      balanced=True, balance_key="speed")


def test_plan_to_goals_lane_aware_tolerance():
    """On a multilane town the auto goal_tol makes goals reachable from
    EVERY lane — under the bare 2.0 m tolerance the whole second-lane
    network had nav_dist=∞ (measured 52% of nodes)."""
    from carla_imitation_learning_tpu.sim.planner import (
        plan_to_goals, sample_goals,
    )

    town = make_town(blocks=2, lanes_per_direction=2, superblocks=True,
                     turn_fans=True, seed=0)
    goals = sample_goals(town, 0, 2)
    strict = plan_to_goals(town, goals, goal_tol=2.0)
    auto = plan_to_goals(town, goals)
    inf_strict = float(np.isinf(np.asarray(strict.nav_dist)).mean())
    inf_auto = float(np.isinf(np.asarray(auto.nav_dist)).mean())
    assert inf_strict > 0.3          # the bug this guards against
    assert inf_auto < 0.10, inf_auto
