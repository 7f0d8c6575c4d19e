"""CIL navigation-command taxonomy (round-3 verdict items 'missing 3'/'next 5').

Every branch of the 6-command BranchedCILPolicy must be reachable by the
world: 0=follow 1=left 2=right 3=straight-at-junction 4=change-lane-left
5=change-lane-right. Plain CCW block loops can only express {0, 1}; the
super-block/L routes add 3 and 2, scripted ego lane changes add 4/5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.sim import (
    SimParams, ego_lane_change_plan, make_town, navigation_command, reset_env,
)
from carla_imitation_learning_tpu.sim.town import route_point


@pytest.fixture(scope="module")
def rich_town():
    # blocks=2, lanes=2, superblocks: groups = 4 singles + 2 H + 2 V pairs
    # + 1 L + 1 perimeter = 10 groups x 2 lanes = 20 routes
    return make_town(blocks=2, block_size=60.0, n_buildings=4, n_lights=2,
                     lanes_per_direction=2, superblocks=True)


def commands_along_route(params, town, route, n=400, t=0):
    state = reset_env(params, town, jax.random.PRNGKey(0))
    total = float(town.route_total[route])
    ss = jnp.linspace(0.0, total, n, endpoint=False)

    def at(s):
        st = state.replace(ego_route=jnp.asarray(route, jnp.int32), ego_s=s,
                           t=jnp.asarray(t, jnp.int32))
        pos, yaw = route_point(town, st.ego_route, s)
        return navigation_command(params, town, st.replace(ego_pos=pos,
                                                           ego_yaw=yaw))

    return np.asarray(jax.vmap(at)(ss))


def test_route_group_layout(rich_town):
    assert rich_town.routes.shape[0] == 20
    assert rich_town.lanes == 2


def test_block_loop_emits_follow_and_left(rich_town):
    params = SimParams()
    cmds = set(commands_along_route(params, rich_town, route=0))
    assert 0 in cmds and 1 in cmds
    assert 2 not in cmds  # CCW rectangles never turn right


def test_superblock_emits_straight_at_junction(rich_town):
    params = SimParams()
    # first H-pair group = group 4 -> route 8 (lane 0); its long sides pass
    # straight through the mid grid node
    cmds = set(commands_along_route(params, rich_town, route=8))
    assert 3 in cmds


def test_l_route_emits_right_turn(rich_town):
    params = SimParams()
    # L group is the second-to-last group (perimeter last) -> route 16
    cmds = set(commands_along_route(params, rich_town, route=16))
    assert 2 in cmds  # the concave corner turns right at a junction
    assert 1 in cmds and 3 in cmds


def test_lane_change_commands_and_plan(rich_town):
    params = SimParams(lane_change_period=60, lane_change_window=12)
    state = reset_env(params, rich_town, jax.random.PRNGKey(1))
    # lane 0 of a block loop (offset inward): target = lane 1 = change LEFT
    st = state.replace(ego_route=jnp.asarray(0, jnp.int32))
    tgt, cmd = ego_lane_change_plan(
        params, rich_town, st.replace(t=jnp.asarray(30, jnp.int32)))
    assert int(tgt) == 1 and int(cmd) == 4
    # outside the announce window: no command
    _, cmd0 = ego_lane_change_plan(
        params, rich_town, st.replace(t=jnp.asarray(0, jnp.int32)))
    assert int(cmd0) == 0
    # lane 1 -> back down to lane 0 = change RIGHT
    _, cmd_r = ego_lane_change_plan(
        params, rich_town, st.replace(ego_route=jnp.asarray(1, jnp.int32),
                                      t=jnp.asarray(30, jnp.int32)))
    assert int(cmd_r) == 5
    # PERIMETER group (routes 18, 19): offset outward flips left/right
    _, cmd_p = ego_lane_change_plan(
        params, rich_town, st.replace(ego_route=jnp.asarray(18, jnp.int32),
                                      t=jnp.asarray(30, jnp.int32)))
    assert int(cmd_p) == 5  # k 0->1 moves right on the perimeter


def test_rollout_executes_lane_change_and_covers_commands(rich_town):
    """Integration: collected trajectories on the rich town emit every
    command class, and the scripted switch actually rewrites ego_route."""
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.training.closed_loop import collect_dataset

    params = SimParams(n_agents=2, lane_change_period=40, lane_change_window=10,
                       episode_len=200)
    rcfg = RenderConfig(32, 32, max_triangles=256, backend="jax")
    store, _, traj = collect_dataset(params, rich_town, rcfg,
                                     jax.random.PRNGKey(3),
                                     n_envs=24, n_steps=90)
    cmds = np.bincount(store.commands, minlength=6)
    assert cmds.shape[0] == 6 and (cmds >= 0).all()
    seen = set(np.unique(store.commands).tolist())
    # follow/left everywhere; lane-change commands from the scripted plan;
    # straight/right need a super-block or L spawn among the 24 envs
    assert {0, 1, 4, 5} <= seen, f"commands seen: {sorted(seen)}"
    assert (3 in seen) or (2 in seen), f"commands seen: {sorted(seen)}"
    assert store.commands.max() <= 5


def test_single_lane_town_plan_is_inert():
    town = make_town(blocks=2, n_buildings=2, n_lights=2)
    params = SimParams(lane_change_period=50)
    state = reset_env(params, town, jax.random.PRNGKey(0))
    tgt, cmd = ego_lane_change_plan(params, town,
                                    state.replace(t=jnp.asarray(25, jnp.int32)))
    assert int(tgt) == int(state.ego_route) and int(cmd) == 0


def test_policy_family_cil_drives_rollout(rich_town):
    """policy_family=cil wires a BranchedCILPolicy into the shared
    checkpoint-eval contract (_policy_bits): the policy_fn consumes the
    rollout's extras (speed + command) and emits discrete actions — so CIL
    checkpoints score in closed_loop_eval / scenario_eval / route_eval."""
    from carla_imitation_learning_tpu.config import compose
    from carla_imitation_learning_tpu.experiments import _policy_bits
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    cfg = compose("config", overrides=["model=imitation",
                                       "policy_family=cil"])
    policy_fn, rng, model, mparams = _policy_bits(cfg, None, 32, 32)
    params = SimParams(n_agents=0, episode_len=100)
    rcfg = RenderConfig(32, 32, max_triangles=256, backend="jax")
    init_fn, rollout_fn = make_rollout(params, rich_town, rcfg, policy_fn)
    _, traj = rollout_fn(init_fn(rng, 4), 6)
    acts = np.asarray(traj["action"])
    assert acts.shape == (6, 4) and acts.dtype == np.int32
    assert (acts >= 0).all() and (acts < 9).all()
