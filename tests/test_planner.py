"""Global route planner (sim/planner.py): A→B navigation over the turn-fan
graph — the CARLA GlobalRoutePlanner equivalent.

Properties verified: the baked tables are complete (a host-side walk from
every reachable node reaches the goal), the sim executes them (the expert
ARRIVES, monotone-descent transfers, no route ping-pong), free-roam envs are
bit-identical with tables present, unreachable spawns respawn, goals persist
across resets, and arrival ends the episode as a success.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.render.pipeline import RenderConfig
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.training import closed_loop as cl
from carla_imitation_learning_tpu.sim.planner import (
    nearest_node,
    plan_to_goals,
    sample_goals,
)
from carla_imitation_learning_tpu.sim.world import (
    autopilot_control,
    reset_env,
    step_env,
)

N_GOALS = 3


@pytest.fixture(scope="module")
def world():
    town = make_town(blocks=2, n_buildings=6, n_lights=2, seed=1,
                     superblocks=True, turn_fans=True)
    goals = sample_goals(town, 0, N_GOALS)
    town = plan_to_goals(town, goals)
    params = SimParams(n_agents=0, episode_len=3000, arrive_radius=5.0)
    return params, town, goals


def test_tables_shapes_and_reachability(world):
    _, town, goals = world
    R, P = town.routes.shape[:2]
    assert town.nav_slot.shape == (N_GOALS, R, P)
    assert town.nav_dist.shape == (N_GOALS, R, P)
    assert np.allclose(np.asarray(town.nav_goals), goals)
    # goals sampled on shared stretches → reachable from most of the graph
    finite = np.isfinite(np.asarray(town.nav_dist)).mean(axis=(1, 2))
    assert (finite > 0.5).all()


def test_table_walk_reaches_goal_from_every_node(world):
    """Following the baked policy from ANY finite node terminates at the
    goal — no cycles, no dead ends. The walk applies the runtime's
    monotone-descent gate (sim/world.py: a transfer fires only when the
    landing node's table distance strictly decreases — widened coincident
    prescriptions are gated, exactly as in the sim)."""
    _, town, _ = world
    ns = np.asarray(town.nav_slot)
    nd = np.asarray(town.nav_dist)
    tr = np.asarray(town.transfer_route)
    ts = np.asarray(town.transfer_s)
    total = np.asarray(town.route_total)
    P = ns.shape[2]
    for g in range(N_GOALS):
        for r0 in range(ns.shape[1]):
            for p0 in range(0, P, 8):
                if not np.isfinite(nd[g, r0, p0]):
                    continue
                r, p = r0, p0
                for _ in range(1200):
                    if nd[g, r, p] < 3.0:
                        break
                    k = ns[g, r, p]
                    if k >= 0:
                        rr = int(tr[r, p, k])
                        pp = int(round(ts[r, p, k] / total[rr] * P)) % P
                        if nd[g, rr, pp] < nd[g, r, p]:  # descent gate
                            r, p = rr, pp
                            continue
                    p = (p + 1) % P
                else:
                    raise AssertionError(
                        f"walk stuck: goal {g} from ({r0}, {p0}) at ({r}, {p})")


def test_expert_arrives(world):
    params, town, goals = world
    step = jax.jit(lambda s: step_env(params, town, s,
                                      autopilot_control(params, town, s)))
    arrivals = 0
    for g in range(N_GOALS):
        s = reset_env(params, town, jax.random.PRNGKey(3 + g)).replace(
            goal=jnp.int32(g))
        for _ in range(2500):
            s, info = step(s)
            if bool(info["arrived"]):
                arrivals += 1
                break
    assert arrivals >= N_GOALS - 1, f"only {arrivals}/{N_GOALS} arrived"


def test_free_roam_identical_with_tables(world):
    """goal = −1 envs step bit-identically whether or not nav tables are
    baked into the town."""
    params, town, _ = world
    plain = town.replace(nav_slot=None, nav_dist=None, nav_goals=None)
    s0 = reset_env(params, town, jax.random.PRNGKey(11))
    s_nav, s_plain = s0, s0
    for _ in range(50):
        ctrl = autopilot_control(params, town, s_nav)
        s_nav, info_nav = step_env(params, town, s_nav, ctrl)
        s_plain, info_plain = step_env(params, plain, s_plain, ctrl)
        np.testing.assert_array_equal(np.asarray(s_nav.ego_pos),
                                      np.asarray(s_plain.ego_pos))
        assert int(s_nav.ego_route) == int(s_plain.ego_route)
        assert not bool(info_nav["arrived"])
        assert bool(info_nav["done"]) == bool(info_plain["done"])


def test_goal_persists_across_resets_and_arrival_ends_episode(world):
    params, town, goals = world
    # place the ego AT the goal: arrival fires immediately and the episode
    # ends as done without any infraction
    r, p = nearest_node(town, goals[0])
    s = reset_env(params, town, jax.random.PRNGKey(0)).replace(
        goal=jnp.int32(0),
        ego_route=jnp.int32(r),
        ego_s=town.route_arclen[r, p],
        ego_pos=town.routes[r, p],
    )
    s2, info = step_env(params, town, s,
                        autopilot_control(params, town, s))
    assert bool(info["arrived"]) and bool(info["done"])
    assert not bool(info["collision"]) and not bool(info["offroad"])
    # the respawned state re-attempts the SAME goal
    assert int(s2.goal) == 0


def test_unreachable_spawn_ends_episode(world):
    """A spawn on a route with no path to the goal (inf table distance)
    ends immediately so the respawn can re-attempt."""
    params, town, _ = world
    nd = np.asarray(town.nav_dist)[0]
    bad = np.argwhere(~np.isfinite(nd))
    if bad.size == 0:
        pytest.skip("every node reaches goal 0 in this town")
    r, p = bad[0]
    s = reset_env(params, town, jax.random.PRNGKey(0)).replace(
        goal=jnp.int32(0),
        ego_route=jnp.int32(int(r)),
        ego_s=town.route_arclen[int(r), int(p)],
        ego_pos=town.routes[int(r), int(p)],
    )
    _, info = step_env(params, town, s, autopilot_control(params, town, s))
    assert bool(info["done"]) and not bool(info["arrived"])


def test_goal_directed_collection(world):
    """collect_dataset(goal_ids=...) records planner-driven runs: envs
    arrive (arrivals show up as auto-reset episode starts in the store's
    bitmap) and the command channel announces turns — the training
    distribution a CIL policy needs for A→B navigation."""
    params, town, _ = world
    rcfg = RenderConfig(height=16, width=16)
    goal_ids = np.arange(8, dtype=np.int32) % N_GOALS
    store, _, traj = cl.collect_dataset(params, town, rcfg,
                                        jax.random.PRNGKey(0),
                                        n_envs=8, n_steps=1000,
                                        goal_ids=goal_ids)
    arrived = np.asarray(traj["arrived"], bool)
    assert arrived.any(), "no env arrived in the collection budget"
    cmds = np.asarray(store.commands)
    assert ((cmds == 1) | (cmds == 2)).any()
    # arrivals are episode boundaries: starts bitmap has the env-stream
    # heads PLUS one start right after every mid-stream done
    n_extra = int(np.asarray(store.starts).sum()) - 8
    assert n_extra >= int(arrived.sum()) > 0


def test_free_roam_collection_identical_with_tables(world):
    """goal_ids=None collection is bit-identical whether or not nav tables
    are baked into the town."""
    params, town, _ = world
    plain = town.replace(nav_slot=None, nav_dist=None, nav_goals=None)
    rcfg = RenderConfig(height=16, width=16)
    s_nav, _, _ = cl.collect_dataset(params, town, rcfg,
                                     jax.random.PRNGKey(1), n_envs=4,
                                     n_steps=60)
    s_plain, _, _ = cl.collect_dataset(params, plain, rcfg,
                                       jax.random.PRNGKey(1), n_envs=4,
                                       n_steps=60)
    np.testing.assert_array_equal(np.asarray(s_nav.frames),
                                  np.asarray(s_plain.frames))
    np.testing.assert_array_equal(np.asarray(s_nav.actions),
                                  np.asarray(s_plain.actions))
    np.testing.assert_array_equal(np.asarray(s_nav.commands),
                                  np.asarray(s_plain.commands))


def test_no_route_ping_pong(world):
    """The monotone-descent gate keeps route rewrites rare: a navigating
    expert must not flap the route id every step."""
    params, town, _ = world
    step = jax.jit(lambda s: step_env(params, town, s,
                                      autopilot_control(params, town, s)))
    s = reset_env(params, town, jax.random.PRNGKey(3)).replace(
        goal=jnp.int32(0))
    rewrites = steps = 0
    for _ in range(400):
        r0 = int(s.ego_route)
        s, info = step(s)
        steps += 1
        rewrites += int(int(s.ego_route) != r0 and not bool(info["done"]))
        if bool(info["arrived"]):
            break
    assert rewrites <= steps // 4, f"{rewrites} rewrites in {steps} steps"


def test_route_metrics_count_crash_episodes_once(world):
    """infractions_per_km counts crash EPISODES (an impact at a road edge
    sets collision AND offroad on the same step — it is ONE infraction), and
    an explicit goal_ids assignment is honored."""
    params, town, _ = world
    rcfg = RenderConfig(height=16, width=16)

    def swerve(obs):  # full throttle + hard left (class 6): guaranteed crashes
        return jnp.full((obs.shape[0],), 6, jnp.int32)

    res = cl.evaluate_routes(params, town, rcfg, swerve,
                             jax.random.PRNGKey(5), n_envs=6, n_steps=300,
                             goal_ids=np.zeros(6, np.int32))
    assert res["crashes"] > 0 and res["km_driven"] > 0
    np.testing.assert_allclose(res["infractions_per_km"],
                               res["crashes"] / res["km_driven"], rtol=1e-9)
