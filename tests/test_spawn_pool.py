"""Packed spawn pool: pick_fresh_packed must reproduce pick_fresh exactly
(same salt formula, one row gather + bitcasts instead of ~14 leaf gathers)."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.sim import SimParams, make_town, reset_env
from carla_imitation_learning_tpu.sim.world import (
    make_spawn_pool, pack_spawn_pool, pick_fresh, pick_fresh_packed,
)

TOWN = make_town(blocks=2, n_buildings=4, n_lights=2)
PARAMS = SimParams(n_agents=3)


def test_packed_pick_matches_tree_pick():
    pool = make_spawn_pool(PARAMS, TOWN, jax.random.PRNGKey(7), 64)
    packed, metas, treedef = pack_spawn_pool(pool)
    states = jax.vmap(lambda k: reset_env(PARAMS, TOWN, k))(
        jax.random.split(jax.random.PRNGKey(1), 5))
    for e in range(5):
        st = jax.tree_util.tree_map(lambda a: a[e], states)
        st = st.replace(t=jnp.asarray(17 * e, jnp.int32))
        a = pick_fresh(pool, st)
        b = pick_fresh_packed(packed, metas, treedef, st)
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            assert la.dtype == lb.dtype and la.shape == lb.shape
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_packed_pick_under_vmap_and_jit():
    pool = make_spawn_pool(PARAMS, TOWN, jax.random.PRNGKey(3), 32)
    packed, metas, treedef = pack_spawn_pool(pool)
    states = jax.vmap(lambda k: reset_env(PARAMS, TOWN, k))(
        jax.random.split(jax.random.PRNGKey(2), 8))

    @jax.jit
    def pick_all(states):
        return jax.vmap(lambda s: pick_fresh_packed(packed, metas, treedef, s)
                        )(states)

    fresh = pick_all(states)
    ref = jax.vmap(lambda s: pick_fresh(pool, s))(states)
    for la, lb in zip(jax.tree_util.tree_leaves(fresh),
                      jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
