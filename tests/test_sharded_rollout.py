"""Env-axis sharding: fleet rollouts over the 8-device CPU mesh."""

import numpy as np

import jax

from carla_imitation_learning_tpu.parallel.mesh import make_mesh, maybe_mesh
from carla_imitation_learning_tpu.render.pipeline import RenderConfig
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.training.closed_loop import (
    evaluate_policy, make_rollout,
)

TOWN = make_town(blocks=2, n_buildings=6, n_lights=4)
PARAMS = SimParams(n_agents=3, episode_len=1000)
RCFG = RenderConfig(32, 32, max_triangles=256, backend="jax")


def test_sharded_rollout_runs_and_matches_unsharded(eight_devices):
    mesh = make_mesh(axis_sizes={"data": 8})
    init_s, roll_s = make_rollout(PARAMS, TOWN, RCFG, None, mesh=mesh)
    carry = init_s(jax.random.PRNGKey(0), 16)
    # env axis is sharded over the mesh
    assert not carry[0].ego_pos.sharding.is_fully_replicated
    carry, traj_s = roll_s(carry, 6)

    init_u, roll_u = make_rollout(PARAMS, TOWN, RCFG, None, mesh=None)
    carry_u = init_u(jax.random.PRNGKey(0), 16)
    carry_u, traj_u = roll_u(carry_u, 6)

    np.testing.assert_allclose(np.asarray(traj_s["speed"]),
                               np.asarray(traj_u["speed"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(traj_s["action"]),
                                  np.asarray(traj_u["action"]))


def test_evaluate_policy_with_mesh(eight_devices):
    mesh = make_mesh(axis_sizes={"data": 8})
    m = evaluate_policy(PARAMS, TOWN, RCFG, None, jax.random.PRNGKey(1),
                        n_envs=8, n_steps=10, mesh=mesh)
    assert m["env_steps"] == 80
    assert m["action_agreement"] == 1.0


def test_maybe_mesh_divisibility(eight_devices):
    class FakeCfg(dict):
        def get_dotted(self, k, d=None):
            return d

    assert maybe_mesh(None, batch_size=16) is not None  # 16 % 8 == 0
    assert maybe_mesh(None, batch_size=12) is None      # not divisible
    assert maybe_mesh(None) is not None


def test_sharded_bc_experiment(eight_devices, tmp_path):
    """End-to-end: the bc experiment picks up the 8-device mesh."""
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import behavior_cloning

    cfg = compose("config", overrides=[
        "model=imitation", "NUM_EPOCHS=1", "BATCH_SIZE=8", "synthetic_frames=60",
        "image_height=64", "image_width=64", "compute_dtype=float32",
        "trainer.num_sanity_val_steps=0",
        f"data_dir={tmp_path}/data/", f"log_dir={tmp_path}/logs",
    ])
    result = behavior_cloning(cfg, cameras=("camera",))
    assert result["camera"]["history"][-1]["train_loss"] > 0
    # params stayed replicated through sharded training
    leaf = jax.tree_util.tree_leaves(result["camera"]["state"].params)[0]
    assert leaf.sharding.is_fully_replicated
