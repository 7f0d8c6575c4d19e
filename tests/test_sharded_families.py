"""Every model family trains data-parallel over the mesh with metrics equal
to the unsharded run — the TPU-native analogue of the reference applying
`gpus=` uniformly to every train.py block (train.py:57-237)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models import (
    AuxNet, BranchedCILPolicy, ConvVAE, DualStreamCNN, PolicyCNN,
)
from carla_imitation_learning_tpu.parallel.mesh import (
    batch_sharding, make_mesh, shard_train_state,
)
from carla_imitation_learning_tpu.training import (
    aux_loss_fn, bc_loss_fn, cil_loss_fn, create_train_state,
    dual_stream_loss_fn, make_optimizer, make_train_step, vae_loss_fn,
)

B, HW = 8, 32


def _family(name):
    """(model, example_init_input, loss_fn, batch) tiny fixtures per family."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (B, HW, HW, 4))
    y = jnp.arange(B, dtype=jnp.int32) % 9
    if name == "bc":
        return PolicyCNN(dtype=jnp.float32), x[:1], bc_loss_fn, (x, y)
    if name == "vit":
        from carla_imitation_learning_tpu.models import ViTPolicy

        m = ViTPolicy(patch=8, dim=32, depth=2, heads=2, pos_grid=4,
                      dtype=jnp.float32)
        return m, x[:1], bc_loss_fn, (x, y)
    if name == "vae":
        m = ConvVAE(channels=1, height=HW, width=HW, z_size=8, dtype=jnp.float32)
        xi = x[..., :1]
        return m, (xi[:1], rng), vae_loss_fn(0.75, 0.1), (xi,)
    if name == "aux":
        m = AuxNet(n_traffic_classes=2, image_hw=HW, dtype=jnp.float32)
        sensor = jax.random.uniform(rng, (B, 3))
        tgt = jnp.stack([y % 2, y], axis=-1)
        return m, ((x[:1], sensor[:1]),), aux_loss_fn(0.1, 0.1, 1.0), ((x, sensor), tgt)
    if name == "dual":
        m = DualStreamCNN(dtype=jnp.float32)
        return m, (x[:1], x[:1]), dual_stream_loss_fn, (x, x, y)
    if name == "cil":
        m = BranchedCILPolicy(n_commands=4, dtype=jnp.float32)
        speed = jax.random.uniform(rng, (B,))
        cmd = jnp.arange(B, dtype=jnp.int32) % 4
        return m, (x[:1], speed[:1], cmd[:1]), cil_loss_fn(0.1), (x, speed, cmd, y)
    raise ValueError(name)


@pytest.mark.parametrize("family", ["bc", "vit", "vae", "aux", "dual", "cil"])
def test_sharded_step_matches_unsharded(family, eight_devices):
    model, example, loss_fn, batch = _family(family)
    rng = jax.random.PRNGKey(1)
    tx = make_optimizer({"LEARNING_RATE": 1e-3, "gradient_clip_val": 0.5}, 1)
    if isinstance(example, tuple):
        state = create_train_state(model, rng, example, tx)
    else:
        state = create_train_state(model, rng, example, tx)
    step = make_train_step(loss_fn, donate=False)

    _, m_unsharded = step(state, batch, rng)

    mesh = make_mesh(axis_sizes={"data": 8})
    sh = batch_sharding(mesh)
    state_s = shard_train_state(mesh, state)
    batch_s = jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)
    new_state, m_sharded = step(state_s, batch_s, rng)

    for k in m_unsharded:
        np.testing.assert_allclose(np.asarray(m_unsharded[k]),
                                   np.asarray(m_sharded[k]), rtol=2e-5,
                                   err_msg=f"{family}:{k}")
    # params stay replicated; the gradient all-reduce is XLA-inserted
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
