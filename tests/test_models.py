"""Model-zoo shape/param contracts vs the reference architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models import (
    PolicyCNN, DualStreamCNN, ConvVAE, AuxNet, BranchedCILPolicy,
)

F32 = jnp.float32


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def test_policy_cnn_shapes(rng):
    model = PolicyCNN(dtype=F32)
    x = model.example_input(batch=2)
    variables = model.init(rng, x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 9)
    assert logits.dtype == jnp.float32
    # trunk flattens to exactly 128 features on 256² input (reference nets.py:31)
    trunk_out = variables["params"]["MLPHead_0"]["Dense_0"]["kernel"].shape[0]
    assert trunk_out == 128


def test_policy_cnn_jit_matches_eager(rng):
    model = PolicyCNN(dtype=F32)
    x = jax.random.uniform(rng, (2, 256, 256, 4))
    variables = model.init(rng, x)
    eager = model.apply(variables, x)
    jitted = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=2e-5, atol=2e-5)


def test_dual_stream_shared_trunk(rng):
    model = DualStreamCNN(dtype=F32)
    x, x_seg = model.example_input(batch=2)
    variables = model.init(rng, x, x_seg)
    out = model.apply(variables, x, x_seg)
    assert out.shape == (2, 9)
    # ONE shared trunk (reference nets.py:71-76): only one ConvTrunk in params
    trunks = [k for k in variables["params"] if k.startswith("ConvTrunk")]
    assert len(trunks) == 1
    # 256-dim fused feature → 200 → 48 → 9 (nets.py:67-69)
    assert variables["params"]["MLPHead_0"]["Dense_0"]["kernel"].shape == (256, 200)


def test_vae_shapes_and_hidden_size(rng):
    model = ConvVAE(dtype=F32)
    assert model.hidden_size == 2048  # 4×4×128 at 224² (nets.py encoder arithmetic)
    x = model.example_input(batch=2)
    variables = model.init(rng, x, jax.random.PRNGKey(1))
    recon, mu, log_var = model.apply(variables, x, jax.random.PRNGKey(1))
    assert recon.shape == (2, 224, 224, 1)
    assert mu.shape == (2, 32) and log_var.shape == (2, 32)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid output


def test_vae_deterministic_without_rng(rng):
    model = ConvVAE(dtype=F32)
    x = jax.random.uniform(rng, (1, 224, 224, 1))
    variables = model.init(rng, x, None)
    r1, mu1, _ = model.apply(variables, x, None)
    r2, mu2, _ = model.apply(variables, x, None)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_aux_net_interface(rng):
    """Output tuple (recon, traffic_logits, action_logits) — inferred interface
    of the missing CNNAuxNet (reference imitation.py:11-24)."""
    model = AuxNet(image_hw=64, dtype=F32)
    x = model.example_input(batch=2)
    variables = model.init(rng, x)
    recon, traffic, action = model.apply(variables, x)
    assert recon.shape == (2, 64, 64, 4)
    assert traffic.shape == (2, 2)
    assert action.shape == (2, 9)


def test_branched_cil(rng):
    model = BranchedCILPolicy(dtype=F32)
    frames, speed, command = model.example_input(batch=3)
    frames = jax.random.uniform(rng, (3, 256, 256, 4))
    command = jnp.array([0, 2, 3], jnp.int32)
    variables = model.init(rng, frames, speed, command)
    logits, pred_speed = model.apply(variables, frames, speed, command)
    assert logits.shape == (3, 9) and pred_speed.shape == (3,)
    # branch selection: changing an unused branch's params must not alter output
    logits2, _ = model.apply(variables, frames, speed, jnp.array([1, 2, 3], jnp.int32))
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits2[0]))


@pytest.mark.parametrize("hw,expect", [(256, 128)])
def test_trunk_spatial_arithmetic(rng, hw, expect):
    """256→84→28→24→12→9→4→2→1 (reference ConvNet1 trunk, nets.py:17-30)."""
    from carla_imitation_learning_tpu.models.cnn import ConvTrunk

    x = jnp.zeros((1, hw, hw, 4))
    trunk = ConvTrunk(dtype=F32)
    variables = trunk.init(rng, x)
    out = trunk.apply(variables, x)
    assert out.shape == (1, expect)
