"""Space-to-depth stem: function-preserving reshaped-weight equivalence
(round-3 verdict item 3). The k7/s3 thin-input first conv and its k3/s1
folded form must produce IDENTICAL network outputs with converted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.models import PolicyCNN, convert_params_to_s2d
from carla_imitation_learning_tpu.models.cnn import (
    _space_to_depth_stem_input, s2d_stem_kernel,
)


def test_s2d_conv_equivalence_raw():
    """k7/s3 VALID conv == k3/s1 VALID conv on the folded layout."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 67, 4)), jnp.float32)
    w7 = jnp.asarray(rng.normal(size=(7, 7, 4, 16)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w7, (3, 3), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xs = _space_to_depth_stem_input(x)
    w3 = s2d_stem_kernel(w7)
    got = jax.lax.conv_general_dilated(
        xs, w3, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [256, 128])
def test_policy_cnn_s2d_matches_standard(hw):
    base = PolicyCNN(dtype=jnp.float32)
    s2d = PolicyCNN(dtype=jnp.float32, s2d_stem=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (3, hw, hw, 4))
    params = base.init(rng, x)["params"]
    p2 = convert_params_to_s2d(params)
    out_base = base.apply({"params": params}, x)
    out_s2d = s2d.apply({"params": p2}, x)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_base),
                               rtol=2e-4, atol=2e-4)


def test_s2d_param_shapes():
    s2d = PolicyCNN(dtype=jnp.float32, s2d_stem=True)
    p = s2d.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 4)))["params"]
    assert p["ConvTrunk_0"]["Conv_0"]["kernel"].shape == (3, 3, 36, 16)
    # same parameter count downstream (only the stem layout changes)
    base = PolicyCNN(dtype=jnp.float32)
    pb = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 4)))["params"]
    for layer in ("Conv_1", "Conv_2", "Conv_3"):
        assert (p["ConvTrunk_0"][layer]["kernel"].shape
                == pb["ConvTrunk_0"][layer]["kernel"].shape)


def test_s2d_falls_back_on_tiny_inputs():
    """Inputs smaller than the 7-tap stem take the SAME-padding fallback in
    BOTH variants (the s2d transform only applies where the k7/s3 VALID stem
    does)."""
    s2d = PolicyCNN(dtype=jnp.float32, s2d_stem=True)
    x = jnp.zeros((1, 6, 6, 4))
    p = s2d.init(jax.random.PRNGKey(0), x)["params"]
    assert p["ConvTrunk_0"]["Conv_0"]["kernel"].shape == (7, 7, 4, 16)
    assert s2d.apply({"params": p}, x).shape == (1, 9)
