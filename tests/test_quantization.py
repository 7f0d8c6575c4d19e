"""int8 post-training quantization tests (serving/quant.py): exactness on
representable values, bounded logit error + margin-aware argmax agreement,
int8 export roundtrip, and coverage across policy families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from carla_imitation_learning_tpu.models import BranchedCILPolicy, PolicyCNN
from carla_imitation_learning_tpu.serving import (
    export_policy,
    load_policy,
    make_quantized_policy,
    quantized_apply,
)

H = W = 32


@pytest.mark.parametrize("layer", ["conv", "dense"])
def test_int8_exact_on_representable_values(layer):
    """A single Conv/Dense whose weights AND inputs already sit on the int8
    grid quantizes exactly: scales are max/127, every value is a grid
    multiple, the int32 accumulate is exact. (Deeper stacks re-quantize
    intermediate activations, so exactness is a per-layer guarantee.)"""

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            if layer == "conv":
                return nn.Conv(4, (3, 3), padding="VALID")(x)
            return nn.Dense(3)(x.reshape((x.shape[0], -1)))

    m = Tiny()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 2)))["params"]
    rng = np.random.default_rng(0)

    def grid(p):
        a = rng.integers(-127, 128, p.shape).astype(np.float32)
        if a.ndim >= 2:  # pin per-output-channel max to 127 → scale exactly 1
            a[(0,) * (a.ndim - 1) + (slice(None),)] = 127.0
        return jnp.asarray(a)

    params = jax.tree.map(grid, params)
    xa = rng.integers(0, 128, (2, 6, 6, 2)).astype(np.float32)
    xa[:, 0, 0, 0] = 127.0  # pin each sample's max too (per-sample scales)
    x = jnp.asarray(xa)
    want = np.asarray(m.apply({"params": params}, x), np.float64)
    got = np.asarray(quantized_apply(m, params, x), np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-2)


@pytest.fixture(scope="module")
def policy():
    model = PolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, H, W, 4)))["params"]
    return model, params


def test_quantized_logits_close_and_argmax_agrees(policy):
    model, params = policy
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (64, H, W, 4), dtype=np.uint8)
    obs = x.astype(np.float32) / 255.0
    f = np.asarray(model.apply({"params": params}, obs), np.float32)
    q = np.asarray(quantized_apply(model, params, obs), np.float32)
    err = np.abs(f - q).max()
    spread = f.std()
    assert err < 0.2 * spread, f"int8 logit error {err} vs spread {spread}"
    # argmax must agree wherever the float decision isn't a near-tie
    sorted_f = np.sort(f, axis=-1)
    margin = sorted_f[:, -1] - sorted_f[:, -2]
    confident = margin > 2 * err
    assert confident.sum() > 0
    assert np.array_equal(f.argmax(-1)[confident], q.argmax(-1)[confident])


def test_int8_export_roundtrip(policy, tmp_path):
    model, params = policy
    art = export_policy(model, params, tmp_path / "q", height=H, width=W,
                        quantize="int8")
    servable = load_policy(art)
    assert servable.meta["quantize"] == "int8"
    rng = np.random.default_rng(2)
    for b in (1, 5):
        x = rng.integers(0, 256, (b, H, W, 4), dtype=np.uint8)
        want = np.asarray(make_quantized_policy(model, params)(x))
        got = np.asarray(servable.call(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_artifact_smaller_than_float(policy, tmp_path):
    """Per-channel int8 weights constant-fold into the blob → ~4× smaller
    weight payload than the float artifact."""
    model, params = policy
    f = export_policy(model, params, tmp_path / "f", height=H, width=W)
    q = export_policy(model, params, tmp_path / "q2", height=H, width=W,
                      quantize="int8")
    fb = (f / "policy.stablehlo").stat().st_size
    qb = (q / "policy.stablehlo").stat().st_size
    assert qb < 0.5 * fb, f"int8 blob {qb} not smaller than float {fb}"


def test_quantized_cil_policy_runs():
    """The interceptor covers every Conv/Dense — branched CIL needs no code."""
    model = BranchedCILPolicy(n_commands=4, dtype=jnp.float32)
    frames, speed, command = model.example_input(3, H, W)
    params = model.init(jax.random.PRNGKey(0), frames, speed, command)["params"]
    want = model.apply({"params": params}, frames, speed, command)
    got = quantized_apply(model, params, frames, speed, command)
    w = want[0] if isinstance(want, tuple) else want
    g = got[0] if isinstance(got, tuple) else got
    assert np.asarray(g).shape == np.asarray(w).shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_int8_batch_invariance(policy):
    """Per-sample activation scales: a sample's quantized logits do not
    depend on its batchmates (so engine padding can't perturb results)."""
    model, params = policy
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (6, H, W, 4), dtype=np.uint8)
    obs = x.astype(np.float32) / 255.0
    full = np.asarray(quantized_apply(model, params, obs))
    alone = np.asarray(quantized_apply(model, params, obs[2:3]))
    np.testing.assert_allclose(full[2:3], alone, rtol=1e-5, atol=1e-5)
    padded = np.asarray(quantized_apply(
        model, params, np.concatenate([obs, np.zeros_like(obs)], axis=0)))
    np.testing.assert_allclose(padded[:6], full, rtol=1e-5, atol=1e-5)
