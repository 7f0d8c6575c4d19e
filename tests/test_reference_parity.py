"""Hard parity checks against the reference's architectures and utilities."""

import numpy as np

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.models import DualStreamCNN, PolicyCNN


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _torch_conv(cin, cout, k):
    return cout * cin * k * k + cout


def _torch_linear(fin, fout):
    return fin * fout + fout


def test_policy_cnn_param_count_equals_convnet1(rng):
    """Exact parameter-count equality with reference ConvNet1 (nets.py:17-33):
    convs (4→16 k7, 16→32 k5, 32→64 k4, 64→128 k3) + MLP 128→64→32→9."""
    expected = (
        _torch_conv(4, 16, 7) + _torch_conv(16, 32, 5)
        + _torch_conv(32, 64, 4) + _torch_conv(64, 128, 3)
        + _torch_linear(128, 64) + _torch_linear(64, 32) + _torch_linear(32, 9)
    )
    model = PolicyCNN(dtype=jnp.float32)
    params = model.init(rng, model.example_input(1))["params"]
    assert _count(params) == expected


def test_dual_stream_param_count_equals_convnetrawsegment(rng):
    """Reference ConvNetRawSegment (nets.py:53-69): ONE shared trunk
    (4→32 k7, 32→64 k5, 64→128 k4, 128→256 k3) + MLP 256→200→48→9."""
    expected = (
        _torch_conv(4, 32, 7) + _torch_conv(32, 64, 5)
        + _torch_conv(64, 128, 4) + _torch_conv(128, 256, 3)
        + _torch_linear(256, 200) + _torch_linear(200, 48) + _torch_linear(48, 9)
    )
    model = DualStreamCNN(dtype=jnp.float32)
    x, xs = model.example_input(1)
    params = model.init(rng, x, xs)["params"]
    assert _count(params) == expected


def test_skip_run_gating(capsys):
    """skip_run context manager parity (reference utils.py:14-43)."""
    from carla_imitation_learning_tpu.utils import skip_run

    ran = []
    with skip_run("run", "block a") as check, check():
        ran.append("a")
    with skip_run("skip", "block b") as check, check():
        ran.append("b")
    assert ran == ["a"]
    out = capsys.readouterr().out
    assert "Running the block" in out and "Skipping the block" in out


def test_vae_loss_matches_reference_formula(rng):
    """alpha·MSE + beta·KL exactly as reference vae.py:26-35 computes it."""
    from carla_imitation_learning_tpu.training.losses import vae_loss_fn

    x = jax.random.uniform(rng, (4, 8, 8, 1))
    recon = jax.random.uniform(jax.random.fold_in(rng, 1), (4, 8, 8, 1))
    mu = jax.random.normal(jax.random.fold_in(rng, 2), (4, 5))
    log_var = jax.random.normal(jax.random.fold_in(rng, 3), (4, 5))

    def fake_apply(variables, xx, rr=None):
        return recon, mu, log_var

    loss, metrics = vae_loss_fn(alpha=0.75, beta=0.1)({}, fake_apply, x)
    x_, r_, m_, lv_ = (np.asarray(a, np.float64) for a in (x, recon, mu, log_var))
    kl = (-0.5 * (1 + lv_ - m_**2 - np.exp(lv_)).sum(1)).mean()
    mse = ((x_ - r_) ** 2).mean()
    np.testing.assert_allclose(float(loss), 0.75 * mse + 0.1 * kl, rtol=1e-5)
