"""Reference torch-checkpoint importer: function-preserving weight mapping
(utils/torch_import.py). Builds the reference ConvNet1's exact module layout
in plain torch (nets.py:17-33), saves a Lightning-style checkpoint, imports,
and asserts the flax PolicyCNN reproduces the torch logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from carla_imitation_learning_tpu.models import DualStreamCNN, PolicyCNN
from carla_imitation_learning_tpu.utils.torch_import import (
    import_and_save, import_reference_policy,
)


def _convnet1(obs_size=4, n_actions=9, widths=(16, 32, 64, 128),
              fc=(64, 32)):
    """The reference cnn_base/fc Sequential layout (nets.py:17-33) in plain
    torch (no Lightning needed for the state_dict contract)."""
    nn = torch.nn
    c = widths
    net = nn.Module()
    net.cnn_base = nn.Sequential(
        nn.Conv2d(obs_size, c[0], kernel_size=7, stride=3), nn.ReLU(),
        nn.MaxPool2d(kernel_size=3),
        nn.Conv2d(c[0], c[1], kernel_size=5, stride=1), nn.ReLU(),
        nn.MaxPool2d(kernel_size=2),
        nn.Conv2d(c[1], c[2], kernel_size=4, stride=1), nn.ReLU(),
        nn.MaxPool2d(kernel_size=2),
        nn.Conv2d(c[2], c[3], kernel_size=3, stride=1), nn.ReLU(),
        nn.MaxPool2d(kernel_size=2),
    )
    net.fc = nn.Sequential(nn.Linear(c[3], fc[0]), nn.ReLU(),
                           nn.Linear(fc[0], fc[1]), nn.ReLU(),
                           nn.Linear(fc[1], n_actions))
    return net


def _torch_forward(net, x_nchw):
    with torch.no_grad():
        h = net.cnn_base(torch.as_tensor(x_nchw))
        return net.fc(torch.flatten(h, start_dim=1)).numpy()


def test_imported_convnet1_matches_torch_logits(tmp_path):
    torch.manual_seed(0)
    net = _convnet1()
    # Lightning prefixes the wrapped net's keys (imitation.py:31)
    ckpt = {"state_dict": {f"net.{k}": v for k, v in net.state_dict().items()}}
    path = tmp_path / "imitation.ckpt"
    torch.save(ckpt, path)

    params = import_reference_policy(path)
    x = np.random.default_rng(1).uniform(0, 1, (2, 4, 256, 256)).astype(np.float32)
    want = _torch_forward(net, x)
    got = np.asarray(PolicyCNN(dtype=jnp.float32).apply(
        {"params": params}, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_imported_rawsegment_matches_torch_logits():
    """ConvNetRawSegment layout (wider widths, shared trunk, summed features,
    nets.py:53-78) — same mapping; DualStreamCNN reproduces the sum."""
    torch.manual_seed(1)
    net = _convnet1(widths=(32, 64, 128, 256), fc=(200, 48))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}  # bare layout
    params = import_reference_policy(sd)

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (2, 4, 256, 256)).astype(np.float32)
    xs = rng.uniform(0, 1, (2, 4, 256, 256)).astype(np.float32)
    with torch.no_grad():
        h = torch.flatten(net.cnn_base(torch.as_tensor(x)), start_dim=1) + \
            torch.flatten(net.cnn_base(torch.as_tensor(xs)), start_dim=1)
        want = net.fc(h).numpy()
    nhwc = lambda a: jnp.transpose(jnp.asarray(a), (0, 2, 3, 1))  # noqa: E731
    got = np.asarray(DualStreamCNN(dtype=jnp.float32).apply(
        {"params": params}, nhwc(x), nhwc(xs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_import_and_save_feeds_checkpoint_consumers(tmp_path):
    torch.manual_seed(2)
    net = _convnet1()
    path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": {f"net.{k}": v
                               for k, v in net.state_dict().items()}}, path)
    out = import_and_save(path, tmp_path / "imported")

    from carla_imitation_learning_tpu.utils.checkpoint import restore_pytree

    model = PolicyCNN(dtype=jnp.float32)
    target = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 256, 4)))["params"]
    restored = restore_pytree(out, {"params": target})["params"]
    w = np.transpose(net.state_dict()["cnn_base.0.weight"].numpy(),
                     (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(restored["ConvTrunk_0"]["Conv_0"]["kernel"]), w, rtol=1e-6)


def test_unrecognized_layout_raises():
    with pytest.raises(ValueError):
        import_reference_policy({"something.weird": np.zeros(3)})
