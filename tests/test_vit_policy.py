"""ViT policy family (models/vit.py): shapes, resolution transfer, the
``policy_arch=vit`` wiring through bc → checkpoint eval → export."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models import ViTPolicy

TINY = dict(patch=8, dim=32, depth=2, heads=2, pos_grid=4)


def _init(model, h, w, batch=2, seed=0):
    x = jnp.zeros((batch, h, w, model.obs_size), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)["params"], x


def test_forward_shape_and_dtype():
    model = ViTPolicy(n_actions=9, **TINY)
    params, x = _init(model, 64, 64)
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, 9)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_resolution_transfer_same_params():
    """One params pytree serves any resolution (pos-emb resize + pad-up):
    the 256²-trained checkpoint must run at the 128² rollout camera."""
    model = ViTPolicy(**TINY)
    params, _ = _init(model, 64, 64)
    for h, w in ((32, 32), (96, 64), (50, 70)):  # incl. non-multiples of patch
        out = model.apply({"params": params},
                          jnp.ones((1, h, w, model.obs_size)) * 0.5)
        assert out.shape == (1, 9)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_canonical_grid_uses_pos_emb_directly():
    """At the canonical grid (pos_grid·patch pixels) no resize happens; the
    pos-emb must still move the logits (it is actually applied)."""
    model = ViTPolicy(**TINY)
    hw = TINY["patch"] * TINY["pos_grid"]
    params, x = _init(model, hw, hw, batch=1, seed=1)
    base = model.apply({"params": params}, x)
    bumped = dict(params)
    bumped["pos_emb"] = params["pos_emb"] + 1.0
    moved = model.apply({"params": bumped}, x)
    assert float(jnp.abs(moved - base).max()) > 1e-4


def test_patchify_is_batch_equivariant():
    model = ViTPolicy(**TINY)
    params, _ = _init(model, 40, 40)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 40, 40, 4))
    full = model.apply({"params": params}, x)
    one = jnp.concatenate([model.apply({"params": params}, x[i:i + 1])
                           for i in range(4)])
    np.testing.assert_allclose(np.asarray(full), np.asarray(one),
                               atol=1e-5, rtol=1e-5)


VIT_OVERRIDES = ["policy_arch=vit", "vit_patch=8", "vit_dim=32",
                 "vit_depth=2", "vit_heads=2"]


@pytest.mark.slow
def test_cli_bc_vit_and_eval(tmp_path, capsys):
    """bc trains a ViT when policy_arch=vit; the checkpoint then drives
    closed_loop_eval through _policy_bits with the same flag."""
    from carla_imitation_learning_tpu.cli import main as cli_main
    from tests.test_cli import _overrides

    ov = _overrides(tmp_path, extra=VIT_OVERRIDES + ["bc_cameras=['camera']"])
    assert cli_main(["run", "bc", "--json"] + ov) == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    best = result["camera"]["best_path"]
    assert best is not None
    assert result["camera"]["history"][-1]["val_loss"] > 0

    ev = _overrides(tmp_path, extra=VIT_OVERRIDES + [
        f"checkpoint={best}", "n_envs=4", "n_steps=8"])
    rc = cli_main(["run", "closed_loop_eval", "--json"] + ev)
    assert rc == 0
    evald = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert "driving_score" in evald["policy"]


def test_vit_export_roundtrip(tmp_path):
    """The ViT exports through the same StableHLO path as the CNN and the
    servable reproduces live logits."""
    from carla_imitation_learning_tpu.serving import export_policy, load_policy

    model = ViTPolicy(dtype=jnp.float32, **TINY)
    params, _ = _init(model, 32, 32)
    path = export_policy(model, params, tmp_path / "vit_servable",
                         height=32, width=32, platforms=("cpu",))
    servable = load_policy(path)
    x = np.random.default_rng(7).integers(0, 256, (3, 32, 32, 4),
                                          dtype=np.uint8)
    live = model.apply({"params": params}, x.astype(np.float32) / 255.0)
    shipped = servable.call(x)
    np.testing.assert_allclose(np.asarray(shipped), np.asarray(live),
                               atol=1e-4, rtol=1e-4)


def test_unknown_policy_arch_raises():
    from carla_imitation_learning_tpu.experiments import _discrete_policy_model

    with pytest.raises(ValueError, match="policy_arch"):
        _discrete_policy_model({"policy_arch": "mlp"}, 4)
