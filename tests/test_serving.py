"""Serving tier tests: StableHLO export roundtrip, symbolic batch, engine
bucketing/splitting exactness (CPU; the artifact also carries a tpu lowering)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models import PolicyCNN
from carla_imitation_learning_tpu.serving import (
    InferenceEngine,
    export_policy,
    load_policy,
)

H = W = 32


@pytest.fixture(scope="module")
def trained():
    model = PolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 4)))["params"]
    return model, params


@pytest.fixture(scope="module")
def artifact(trained, tmp_path_factory):
    model, params = trained
    path = tmp_path_factory.mktemp("servable") / "policy"
    return export_policy(model, params, path, height=H, width=W,
                         platforms=("tpu", "cpu"),
                         extra_meta={"n_actions": 9})


def _frames(rng, b):
    return rng.integers(0, 256, (b, H, W, 4), dtype=np.uint8)


def test_export_roundtrip_exact(trained, artifact):
    """Deserialized program == live apply, at several symbolic batch sizes."""
    model, params = trained
    servable = load_policy(artifact)
    rng = np.random.default_rng(0)
    for b in (1, 3, 16):
        x = _frames(rng, b)
        got = np.asarray(servable.call(x))
        want = np.asarray(model.apply(
            {"params": params}, x.astype(np.float32) / 255.0))
        assert got.shape == (b, 9)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_artifact_metadata(artifact):
    meta = json.loads((artifact / "meta.json").read_text())
    assert meta["model"] == "PolicyCNN"
    assert set(meta["platforms"]) == {"tpu", "cpu"}
    assert meta["inputs"][0]["shape"] == ["b", str(H), str(W), "4"]
    assert meta["inputs"][0]["dtype"] == "uint8"
    assert meta["n_actions"] == 9
    # the blob is self-contained: params are baked in, so it outweighs them
    param_bytes = 0
    # (PolicyCNN at 32² is small; just sanity-check the blob is non-trivial)
    assert (artifact / "policy.stablehlo").stat().st_size > 10_000 + param_bytes


def test_loaded_policy_needs_no_model_source(artifact):
    """load_policy touches only jax + the artifact (no flax/model imports)."""
    servable = load_policy(artifact)
    assert servable.meta["kind"] == "policy"
    out = servable.call(np.zeros((2, H, W, 4), np.uint8))
    assert np.asarray(out).shape == (2, 9)


def test_engine_bucketing_matches_direct(trained, artifact):
    """Odd request sizes (pad) and oversize requests (split) are exact."""
    model, params = trained
    servable = load_policy(artifact)
    eng = InferenceEngine(servable, max_batch=8)
    assert eng.buckets == (1, 2, 4, 8)
    rng = np.random.default_rng(1)
    for b in (1, 5, 8, 13, 20):  # pad / exact / split-with-tail
        x = _frames(rng, b)
        want = np.argmax(np.asarray(model.apply(
            {"params": params}, x.astype(np.float32) / 255.0)), axis=-1)
        got = eng.infer(x)
        assert got.dtype == np.int32 and got.shape == (b,)
        np.testing.assert_array_equal(got, want)


def test_engine_stats_and_warmup(artifact):
    eng = InferenceEngine(load_policy(artifact), max_batch=4)
    eng.warmup(H, W)
    assert eng.stats()["count"] == 0  # warmup doesn't pollute stats
    eng.infer(np.zeros((3, H, W, 4), np.uint8))
    s = eng.stats()
    assert s["count"] == 1 and s["latency_ms_p50"] > 0
    assert s["pad_waste_frac"] == pytest.approx(0.25)  # 3 padded to 4


def test_engine_rejects_bad_rank(artifact):
    eng = InferenceEngine(load_policy(artifact))
    with pytest.raises(ValueError):
        eng.infer(np.zeros((H, W, 4), np.uint8))


def test_export_live_fn_engine(trained):
    """The engine also wraps a live jitted apply (no artifact)."""
    model, params = trained

    @jax.jit
    def live(frames_u8):
        return model.apply({"params": params},
                           frames_u8.astype(jnp.float32) / 255.0)

    eng = InferenceEngine(live, buckets=(2, 4))
    out = eng.infer(np.zeros((3, H, W, 4), np.uint8))
    assert out.shape == (3,)


def test_cli_export_policy(tmp_path, capsys):
    """CLI surface: export → verify roundtrip → engine stats, tiny shapes."""
    from carla_imitation_learning_tpu.cli import main as cli_main

    overrides = []
    for o in ("height=32", "width=32", "serve_max_batch=4",
              f"log_dir={tmp_path}/logs", "compute_dtype=float32"):
        overrides += ["-o", o]
    rc = cli_main(["run", "export_policy", "--json"] + overrides)
    assert rc == 0
    result = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert result["roundtrip_max_abs_err"] < 1e-4
    assert result["blob_bytes"] > 10_000
    assert set(result["platforms"]) == {"tpu", "cpu"}
    assert result["engine"]["count"] == 1
    assert (tmp_path / "logs" / "policy_artifact" / "meta.json").exists()


def test_export_fn_multi_input_cil(tmp_path):
    """export_fn generalizes beyond single-tensor policies: the branched CIL
    net exports with THREE inputs sharing one symbolic batch dim."""
    from carla_imitation_learning_tpu.models import BranchedCILPolicy
    from carla_imitation_learning_tpu.serving import export_fn, load_policy

    model = BranchedCILPolicy(n_commands=4, dtype=jnp.float32)
    frames, speed, command = model.example_input(1, H, W)
    params = model.init(jax.random.PRNGKey(0), frames, speed, command)["params"]

    def infer(frames_u8, speed, command):
        obs = frames_u8.astype(jnp.float32) / 255.0
        out = model.apply({"params": params}, obs, speed, command)
        return out[0] if isinstance(out, tuple) else out

    specs = [
        jax.ShapeDtypeStruct(("b", H, W, 4), jnp.uint8),
        jax.ShapeDtypeStruct(("b",), jnp.float32),
        jax.ShapeDtypeStruct(("b",), jnp.int32),
    ]
    art = export_fn(infer, specs, tmp_path / "cil", meta={"kind": "cil"})
    servable = load_policy(art)
    rng = np.random.default_rng(0)
    for b in (2, 5):
        f = rng.integers(0, 256, (b, H, W, 4), dtype=np.uint8)
        s = rng.random(b).astype(np.float32)
        c = rng.integers(0, 4, b).astype(np.int32)
        got = np.asarray(servable.call(f, s, c))
        want = np.asarray(infer(f, s, c))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_engine_empty_request(trained):
    """A drained queue (batch 0) returns an empty result, not a crash."""
    model, params = trained

    @jax.jit
    def live(frames_u8):
        return model.apply({"params": params},
                           frames_u8.astype(jnp.float32) / 255.0)

    eng = InferenceEngine(live, max_batch=4)
    out = eng.infer(np.zeros((0, H, W, 4), np.uint8))
    assert out.shape == (0,) and out.dtype == np.int32


def test_servable_drives_closed_loop(trained, artifact):
    """Deployment-parity eval: the SHIPPED artifact drives the rollout scan
    (exported programs compose under jit) and reproduces the live policy's
    driving metrics exactly — same argmax logits, same uint8 round-trip."""
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.serving import policy_fn_from_servable
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl

    model, params = trained
    servable = load_policy(artifact)
    town = make_town(blocks=2, n_buildings=4, n_lights=2)
    sim = SimParams(n_agents=2)
    rcfg = RenderConfig(H, W, max_triangles=256, backend="jax")
    rng = jax.random.PRNGKey(5)

    def live_policy(obs):
        return jnp.argmax(model.apply({"params": params}, obs), axis=-1)

    live = cl.evaluate_policy(sim, town, rcfg, live_policy, rng,
                              n_envs=4, n_steps=10)
    shipped = cl.evaluate_policy(sim, town, rcfg,
                                 policy_fn_from_servable(servable), rng,
                                 n_envs=4, n_steps=10)
    for k in ("driving_score", "route_completion", "mean_speed", "km_driven"):
        assert live[k] == pytest.approx(shipped[k], abs=1e-9), k


def test_export_cil_policy_full_contract(tmp_path):
    """export_cil_policy ships the branched CIL policy as a self-describing
    multi-input servable: logits match live apply, the command clip is baked
    into the program, and the engine pads/chunks the side inputs in lockstep
    with the frames."""
    from carla_imitation_learning_tpu.models import BranchedCILPolicy
    from carla_imitation_learning_tpu.serving import (
        export_cil_policy, load_policy,
    )

    model = BranchedCILPolicy(n_commands=4, dtype=jnp.float32)
    frames, speed, command = model.example_input(1, H, W)
    params = model.init(jax.random.PRNGKey(2), frames, speed, command)["params"]
    art = export_cil_policy(model, params, tmp_path / "cil", height=H,
                            width=W, platforms=("cpu",))
    servable = load_policy(art)
    assert servable.meta["family"] == "cil"
    assert servable.meta["n_commands"] == 4
    assert len(servable.meta["inputs"]) == 3

    rng = np.random.default_rng(1)
    f = rng.integers(0, 256, (5, H, W, 4), dtype=np.uint8)
    s = rng.uniform(0, 12, 5).astype(np.float32)
    c = np.array([0, 1, 2, 3, 9], np.int32)  # 9 = out of taxonomy
    live = np.asarray(model.apply({"params": params},
                                  f.astype(np.float32) / 255.0, s,
                                  np.clip(c, 0, 3))[0])
    got = np.asarray(servable.call(f, s, c))
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-5)

    # engine: extras pad/chunk with the frames (5 rows over max_batch 4 →
    # one full chunk + one padded chunk)
    eng = InferenceEngine(servable, max_batch=4)
    eng.warmup(H, W, 4, extra_specs=[((), np.float32), ((), np.int32)])
    acts = eng.infer(f, s, c)
    np.testing.assert_array_equal(acts, np.argmax(live, axis=-1))
    with pytest.raises(ValueError, match="rows"):
        eng.infer(f, s[:3], c)


def test_cil_servable_drives_closed_loop(tmp_path):
    """Deployment parity for the CIL family: the shipped multi-input artifact
    drives the rollout (speed + command extras) and matches the live
    as_policy_fn eval exactly."""
    from carla_imitation_learning_tpu.models import BranchedCILPolicy
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.serving import (
        export_cil_policy, load_policy, policy_fn_from_servable,
    )
    from carla_imitation_learning_tpu.sim import SimParams, make_town
    from carla_imitation_learning_tpu.training import closed_loop as cl

    model = BranchedCILPolicy(n_commands=6, dtype=jnp.float32)
    frames, speed, command = model.example_input(1, H, W)
    params = model.init(jax.random.PRNGKey(4), frames, speed, command)["params"]
    art = export_cil_policy(model, params, tmp_path / "cil", height=H,
                            width=W, platforms=("cpu",))
    servable_fn = policy_fn_from_servable(load_policy(art))

    town = make_town(blocks=2, n_buildings=4, n_lights=2, turn_fans=True)
    sim = SimParams(n_agents=2)
    rcfg = RenderConfig(H, W, max_triangles=256, backend="jax")
    live = cl.evaluate_policy(sim, town, rcfg, model.as_policy_fn(params),
                              jax.random.PRNGKey(5), n_envs=4, n_steps=30)
    shipped = cl.evaluate_policy(sim, town, rcfg, servable_fn,
                                 jax.random.PRNGKey(5), n_envs=4, n_steps=30)
    for k in ("driving_score", "route_completion", "mean_speed", "km_driven"):
        assert live[k] == pytest.approx(shipped[k], abs=1e-9), k
