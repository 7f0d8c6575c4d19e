"""HTTP policy server tests: endpoint contract, both body encodings,
cross-request micro-batching, error paths (CPU; stdlib urllib client).

The served program is the exported StableHLO artifact — the same bytes a
production deployment ships — so action parity against the live model is
asserted through the full HTTP round trip.
"""

import base64
import concurrent.futures
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.models import PolicyCNN
from carla_imitation_learning_tpu.serving import PolicyServer, export_policy

H = W = 32


@pytest.fixture(scope="module")
def trained():
    model = PolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, H, W, 4)))["params"]
    return model, params


@pytest.fixture(scope="module")
def server(trained, tmp_path_factory):
    model, params = trained
    path = tmp_path_factory.mktemp("served") / "policy"
    export_policy(model, params, path, height=H, width=W,
                  platforms=("cpu",), extra_meta={"n_actions": 9})
    with PolicyServer(path, window_ms=20.0) as srv:
        yield srv


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url, data, headers):
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def _frames(b, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (b, H, W, 4),
                                                dtype=np.uint8)


def _live_actions(trained, frames):
    model, params = trained
    logits = model.apply({"params": params}, frames.astype(np.float32) / 255.0)
    return np.argmax(np.asarray(logits), axis=-1)


def test_health_and_metadata(server):
    assert _get(server.url + "/healthz") == {"status": "ok"}
    meta = _get(server.url + "/v1/metadata")
    assert meta["expected_hwc"] == [H, W, 4]
    assert meta["buckets"][-1] == server.engine.max_batch
    assert meta["meta"]["model"] == "PolicyCNN"


def test_infer_octet_stream_matches_live(server, trained):
    frames = _frames(5)
    out = _post(server.url + "/v1/infer", frames.tobytes(),
                {"Content-Type": "application/octet-stream",
                 "X-Shape": f"5,{H},{W},4"})
    np.testing.assert_array_equal(out["actions"],
                                  _live_actions(trained, frames))


def test_infer_json_base64_and_logits(server, trained):
    frames = _frames(3, seed=1)
    body = json.dumps({"frames": base64.b64encode(frames.tobytes()).decode(),
                       "shape": [3, H, W, 4]}).encode()
    out = _post(server.url + "/v1/logits", body,
                {"Content-Type": "application/json"})
    logits = np.asarray(out["logits"], np.float32)
    assert logits.shape == (3, 9)
    np.testing.assert_array_equal(np.argmax(logits, axis=-1),
                                  _live_actions(trained, frames))


def test_infer_json_nested_list(server):
    frames = _frames(2, seed=2)
    out = _post(server.url + "/v1/infer",
                json.dumps({"frames": frames.tolist()}).encode(),
                {"Content-Type": "application/json"})
    assert len(out["actions"]) == 2


def test_microbatch_coalesces_concurrent_requests(server, trained):
    """Concurrent small requests ride ONE engine call (fewer batches than
    requests), and every client still gets its own correct rows."""
    b0 = server._batcher.batches_total
    r0 = server._batcher.requests_total
    frames = [_frames(2, seed=10 + i) for i in range(6)]

    def call(f):
        return _post(server.url + "/v1/infer", f.tobytes(),
                     {"Content-Type": "application/octet-stream",
                      "X-Shape": f"2,{H},{W},4"})

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        outs = list(ex.map(call, frames))
    for f, out in zip(frames, outs):
        np.testing.assert_array_equal(out["actions"], _live_actions(trained, f))
    new_requests = server._batcher.requests_total - r0
    new_batches = server._batcher.batches_total - b0
    assert new_requests == 6
    assert new_batches < new_requests  # coalescing actually happened


def test_stats_counters(server):
    stats = _get(server.url + "/v1/stats")
    assert stats["requests_total"] >= 1
    assert stats["mean_coalesced_rows"] >= 1.0
    assert stats["engine"]["count"] >= 1


def test_bad_requests(server):
    # wrong shape vs artifact input
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.url + "/v1/infer", np.zeros((1, 8, 8, 4), np.uint8).tobytes(),
              {"Content-Type": "application/octet-stream", "X-Shape": "1,8,8,4"})
    assert e.value.code == 400
    # missing shape header
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.url + "/v1/infer", b"\x00" * 16,
              {"Content-Type": "application/octet-stream"})
    assert e.value.code == 400
    # byte count mismatch
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.url + "/v1/infer", b"\x00" * 16,
              {"Content-Type": "application/octet-stream",
               "X-Shape": f"1,{H},{W},4"})
    assert e.value.code == 400
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server.url + "/v1/nope")
    assert e.value.code == 404


def test_callable_policy_no_meta():
    """A bare callable serves too (no artifact metadata: shape checks off)."""

    def fn(frames):
        x = jnp.asarray(frames, jnp.float32)
        return jnp.stack([x.mean(axis=(1, 2, 3)),
                          -x.mean(axis=(1, 2, 3))], axis=-1)

    with PolicyServer(fn, max_batch=8, window_ms=1.0) as srv:
        frames = np.full((3, 4, 4, 1), 200, np.uint8)
        out = _post(srv.url + "/v1/infer", frames.tobytes(),
                    {"Content-Type": "application/octet-stream",
                     "X-Shape": "3,4,4,1"})
        assert out["actions"] == [0, 0, 0]
        with pytest.raises(RuntimeError):
            srv.warmup()


def test_continuous_artifact_serves_controls(tmp_path):
    """A continuous-family artifact serves its (steer, accel) floats from
    /v1/infer — no argmax — matching the live model."""
    from carla_imitation_learning_tpu.models import ContinuousPolicyCNN

    model = ContinuousPolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(9), jnp.zeros((1, H, W, 4)))["params"]
    path = tmp_path / "cont_policy"
    export_policy(model, params, path, height=H, width=W,
                  platforms=("cpu",), extra_meta={"family": "continuous"})
    with PolicyServer(path, window_ms=1.0) as srv:
        frames = _frames(3, seed=11)
        out = _post(srv.url + "/v1/infer", frames.tobytes(),
                    {"Content-Type": "application/octet-stream",
                     "X-Shape": f"3,{H},{W},4"})
        got = np.asarray(out["controls"], np.float32)
        assert got.shape == (3, 2)
        live = np.asarray(model.apply(
            {"params": params}, frames.astype(np.float32) / 255.0))
        np.testing.assert_allclose(got, live, atol=1e-4)
        assert np.abs(got).max() <= 1.0


def test_cil_artifact_serves_with_side_inputs(tmp_path):
    """A CIL artifact serves over HTTP with per-row (speed, command) side
    inputs — JSON fields or X-Speed/X-Command headers — and rejects requests
    that omit them."""
    from carla_imitation_learning_tpu.models import BranchedCILPolicy
    from carla_imitation_learning_tpu.serving import export_cil_policy

    model = BranchedCILPolicy(n_commands=4, dtype=jnp.float32)
    ef, es, ec = model.example_input(1, H, W)
    params = model.init(jax.random.PRNGKey(13), ef, es, ec)["params"]
    path = tmp_path / "cil_policy"
    export_cil_policy(model, params, path, height=H, width=W,
                      platforms=("cpu",))
    with PolicyServer(path, window_ms=1.0) as srv:
        srv.warmup()
        frames = _frames(3, seed=21)
        speed = [1.5, 0.0, 9.0]
        command = [0, 2, 1]
        live = np.argmax(np.asarray(model.apply(
            {"params": params}, frames.astype(np.float32) / 255.0,
            np.asarray(speed, np.float32),
            np.asarray(command, np.int32))[0]), axis=-1)
        # JSON body with side-input fields
        body = json.dumps({
            "frames": base64.b64encode(frames.tobytes()).decode(),
            "shape": [3, H, W, 4], "speed": speed, "command": command,
        }).encode()
        out = _post(srv.url + "/v1/infer", body,
                    {"Content-Type": "application/json"})
        np.testing.assert_array_equal(np.asarray(out["actions"]), live)
        # octet-stream with X-Speed / X-Command headers
        out2 = _post(srv.url + "/v1/infer", frames.tobytes(),
                     {"Content-Type": "application/octet-stream",
                      "X-Shape": f"3,{H},{W},4",
                      "X-Speed": "1.5,0.0,9.0", "X-Command": "0,2,1"})
        np.testing.assert_array_equal(np.asarray(out2["actions"]), live)
        # missing side inputs → 400, not a server error
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv.url + "/v1/infer", frames.tobytes(),
                  {"Content-Type": "application/octet-stream",
                   "X-Shape": f"3,{H},{W},4"})
        assert ei.value.code == 400
