"""Data-parallel serving over a device mesh (8-virtual-device CPU): padded
buckets shard over the mesh's leading axis, results exactly match unsharded
serving, and the ladder rounds up so every bucket splits evenly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from carla_imitation_learning_tpu.models import PolicyCNN
from carla_imitation_learning_tpu.serving import (
    InferenceEngine,
    PolicyServer,
    export_policy,
    load_policy,
)

H = W = 32


@pytest.fixture(scope="module")
def servable(tmp_path_factory):
    model = PolicyCNN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(11), jnp.zeros((1, H, W, 4)))["params"]
    path = tmp_path_factory.mktemp("shserve") / "policy"
    export_policy(model, params, path, height=H, width=W, platforms=("cpu",))
    return load_policy(path)


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return Mesh(np.array(eight_devices), ("data",))


def test_bucket_ladder_rounds_to_mesh_multiples(servable, mesh):
    eng = InferenceEngine(servable, max_batch=64, mesh=mesh)
    assert all(b % mesh.size == 0 for b in eng.buckets)
    assert eng.buckets[0] == mesh.size
    # an explicit non-multiple ladder is rounded, not rejected
    eng2 = InferenceEngine(servable, buckets=(3, 20), mesh=mesh)
    assert eng2.buckets == (8, 24)


def test_sharded_matches_unsharded(servable, mesh):
    plain = InferenceEngine(servable, max_batch=32)
    sharded = InferenceEngine(servable, max_batch=32, mesh=mesh)
    rng = np.random.default_rng(0)
    for b in (1, 8, 13, 32):
        frames = rng.integers(0, 256, (b, H, W, 4), dtype=np.uint8)
        np.testing.assert_allclose(sharded.infer_logits(frames),
                                   plain.infer_logits(frames),
                                   rtol=1e-5, atol=1e-6)


def test_output_actually_shards_across_devices(servable, mesh):
    eng = InferenceEngine(servable, max_batch=32, mesh=mesh)
    out = eng._fn(np.zeros((32, H, W, 4), np.uint8))
    assert len(out.sharding.device_set) == mesh.size


def test_http_server_over_mesh(servable, mesh):
    import json
    import urllib.request

    with PolicyServer(servable, max_batch=16, window_ms=1.0,
                      mesh=mesh) as srv:
        frames = np.random.default_rng(1).integers(
            0, 256, (5, H, W, 4), dtype=np.uint8)
        req = urllib.request.Request(
            srv.url + "/v1/infer", data=frames.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": f"5,{H},{W},4"}, method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=60).read())
        want = np.argmax(np.asarray(servable.call(frames)), axis=-1)
        np.testing.assert_array_equal(out["actions"], want)
