"""Sharded framestore tests: manifest, episode-aligned cuts, two-level
shuffled reading, window provenance across shards."""

import json

import numpy as np
import pytest

from carla_imitation_learning_tpu.data.pipeline import FrameStore
from carla_imitation_learning_tpu.native import NATIVE_AVAILABLE
from carla_imitation_learning_tpu.native.sharded import (
    INDEX_NAME, ShardedFrameStore, ShardedPrefetchReader, _cut_points,
    save_sharded_framestore,
)

pytestmark = pytest.mark.skipif(not NATIVE_AVAILABLE,
                                reason="native framestore source missing")


def _identity_store(n=300, h=8, w=8, episode_len=60):
    """Frames whose pixel value encodes the frame index; labels = index % 9."""
    # value = idx % 252: fits uint8 AND 252 ≡ 0 (mod 9), so label math
    # (actions = idx % 9) stays consistent straight from the pixel value
    frames = np.broadcast_to(
        (np.arange(n) % 252).astype(np.uint8)[:, None, None], (n, h, w)).copy()
    starts = np.zeros(n, bool)
    starts[::episode_len] = True
    return FrameStore(
        frames=frames,
        actions=(np.arange(n) % 9).astype(np.int32),
        traffic=np.zeros(n, np.int32),
        sensors=np.zeros((n, 3), np.float32),
        commands=np.zeros(n, np.int32),
        starts=starts,
    )


def test_cut_points_align_to_starts():
    starts = np.zeros(300, bool)
    starts[::60] = True
    cuts, aligned = _cut_points(300, starts, target=100)
    assert cuts == [60, 120, 180, 240]  # last start ≤ each 100-multiple
    assert aligned
    # no starts → raw multiples, not aligned
    assert _cut_points(250, None, target=100) == ([100, 200], False)
    # fits in one shard → no cuts
    assert _cut_points(80, starts[:80], target=100) == ([], True)
    # an episode longer than the shard target forces a mid-episode cut —
    # the manifest must NOT claim alignment then
    one = np.zeros(300, bool)
    one[0] = True
    cuts, aligned = _cut_points(300, one, target=100)
    assert cuts == [100, 200] and not aligned


def test_save_and_manifest(tmp_path):
    store = _identity_store()
    out = save_sharded_framestore(tmp_path / "ds", store, shard_frames=100)
    manifest = json.loads((out / INDEX_NAME).read_text())
    assert manifest["n_frames"] == 300
    assert manifest["aligned_to_starts"] is True
    assert len(manifest["shards"]) == 5  # cuts at 60,120,180,240
    assert sum(s["n"] for s in manifest["shards"]) == 300
    sv = ShardedFrameStore(out)
    assert sv.n_shards == 5 and sv.height == 8 and sv.width == 8
    # every shard is a valid standalone framestore
    nfs = sv.open_shard(2)
    assert nfs.n == sv.shard_frames(2)
    np.testing.assert_array_equal(nfs.frames[0], store.frames[120])
    nfs.close()


def test_sharded_reader_covers_and_stays_in_shard(tmp_path):
    store = _identity_store()
    out = save_sharded_framestore(tmp_path / "ds", store, shard_frames=100)
    sv = ShardedFrameStore(out)
    reader = ShardedPrefetchReader(sv, batch=8, frame_skip=4, shuffle=True,
                                   seed=3)
    seen = 0
    for frames, labels in reader:
        assert frames.shape == (8, 4, 8, 8)
        # provenance: each window is 4 CONSECUTIVE frames (pixel == index%252)
        v = frames[:, :, 0, 0].astype(np.int64)
        diffs = (v[:, 1:] - v[:, :-1]) % 252
        assert (diffs == 1).all(), "window frames not consecutive"
        # label = action of frame start+frame_skip; actions are idx%9 and
        # 252 ≡ 0 (mod 9), so the pixel value alone determines the label
        idx0 = v[:, 0]
        assert (labels % 9 == (idx0 + 4) % 9).all()
        seen += 1
    assert seen == len(reader) > 0


def test_epochs_reshuffle_shard_order(tmp_path):
    store = _identity_store()
    out = save_sharded_framestore(tmp_path / "ds", store, shard_frames=100)
    sv = ShardedFrameStore(out)
    reader = ShardedPrefetchReader(sv, batch=8, frame_skip=4, shuffle=True,
                                   seed=0)

    def first_values(r):
        return [int(f[0, 0, 0, 0]) for f, _ in r]

    e1, e2 = first_values(reader), first_values(reader)
    assert len(e1) == len(e2)
    assert e1 != e2  # order (shards and windows) reshuffles between epochs


def test_bc_trains_from_shards(tmp_path):
    """End to end: shard a synthetic dataset, train a few BC steps from the
    sharded reader — the >RAM streaming surface."""
    import jax
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.models import PolicyCNN
    from carla_imitation_learning_tpu.training import (
        bc_loss_fn, create_train_state, make_optimizer,
    )
    from carla_imitation_learning_tpu.training.steps import make_train_step

    store = _identity_store(n=200, h=16, w=16, episode_len=50)
    out = save_sharded_framestore(tmp_path / "ds", store, shard_frames=64)
    reader = ShardedPrefetchReader(ShardedFrameStore(out), batch=16,
                                   frame_skip=4, shuffle=True)
    model = PolicyCNN()
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer({"LEARNING_RATE": 1e-3}, 1)
    state = create_train_state(model, rng, jnp.zeros((1, 16, 16, 4)), tx)
    step = make_train_step(bc_loss_fn, donate=False)
    n = 0
    for frames, labels in reader:
        x = jnp.transpose(jnp.asarray(frames), (0, 2, 3, 1)).astype(jnp.float32) / 255.0
        state, metrics = step(state, (x, jnp.asarray(labels)), rng)
        n += 1
        if n >= 6:
            break
    assert np.isfinite(float(metrics["loss"]))


def test_device_prefetch_preserves_order_and_content():
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.data.pipeline import device_prefetch

    batches = [(np.full((2, 2), i, np.uint8), np.full((2,), i, np.int32))
               for i in range(7)]
    out = list(device_prefetch(iter(batches), size=3))
    assert len(out) == 7
    for i, (f, l) in enumerate(out):
        assert isinstance(f, jnp.ndarray)  # landed on device
        assert int(f[0, 0]) == i and int(l[0]) == i  # order + content kept

    # with a host-side transform applied before the put
    out2 = list(device_prefetch(iter(batches), size=2,
                                transform=lambda b: (b[0].T, b[1] + 1)))
    assert int(out2[3][1][0]) == 4


def test_native_reader_respects_episode_boundaries(tmp_path):
    """v2 framestores carry the starts bitmap; the C++ reader must never
    yield a window that crosses a reset — the round-2 review finding on the
    streaming tier (bc_streaming previously blended episodes)."""
    from carla_imitation_learning_tpu.native import (
        NativeFrameStore, PrefetchReader, save_framestore,
    )

    # episode_len=28 divides 252, so (pixel value % 28) == (true index % 28)
    store = _identity_store(n=252, h=8, w=8, episode_len=28)
    path = tmp_path / "v2.tpuilfs"
    save_framestore(path, store)
    nfs = NativeFrameStore(path)
    st = nfs.starts
    assert st is not None and st.sum() == 9  # bitmap survived the round trip
    # 9 episodes x 4 invalid starts each (i ≡ 24..27 mod 28), minus the last
    # episode's tail that has no window anyway
    expect_valid = (252 - 4) - 8 * 4
    assert nfs.n_valid_windows(4) == expect_valid

    reader = PrefetchReader(nfs, batch=8, frame_skip=4, shuffle=True, seed=1)
    assert len(reader) == expect_valid // 8
    seen = 0
    for frames, labels in reader:
        idx0 = frames[:, 0, 0, 0].astype(np.int64) % 28
        assert (idx0 <= 23).all(), "window crosses an episode boundary"
        seen += 1
    assert seen == len(reader) > 0
    nfs.close()


def test_legacy_v1_files_still_open(tmp_path):
    """TPUILFS1 files (round-1 artifacts, no starts section) stay readable:
    every window valid."""
    from carla_imitation_learning_tpu.native import NativeFrameStore

    store = _identity_store(n=64, h=8, w=8, episode_len=64)
    path = tmp_path / "v1.tpuilfs"
    frames = np.ascontiguousarray(store.frames, np.uint8)
    with open(path, "wb") as f:
        f.write(np.array([0x3153464C49555054, 64, 8, 8], np.int64).tobytes())
        f.write(frames.tobytes())
        f.write(store.actions.astype(np.int32).tobytes())
        f.write(store.traffic.astype(np.int32).tobytes())
        f.write(store.sensors.astype(np.float32).tobytes())
        f.write(np.zeros(64, np.int32).tobytes())
    nfs = NativeFrameStore(path)
    assert nfs.starts is None
    assert nfs.n_valid_windows(4) == 60
    np.testing.assert_array_equal(nfs.frames[5], frames[5])
    nfs.close()


def test_device_shard_streamer_windows_and_labels(tmp_path):
    """Direct framestore→device tier: every yielded window is 4 consecutive
    in-episode frames with the right label, and an epoch covers exactly the
    boundary-masked window set (same rule as DeviceDataset)."""
    from carla_imitation_learning_tpu.native.sharded import DeviceShardStreamer

    store = _identity_store(n=300, episode_len=60)
    out = save_sharded_framestore(tmp_path / "shards", store, shard_frames=100)
    ds = DeviceShardStreamer(out, batch=8, frame_skip=4, shuffle=True, seed=3,
                             drop_last=False)
    seen = []
    for x, y in ds:
        v = np.asarray(np.round(np.asarray(x)[:, 0, 0, :] * 255)).astype(int)
        np.testing.assert_array_equal(v[:, 1], (v[:, 0] + 1) % 252)
        np.testing.assert_array_equal(v[:, 3], (v[:, 0] + 3) % 252)
        np.testing.assert_array_equal(np.asarray(y), (v[:, 0] + 4) % 9)
        seen.extend(((v[:, 0]) % 60).tolist())  # in-episode offsets
    # no window starts within 4 of an episode end (episode-aligned cuts →
    # five single-episode 60-frame shards; windows+label stay inside)
    assert max(seen) <= 55
    assert len(seen) == 5 * (60 - 4)


def test_device_shard_streamer_single_file(tmp_path):
    from carla_imitation_learning_tpu.native import save_framestore
    from carla_imitation_learning_tpu.native.sharded import DeviceShardStreamer

    store = _identity_store(n=80, episode_len=40)
    p = save_framestore(tmp_path / "one.tpuilfs", store)
    ds = DeviceShardStreamer(p, batch=4, frame_skip=4, shuffle=False)
    n = sum(x.shape[0] for x, _ in ds)
    assert n == len(ds) * 4


def test_bc_streaming_direct_tier_trains(tmp_path):
    """The bc_streaming experiment's default (direct) tier runs end-to-end
    and matches the host tier's loss scale."""
    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import bc_streaming

    cfg = compose("config", overrides=[
        "model=imitation", "sim.n_agents=2", "sim.town.blocks=2",
        "sim.town.n_buildings=4", "sim.n_lights=2", "render.height=32",
        "render.width=32", "render.max_triangles=192", "render.backend=jax",
        "BATCH_SIZE=8", "compute_dtype=float32",
        f"data_dir={tmp_path}/data", f"log_dir={tmp_path}/logs",
    ])
    r = bc_streaming(cfg, n_envs=2, n_steps=40, epochs=1, tier="direct")
    assert r["tier"] == "direct"
    assert np.isfinite(r["final_loss"])
    r2 = bc_streaming(cfg, n_envs=2, n_steps=40, epochs=1, tier="host")
    assert np.isfinite(r2["final_loss"])
