"""Fast rollout rasterizer (ops/raster_fast.py) correctness.

Parity contract: rasterize_luma_fast == rasterize_pallas_luma's gray plane up
to 12-bit luma quantization + approx-reciprocal depth ordering. On CPU both
kernels run interpret=True; the compiled-kernel parity on real TPU is asserted
by bench.py::assert_kernel_parity before every timing run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_imitation_learning_tpu.ops.raster import rasterize_pallas_luma, tile_lists
from carla_imitation_learning_tpu.ops.raster_fast import (
    rasterize_luma_fast, tile_lists_fast,
)
from carla_imitation_learning_tpu.render import geometry as geo
from carla_imitation_learning_tpu.render.camera import (
    camera_from_ego, project_triangles,
)
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.sim import agents as agent_lib
from carla_imitation_learning_tpu.sim.world import reset_env

H = W = 64
TOWN = make_town(blocks=2, n_buildings=6, n_lights=2)
PARAMS = SimParams(n_agents=3)
STATIC = geo.build_static_scene(TOWN)


def make_setup(seed: int):
    st = reset_env(PARAMS, TOWN, jax.random.PRNGKey(seed))
    phases = agent_lib.light_phases(
        TOWN, st.t.astype(jnp.float32) * PARAMS.dt,
        PARAMS.light_green, PARAMS.light_yellow, PARAMS.light_red)
    ap, ay = agent_lib.agent_positions(TOWN, st.agents_route, st.agents_s)
    tris, colors, classes = geo.assemble_scene(
        STATIC, TOWN.lights_pos, phases, ap, ay, 256)
    cam = camera_from_ego(st.ego_pos, st.ego_yaw)
    return project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_matches_exact_luma(seed):
    setup = make_setup(seed)
    g_exact, _, _ = rasterize_pallas_luma(setup, H, W, interpret=True)
    g_fast = rasterize_luma_fast(setup, H, W, interpret=True)
    d = np.abs(np.asarray(g_exact) - np.asarray(g_fast))
    assert d.mean() < 2e-3, f"mean diff {d.mean()}"
    # small, isolated disagreements allowed: 12-bit luma + approx-recip depth
    assert (d > 2 / 255).mean() < 0.01, f"{(d > 2/255).mean():.3%} pixels off"


def test_corner_cull_sound_and_effective():
    """The corner cull must only drop triangles that cannot produce pixels
    (identical image), and it must actually shrink the per-band lists."""
    total_old = total_new = 0
    for seed in range(3):
        setup = make_setup(seed)
        _, c_old = tile_lists(setup, H, setup.zmin.shape[0], width=W)
        _, c_new = tile_lists_fast(setup, H, setup.zmin.shape[0], width=W)
        assert int((c_new <= c_old).all())
        total_old += int(c_old.sum())
        total_new += int(c_new.sum())
    assert total_new < total_old  # eye-crossing tris no longer hit every band


def test_cap_keeps_nearest():
    """max_tris_per_tile overflow must drop the FARTHEST triangles: the capped
    image may lose far detail but near geometry must be identical."""
    setup = make_setup(0)
    g_full = rasterize_luma_fast(setup, H, W, interpret=True)
    g_cap = rasterize_luma_fast(setup, H, W, interpret=True, max_tris_per_tile=64)
    # lower half of the image is near-field ground/road — must be unaffected
    d = np.abs(np.asarray(g_full[H // 2:]) - np.asarray(g_cap[H // 2:]))
    assert (d > 2 / 255).mean() < 0.02


def test_framebuf_resets_on_done():
    from carla_imitation_learning_tpu.training.closed_loop import update_framebuf

    B, fs = 3, 4
    # NHWC layout: (B, H, W, fs), frame index on the LAST axis
    old = jnp.arange(B * fs * 2 * 2, dtype=jnp.float32).reshape(B, 2, 2, fs)
    fresh = jnp.full((B, 2, 2), 99.0)
    just_reset = jnp.array([False, True, False])
    out = update_framebuf(old, fresh, just_reset)
    # env 1 reset: every slot holds ONLY the fresh view
    assert bool((out[1] == 99.0).all())
    # envs 0/2 slide: oldest dropped, newest appended, middle preserved
    np.testing.assert_allclose(np.asarray(out[0, ..., :-1]), np.asarray(old[0, ..., 1:]))
    assert bool((out[0, ..., -1] == 99.0).all())
    np.testing.assert_allclose(np.asarray(out[2, ..., :-1]), np.asarray(old[2, ..., 1:]))


def test_rollout_uses_reset_flag():
    """make_rollout's carry must thread the just-reset flag end to end."""
    from carla_imitation_learning_tpu.render.pipeline import RenderConfig
    from carla_imitation_learning_tpu.training.closed_loop import make_rollout

    rcfg = RenderConfig(32, 32, max_triangles=192, backend="jax")
    init_fn, rollout_fn = make_rollout(PARAMS, TOWN, rcfg, policy_fn=None)
    carry = init_fn(jax.random.PRNGKey(0), 4)
    assert len(carry) == 3 and carry[2].dtype == jnp.bool_
    carry, traj = rollout_fn(carry, 3)
    # the carried flag equals the last step's done mask
    np.testing.assert_array_equal(np.asarray(carry[2]),
                                  np.asarray(traj["done"][-1]).astype(bool))


def test_compact_setup_exact_when_under_cap():
    """Pre-compaction must be a no-op on the image whenever the live-triangle
    count fits the cap, and must drop only the FARTHEST on overflow."""
    from carla_imitation_learning_tpu.ops.raster_fast import compact_setup

    setup = make_setup(0)
    n_valid = int(np.asarray(setup.valid).sum())
    cap = n_valid + 8
    g_full = rasterize_luma_fast(setup, H, W, interpret=True)
    g_cmp = rasterize_luma_fast(setup, H, W, interpret=True, compact_cap=cap)
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_cmp))
    # compacted table keeps exactly the valid triangles, nearest-first
    small = compact_setup(setup, cap)
    assert int(np.asarray(small.valid).sum()) == n_valid
    z = np.asarray(small.zmin)[np.asarray(small.valid)]
    assert (np.diff(z) >= 0).all()
    # overflow: near-field (lower image half) survives
    g_over = rasterize_luma_fast(setup, H, W, interpret=True,
                                 compact_cap=max(16, n_valid // 2))
    d = np.abs(np.asarray(g_full[H // 2:]) - np.asarray(g_over[H // 2:]))
    assert (d > 2 / 255).mean() < 0.02


def test_lod_culls_subpixel_only():
    """lod_px drops only triangles whose projected bbox is subpixel both
    ways; rendered output stays near-identical (those tris could light at
    most ~a pixel)."""
    from carla_imitation_learning_tpu.ops.raster_fast import tile_lists_fast

    setup = make_setup(0)
    idx0, count0 = tile_lists_fast(setup, H, setup.valid.shape[0], width=W)
    idx1, count1 = tile_lists_fast(setup, H, setup.valid.shape[0], width=W,
                                   lod_px=1.0)
    assert int(count1.sum()) <= int(count0.sum())
    # every dropped triangle really is subpixel
    bbox = np.asarray(setup.bbox)
    wpx, hpx = bbox[:, 1] - bbox[:, 0], bbox[:, 3] - bbox[:, 2]
    in0 = {int(i) for r, c in zip(np.asarray(idx0), np.asarray(count0))
           for i in r[:int(c[0])]}
    in1 = {int(i) for r, c in zip(np.asarray(idx1), np.asarray(count1))
           for i in r[:int(c[0])]}
    for t in in0 - in1:
        assert wpx[t] < 1.0 and hpx[t] < 1.0, f"tri {t} not subpixel"
    g0 = rasterize_luma_fast(setup, H, W, interpret=True)
    g1 = rasterize_luma_fast(setup, H, W, interpret=True, lod_px=1.0)
    d = np.abs(np.asarray(g0) - np.asarray(g1))
    assert (d > 2 / 255).mean() < 0.005


def test_list_band_factor_identical_output():
    """Coarse shared band lists are conservative SUPERSETS per band — output
    must be pixel-identical to per-band lists at any factor."""
    setup = make_setup(1)
    g1 = rasterize_luma_fast(setup, H, W, interpret=True)
    g2 = rasterize_luma_fast(setup, H, W, interpret=True, list_band_factor=2)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


# --------------------------- quad-primitive path ---------------------------


def test_quad_fusion_rate_and_pass_reduction():
    """Every scene emitter produces planar quad pairs (geometry._quad /
    _box_tris convention), so a large majority of valid pairs must fuse and
    the per-band pass counts must drop materially vs the triangle kernel."""
    from carla_imitation_learning_tpu.ops.raster_fast import fuse_prims

    setup = make_setup(0)
    assert setup.pair_ok is not None and setup.zinv is not None
    ok = np.asarray(setup.pair_ok)
    both_valid = np.asarray(setup.valid[0::2] & setup.valid[1::2])
    assert ok[both_valid].mean() > 0.7, f"only {ok[both_valid].mean():.0%} fuse"

    prims = fuse_prims(setup)
    _, c_tri = tile_lists_fast(setup, H, setup.valid.shape[0], width=W)
    _, c_quad = tile_lists_fast(prims, H, prims.valid.shape[0], width=W)
    assert int(c_quad.sum()) < 0.7 * int(c_tri.sum()), (
        f"quad lists {int(c_quad.sum())} vs tri {int(c_tri.sum())}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quad_kernel_matches_triangle_kernel(seed):
    """quads=True vs quads=False on the same setup: identical coverage and
    luma; depth keys may round differently (affine 1/z vs approx-reciprocal
    z), so only quantization-scale isolated diffs are allowed."""
    setup = make_setup(seed)
    g_tri = rasterize_luma_fast(setup, H, W, interpret=True, quads=False)
    g_quad = rasterize_luma_fast(setup, H, W, interpret=True, quads=True)
    d = np.abs(np.asarray(g_tri) - np.asarray(g_quad))
    assert d.mean() < 1e-3, f"mean diff {d.mean()}"
    assert (d > 2 / 255).mean() < 0.005, f"{(d > 2/255).mean():.3%} pixels off"


def test_non_planar_pair_does_not_fuse():
    """Bending a quad pair out of plane must kill its fusion (conservative
    fallback to two triangle passes) and still render exactly."""
    import jax.numpy as jnp

    from carla_imitation_learning_tpu.render.camera import project_triangles

    st = reset_env(PARAMS, TOWN, jax.random.PRNGKey(0))
    phases = agent_lib.light_phases(
        TOWN, st.t.astype(jnp.float32) * PARAMS.dt,
        PARAMS.light_green, PARAMS.light_yellow, PARAMS.light_red)
    ap, ay = agent_lib.agent_positions(TOWN, st.agents_route, st.agents_s)
    tris, colors, classes = geo.assemble_scene(
        STATIC, TOWN.lights_pos, phases, ap, ay, 256)
    cam = camera_from_ego(st.ego_pos, st.ego_yaw)
    base = project_triangles(tris, colors, classes, cam, W, H, 90.0, 0.5)
    fusable = np.flatnonzero(np.asarray(base.pair_ok))
    assert fusable.size > 0
    p = int(fusable[0])
    # lift triangle 2p+1's third vertex (v3) 0.5 m out of the quad plane
    bent = tris.at[2 * p + 1, 2, 2].add(0.5)
    setup = project_triangles(bent, colors, classes, cam, W, H, 90.0, 0.5)
    assert not bool(setup.pair_ok[p])
    g_tri = rasterize_luma_fast(setup, H, W, interpret=True, quads=False)
    g_quad = rasterize_luma_fast(setup, H, W, interpret=True, quads=True)
    d = np.abs(np.asarray(g_tri) - np.asarray(g_quad))
    assert (d > 2 / 255).mean() < 0.005


def test_quad_path_with_cap_fog_lod():
    """The quad path must compose with compaction, fused fog, and LOD the
    same way the triangle path does."""
    setup = make_setup(1)
    for kw in (dict(compact_cap=128), dict(fog_density=0.02),
               dict(lod_px=1.0), dict(compact_cap=96, fog_density=0.01,
                                      lod_px=1.0, list_band_factor=2)):
        g_tri = rasterize_luma_fast(setup, H, W, interpret=True, quads=False,
                                    **kw)
        g_quad = rasterize_luma_fast(setup, H, W, interpret=True, quads=True,
                                     **kw)
        d = np.abs(np.asarray(g_tri) - np.asarray(g_quad))
        assert d.mean() < 2e-3, f"{kw}: mean {d.mean()}"
        assert (d > 2 / 255).mean() < 0.02, f"{kw}: {(d > 2/255).mean():.2%}"
