"""Pallas TPU tile rasterizer.

Kernel design (see pallas guide: VPU is 8×128):
- grid = image tile rows; each program rasterizes a (TILE_ROWS, W) pixel tile
  held in VMEM, with a per-tile z-buffer in VMEM scratch.
- per-triangle coefficients (edge rows, depth numerator, color, class, zmin —
  17 floats) are packed into one (T, 16) SMEM-resident table; the per-triangle
  loop reads *scalars* from SMEM (what SMEM is for) and evaluates edge
  functions as (TILE_ROWS, W) vector FMAs on the VPU.
- **tile compaction**: XLA precomputes, per tile row, the index list of
  triangles whose screen bbox intersects that row band, nearest-first. The
  kernel's fori_loop runs only over that list (dynamic trip count), so empty
  sky tiles cost ~nothing and ground tiles touch only local geometry.
  ``max_tris_per_tile`` bounds the list; overflow drops the FARTHEST
  triangles (nearest-first ordering makes this visually safe).
- the whole image batch is vmapped over the kernel (pallas lifts vmap into an
  extra grid dimension), so one launch renders the fleet.

Outputs match render.jax_raster.rasterize_jax exactly (same math, same
sky/shading applied outside the kernel) whenever no triangles overflow
``max_tris_per_tile``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from carla_imitation_learning_tpu.render.camera import TriangleSetup
from carla_imitation_learning_tpu.render.jax_raster import SKY_HORIZON, SKY_TOP

# 16-row tiles: re-measured after the coefficient-major SMEM tables — wider
# bands now win (−1.7 ms/fleet-step vs 8; 32 regresses). The earlier "8 is
# best" result was an artifact of padded (T, K) table staging per program.
import os as _os

# band height in pixel rows; 32 measured best at 128² in round 3 (the round-2
# optimum of 16 flipped once band lists and the sim became cheap —
# PERFORMANCE.md log). Clamped to the image height per call. Env override for
# A/B sweeps only — not a user knob.
TILE_ROWS = int(_os.environ.get("TPUIL_TILE_ROWS", 32))


def band_rows(height: int, cap: int | None = None) -> int:
    """Largest divisor of ``height`` that is ≤ TILE_ROWS (or ``cap``).

    A bare ``min(TILE_ROWS, height)`` breaks heights that are multiples of
    16 but not 32 (48, 80, 112, ...) — the band grid requires rows | height.
    """
    rows = min(cap or TILE_ROWS, height)
    while height % rows:
        rows -= 1
    return rows
PACK_WIDTH = 17  # 9 edge + 3 znum + 3 rgb + 1 class + 1 zmin
TEX_PACK_WIDTH = PACK_WIDTH + 6  # + 3 unum + 3 vnum (procedural textures)


LUMA_W = jnp.asarray([0.299, 0.587, 0.114])  # reference imitation_dataset.py:121


def pack_setup(setup: TriangleSetup, luma_only: bool = False) -> jnp.ndarray:
    """TriangleSetup → (17, T) f32 COEFFICIENT-major table. Invalid triangles
    get all-zero columns (zero edges never pass the strict-sign inside test).
    With ``luma_only`` the color slots carry the precomputed luminance (policy
    rollouts need only the grayscale channel — the inner loop then writes 1
    plane, not 3).

    Coefficient-major because SMEM blocks pad their LAST dim to 128 lanes: a
    (T, 17) table stages T×128 floats per program (×2 buffers — 0.5 MB of
    hidden traffic at T=512); (17, T) stages 17×T (measured: −22% fleet step
    time on the rollout kernel, ops/raster_fast.py applies the same layout)."""
    colors = setup.colors
    if luma_only:
        luma = colors @ LUMA_W
        colors = jnp.stack([luma, luma, luma], axis=-1)
    parts = [
        setup.edges.reshape(setup.edges.shape[0], 9),
        setup.znum,
        colors,
        setup.classes[:, None].astype(jnp.float32),
        setup.zmin[:, None],
    ]
    if setup.unum is not None:  # procedural-texture UV rows (ops/texture.py)
        parts += [setup.unum, setup.vnum]
    flat = jnp.concatenate(parts, axis=-1)
    return jnp.where(setup.valid[:, None], flat, 0.0).T


def tile_lists(setup: TriangleSetup, height: int, k: int, width: int | None = None,
               far: float = 300.0, rows_per_band: int | None = None):
    """Per tile row: nearest-first indices of intersecting triangles.

    → (idx (R, k) int32, count (R, 1) int32). Pure XLA (vectorized compare +
    one small argsort per row) — runs fused ahead of the kernel launch.
    Screen-x and far-plane culls apply globally (the bands span full width).
    """
    rows = rows_per_band or band_rows(height)
    n_rows = height // rows
    xmin, xmax = setup.bbox[:, 0], setup.bbox[:, 1]
    ymin, ymax = setup.bbox[:, 2], setup.bbox[:, 3]
    onscreen = setup.valid & (setup.zmin < far)
    if width is not None:
        onscreen &= (xmax >= 0.0) & (xmin <= width)
    row_lo = (jnp.arange(n_rows, dtype=jnp.float32) * rows)[:, None]
    row_hi = row_lo + rows
    hit = (ymax[None, :] >= row_lo) & (ymin[None, :] <= row_hi) & onscreen[None, :]
    count = jnp.minimum(hit.sum(axis=1), k).astype(jnp.int32)[:, None]
    # nearest-first ordering: hits sort ahead of misses, and overflow beyond k
    # drops the FARTHEST triangles. (A cumsum-scatter compaction was measured
    # 1.8× slower end-to-end on v5e — TPU scatters serialize; sort stays.)
    score = jnp.where(hit, setup.zmin[None, :], jnp.inf)
    idx = jnp.argsort(score, axis=1)[:, :k].astype(jnp.int32)
    return idx, count


def _raster_kernel(tris_ref, idx_ref, count_ref, sem_ref, rgb_ref, depth_ref,
                   zbuf, *, width, near, far, n_channels=3,
                   tile_rows=TILE_ROWS, textures=False):
    r = pl.program_id(0)
    y0 = (r * tile_rows).astype(jnp.float32)

    # tpu.iota must be integer-typed; cast to f32 afterwards
    py = y0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, width), 0).astype(jnp.float32) + 0.5
    px = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, width), 1).astype(jnp.float32) + 0.5

    zbuf[:] = jnp.full((tile_rows, width), far, jnp.float32)
    sem_ref[:] = jnp.zeros((tile_rows, width), jnp.int32)  # sky
    rgb_ref[:] = jnp.zeros((n_channels, tile_rows, width), jnp.float32)

    def tri_pass(t):
        e0 = tris_ref[0, t] * px + tris_ref[1, t] * py + tris_ref[2, t]
        e1 = tris_ref[3, t] * px + tris_ref[4, t] * py + tris_ref[5, t]
        e2 = tris_ref[6, t] * px + tris_ref[7, t] * py + tris_ref[8, t]
        inside = jnp.logical_or(
            jnp.logical_and(jnp.logical_and(e0 > 0, e1 > 0), e2 > 0),
            jnp.logical_and(jnp.logical_and(e0 < 0, e1 < 0), e2 < 0),
        )
        den = e0 + e1 + e2
        den = jnp.where(den == 0.0, 1e-9, den)
        z = (tris_ref[9, t] * px + tris_ref[10, t] * py + tris_ref[11, t]) / den
        ok = jnp.logical_and(inside, jnp.logical_and(z > near, z < zbuf[:]))
        zbuf[:] = jnp.where(ok, z, zbuf[:])
        sem_ref[:] = jnp.where(ok, jnp.int32(tris_ref[15, t]), sem_ref[:])
        fac = 1.0
        if textures:
            # perspective-correct surface UV → procedural factor; the SAME
            # texture_factor the XLA reference calls (ops/texture.py), with
            # the same expression structure — textured backends stay
            # pixel-exact with each other
            from carla_imitation_learning_tpu.ops.texture import texture_factor

            u = (tris_ref[17, t] * px + tris_ref[18, t] * py
                 + tris_ref[19, t]) / den
            v = (tris_ref[20, t] * px + tris_ref[21, t] * py
                 + tris_ref[22, t]) / den
            fac = texture_factor(u, v, jnp.int32(tris_ref[15, t]))
        for c in range(n_channels):
            rgb_ref[c] = jnp.where(ok, tris_ref[12 + c, t] * fac
                                   if textures else tris_ref[12 + c, t],
                                   rgb_ref[c])

    # NOTE: an occlusion early-out (while_loop breaking once max(zbuf) <
    # next zmin on the nearest-first list) was measured 1.2-2.8x SLOWER here:
    # tiles span wide depth ranges (and sky pixels pin zbuf at far), so the
    # break rarely fires while its scalar reduction serializes the loop.
    def body(k, _):
        tri_pass(idx_ref[r, k])
        return 0

    jax.lax.fori_loop(0, count_ref[r, 0], body, 0)
    depth_ref[:] = zbuf[:]


@functools.partial(jax.jit, static_argnames=("height", "width", "near", "far",
                                             "interpret", "max_tris_per_tile"))
def rasterize_pallas(
    setup: TriangleSetup,
    height: int,
    width: int,
    near: float = 0.5,
    far: float = 300.0,
    interpret: bool = False,
    max_tris_per_tile: int | None = None,
):
    """→ (rgb (H,W,3), sem (H,W) i32, depth (H,W)) — jax_raster-compatible."""
    rgb_p, sem, depth = _rasterize_core(setup, height, width, near, far,
                                        interpret, max_tris_per_tile, 3,
                                        luma_only=False)
    rgb = jnp.transpose(rgb_p, (1, 2, 0))
    # same post-pass as jax_raster: sky background + distance shading
    hit = depth < far
    t = (jnp.arange(height, dtype=jnp.float32) / max(height - 1, 1))[:, None, None]
    sky = SKY_TOP * (1 - t) + SKY_HORIZON * t
    rgb = jnp.where(hit[..., None], rgb, sky)
    shade = jnp.where(hit, 1.0 / (1.0 + 0.004 * depth), 1.0)
    return rgb * shade[..., None], sem, depth


@functools.partial(jax.jit, static_argnames=("height", "width", "near", "far",
                                             "interpret", "max_tris_per_tile"))
def rasterize_pallas_luma(
    setup: TriangleSetup,
    height: int,
    width: int,
    near: float = 0.5,
    far: float = 300.0,
    interpret: bool = False,
    max_tris_per_tile: int | None = None,
):
    """Grayscale fast path: → (gray (H,W), sem (H,W) i32, depth (H,W)).

    gray equals luminance(rgb) of the full path bit-for-bit up to fp rounding
    (luma is pre-dotted per triangle; sky/shade applied to the scalar)."""
    luma_p, sem, depth = _rasterize_core(setup, height, width, near, far,
                                         interpret, max_tris_per_tile, 1,
                                         luma_only=True)
    gray = luma_p[0]
    hit = depth < far
    t = (jnp.arange(height, dtype=jnp.float32) / max(height - 1, 1))[:, None]
    sky_luma = (SKY_TOP @ LUMA_W) * (1 - t) + (SKY_HORIZON @ LUMA_W) * t
    gray = jnp.where(hit, gray, sky_luma)
    shade = jnp.where(hit, 1.0 / (1.0 + 0.004 * depth), 1.0)
    return gray * shade, sem, depth


def _rasterize_core(setup, height, width, near, far, interpret,
                    max_tris_per_tile, n_channels, luma_only):
    textures = setup.unum is not None
    tris = pack_setup(setup, luma_only=luma_only)
    n_tris = tris.shape[1]  # (17 or 23, T) coefficient-major table
    k = n_tris if max_tris_per_tile is None else min(max_tris_per_tile, n_tris)
    rows = band_rows(height)
    idx, count = tile_lists(setup, height, k, width=width, far=far,
                            rows_per_band=rows)
    assert height % rows == 0, f"height {height} % {rows} != 0"
    n_rows = height // rows
    grid = (n_rows,)

    kernel = functools.partial(_raster_kernel, width=width, near=near, far=far,
                               n_channels=n_channels, tile_rows=rows,
                               textures=textures)
    sem, chan_p, depth = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TEX_PACK_WIDTH if textures else PACK_WIDTH, n_tris),
                         lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, k), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, 1), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, width), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_channels, rows, width), lambda r: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, width), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((height, width), jnp.int32),
            jax.ShapeDtypeStruct((n_channels, height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rows, width), jnp.float32)],
        interpret=interpret,
    )(tris, idx, count)
    return chan_p, sem, depth
