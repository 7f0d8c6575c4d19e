"""Fast grayscale Pallas rasterizer for policy rollouts.

Same tile-loop skeleton as ops/raster.py (per-band SMEM triangle lists,
dynamic trip count) but restructured to cut the per-triangle-pass work from
~35 VPU ops to ~24 and the number of passes by exact band culling:

- **Packed z|luma key**: each candidate packs its depth (top 20 bits of the
  f32 bit pattern — positive floats compare correctly as int32) and a 12-bit
  quantized luminance into one int32; visibility is a single running ``min``.
  This removes the z-buffer scratch, the semantic plane, and two of the three
  select chains of the exact kernel.
- **Approximate-reciprocal depth** (``pl.reciprocal(approx=True)``): the
  perspective divide is the most expensive VPU op in the loop; rollout
  rendering tolerates ~2^-12 relative depth error (depth is quantized to 11
  mantissa bits by the key packing anyway).
- **min-only inside test**: edge rows are sign-normalized at projection time
  (render/camera.py scales by sign(det)), so inside ⇔ ``min3 > 0`` — 5 ops
  instead of 11 for the sign-agreement test.
- **Exact corner culling in the tile lists** (``tile_lists_fast``): edge
  functions are affine, so their extrema over a band rectangle sit at its
  corners. A band can be skipped when one edge is strictly positive over the
  whole rect while another is strictly negative — no pixel can then pass the
  same-sign test. This matters because triangles with a vertex behind the eye
  get a conservative full-screen bbox (render/camera.py:109-118) and would
  otherwise enter EVERY band's list.

Outputs only the grayscale plane (the policy observation,
imitation_dataset.py:115-122 contract). Accuracy vs the exact kernel:
12-bit luma quantization + approx-reciprocal depth ordering — validated by
tests/test_raster_fast.py. Exact paths (RGB, semantic, parity) stay on
ops/raster.py.

Reference note: this renderer implements the camera-frame generation the
reference system outsourced to CARLA's C++ server (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flax import struct

from carla_imitation_learning_tpu.ops.raster import LUMA_W, TILE_ROWS, band_rows
from carla_imitation_learning_tpu.render.camera import TriangleSetup
from carla_imitation_learning_tpu.render.jax_raster import SKY_HORIZON, SKY_TOP

import os as _os

LUMA_BITS = 12
LUMA_MASK = (1 << LUMA_BITS) - 1
KEY_MASK = ~LUMA_MASK  # keeps sign+exponent+11 mantissa bits of the f32 depth
MISS_KEY = np.int32(0x7FFFFFFF)
FAST_PACK_WIDTH = 13   # 9 edge + 3 znum + 1 luma key
# Triangle passes per loop body (packed-key candidates are independent until
# the final min, so unrolled passes' latency chains overlap). Env override
# for A/B sweeps only — not a user knob.
FAST_UNROLL = int(_os.environ.get("TPUIL_FAST_UNROLL", 2))


def _pack_key_const(z: float) -> int:
    """Static int32 key for a positive depth (luma bits zero)."""
    return int(np.float32(z).view(np.int32)) & KEY_MASK


def pack_setup_fast(setup: TriangleSetup) -> jnp.ndarray:
    """TriangleSetup → (13, T) f32 SMEM table: edge rows, znum row, and the
    12-bit quantized luminance (stored as a float; the kernel converts the
    scalar). Invalid triangles get all-zero rows (never pass the inside test).

    COEFFICIENT-major (13, T), not triangle-major (T, 13): SMEM blocks pad
    their last dim to 128 lanes, so (T, 13) stages T×128 floats (×2 buffers —
    1 MB at T=1024, over the SMEM budget) while (13, T) pads nothing for the
    usual power-of-two tables and stages 13×T.
    """
    luma = setup.colors @ LUMA_W
    lum_q = jnp.clip(jnp.round(luma * LUMA_MASK), 0, LUMA_MASK)
    flat = jnp.concatenate([
        setup.edges.reshape(setup.edges.shape[0], 9),
        setup.znum,
        lum_q[:, None],
    ], axis=-1)
    return jnp.where(setup.valid[:, None], flat, 0.0).T


def compact_setup(setup: TriangleSetup, cap: int) -> TriangleSetup:
    """Gather the valid triangles (nearest-first) into a ``cap``-row setup.

    After backface culling, typically <25% of the padded triangle table is
    live; every downstream cost — the per-band compaction sorts, the corner
    -cull math, and the SMEM table — scales with the table size, so one
    up-front argsort over the full table buys a ~(T/cap)× cut in all of them.
    Overflow (more than ``cap`` valid triangles) drops the FARTHEST ones, the
    same graceful degradation as the per-band ``max_tris_per_tile`` cap."""
    order = jnp.argsort(jnp.where(setup.valid, setup.zmin, jnp.inf))[:cap]
    take = lambda a: jnp.take(a, order, axis=0)  # noqa: E731
    return TriangleSetup(
        edges=take(setup.edges), znum=take(setup.znum),
        colors=take(setup.colors), classes=take(setup.classes),
        valid=take(setup.valid), bbox=take(setup.bbox), zmin=take(setup.zmin))


def tile_lists_fast(setup: TriangleSetup, height: int, k: int, width: int,
                    far: float = 300.0, lod_px: float = 0.0,
                    rows_per_band: int = TILE_ROWS):
    """Per tile row band: nearest-first indices of triangles that can actually
    cover a pixel in the band.

    Beyond the bbox test of ops/raster.tile_lists, adds the exact corner cull:
    for the band rect [0,W]×[ylo,yhi], each affine edge function attains its
    extrema at rect corners. Edges are sign-normalized (camera.py: inside ⇔
    all e_i > 0), so the triangle is dropped from the band whenever ANY edge
    is strictly negative over the whole rect — a stronger and cheaper test
    than the sign-agreement form. → (idx (R,k) i32, count (R,1)).
    """
    n_rows = height // rows_per_band
    xmin, xmax = setup.bbox[:, 0], setup.bbox[:, 1]
    ymin, ymax = setup.bbox[:, 2], setup.bbox[:, 3]
    onscreen = setup.valid & (setup.zmin < far)
    onscreen &= (xmax >= 0.0) & (xmin <= width)
    if lod_px > 0.0:
        # scene LOD: drop triangles whose whole projected bbox is under
        # lod_px pixels in BOTH dims (distant facade-band slivers etc.) —
        # they can light at most ~1 pixel yet cost a full pass in every band
        # their (conservative) bbox touches
        onscreen &= (xmax - xmin >= lod_px) | (ymax - ymin >= lod_px)
    row_lo = (jnp.arange(n_rows, dtype=jnp.float32) * rows_per_band)[:, None]
    row_hi = row_lo + rows_per_band
    hit = (ymax[None, :] >= row_lo) & (ymin[None, :] <= row_hi) & onscreen[None, :]

    # corner cull: e(x,y) = a·x + b·y + c over x∈[0,W], y∈[ylo,yhi]
    a = setup.edges[..., 0]  # (T, 3)
    b = setup.edges[..., 1]
    c = setup.edges[..., 2]
    ax_max = jnp.maximum(a * width, 0.0)[None]          # (1, T, 3)
    # (R, 1, 1) band y extents against (1, T, 3) coefficients
    ylo = row_lo[:, :, None]                            # (R, 1, 1)
    yhi = row_hi[:, :, None]
    by_max = jnp.maximum(b[None] * ylo, b[None] * yhi)  # (R, T, 3)
    emax = ax_max + by_max + c[None]
    hit &= ~jnp.any(emax < 0.0, axis=-1)                # (R, T)

    count = jnp.minimum(hit.sum(axis=1), k).astype(jnp.int32)[:, None]
    # Compaction: the packed-key min in the kernel is order-independent, so
    # hits only need to be *grouped*, not sorted nearest-first. One u32 sort
    # of (miss-flag << 16 | index) is ~2× cheaper than the f32-key argsort
    # (no payload lanes). Nearest-first only matters for cap overflow, where
    # zmin rank (a single shared per-image argsort) substitutes when capped.
    n_tris = hit.shape[1]
    if k < n_tris:
        rank = jnp.argsort(jnp.argsort(setup.zmin)).astype(jnp.uint32)
        packed = jnp.where(hit, rank[None, :] << 16, jnp.uint32(0xFFFF0000))
        packed = packed | jax.lax.broadcasted_iota(jnp.uint32, hit.shape, 1)
        idx = (jnp.sort(packed, axis=1)[:, :k] & 0xFFFF).astype(jnp.int32)
    else:
        packed = jnp.where(hit, jnp.uint32(0), jnp.uint32(0x80000000))
        packed = packed | jax.lax.broadcasted_iota(jnp.uint32, hit.shape, 1)
        idx = (jnp.sort(packed, axis=1) & 0xFFFF).astype(jnp.int32)
    return idx, count


# ---------------------------------------------------------------------------
# Quad-primitive path: every scene emitter (render/geometry.py) produces
# planar convex quads split as (v0,v1,v2)+(v0,v2,v3) at even/odd indices.
# Fusing such a pair back into ONE 4-edge primitive halves the pass count
# (and the scalar SMEM loads) for quad geometry, and because 1/z is screen
# -AFFINE per plane (camera.py: 1/z = den/det), the fused pass needs no
# perspective divide at all — depth is one more affine row and the single
# per-pixel reciprocal moves to the band epilogue.
#
# Per-pass cost: 5 affine evals (4 edges + 1/z) + 3 mins vs the triangle
# kernel's 4 affine evals + reciprocal + mul, per TWO triangles covered.
# Scalar SMEM loads: 16 per quad vs 26 for the two triangle passes.
# ---------------------------------------------------------------------------

PRIM_PACK_WIDTH = 16  # 12 edge + 3 zinv + 1 luma rows


class PrimSetup(struct.PyTreeNode):
    """4-edge primitive table: fused quads + unfused triangles (duplicated
    4th edge row). Field names/shapes line up with TriangleSetup where
    tile_lists_fast reads them (edges[..., i], valid, bbox, zmin)."""

    edges: jnp.ndarray  # (P, 4, 3) sign-normalized border rows
    zinv: jnp.ndarray   # (P, 3) affine 1/z row (per plane)
    luma: jnp.ndarray   # (P,) 12-bit-quantized luminance (stored as f32)
    valid: jnp.ndarray  # (P,) bool
    bbox: jnp.ndarray   # (P, 4)
    zmin: jnp.ndarray   # (P,)


def fuse_prims(setup: TriangleSetup) -> PrimSetup:
    """TriangleSetup (with pair_ok from project_triangles) → PrimSetup.

    Slot layout keeps the table size T: slot 2i holds the fused quad (pair
    fusable) or triangle 2i; slot 2i+1 holds triangle 2i+1 or is invalidated.
    The quad's border rows come straight from the two triangles' edge rows:
    quad(v0,v1,v2,v3) border = {cross(v0,v1)=t0.E2, cross(v1,v2)=t0.E0,
    cross(v2,v3)=t1.E0, cross(v3,v0)=t1.E1}."""
    T = setup.edges.shape[0]
    E = setup.edges.reshape(T // 2, 2, 3, 3)
    ok = setup.pair_ok
    quad_edges = jnp.stack(
        [E[:, 0, 2], E[:, 0, 0], E[:, 1, 0], E[:, 1, 1]], axis=1)
    tri0 = jnp.concatenate([E[:, 0], E[:, 0, :1]], axis=1)  # dup 4th row
    tri1 = jnp.concatenate([E[:, 1], E[:, 1, :1]], axis=1)
    even_edges = jnp.where(ok[:, None, None], quad_edges, tri0)

    v0, v1 = setup.valid[0::2], setup.valid[1::2]
    even_valid = jnp.where(ok, v0 & v1, v0)
    odd_valid = v1 & ~ok

    b0, b1 = setup.bbox[0::2], setup.bbox[1::2]
    union = jnp.stack([jnp.minimum(b0[:, 0], b1[:, 0]),
                       jnp.maximum(b0[:, 1], b1[:, 1]),
                       jnp.minimum(b0[:, 2], b1[:, 2]),
                       jnp.maximum(b0[:, 3], b1[:, 3])], axis=-1)
    even_bbox = jnp.where(ok[:, None], union, b0)

    z0, z1 = setup.zmin[0::2], setup.zmin[1::2]
    even_zmin = jnp.where(ok, jnp.minimum(z0, z1), z0)

    luma = setup.colors @ LUMA_W
    lum_q = jnp.clip(jnp.round(luma * LUMA_MASK), 0, LUMA_MASK)

    def interleave(a, b):
        return jnp.stack([a, b], axis=1).reshape((T,) + a.shape[1:])

    return PrimSetup(
        edges=interleave(even_edges, tri1),
        zinv=interleave(setup.zinv[0::2], setup.zinv[1::2]),
        luma=interleave(lum_q[0::2], lum_q[1::2]),
        valid=interleave(even_valid, odd_valid),
        bbox=interleave(even_bbox, b1),
        zmin=interleave(even_zmin, z1),
    )


def compact_prims(prims: PrimSetup, cap: int) -> PrimSetup:
    """Valid-primitive compaction, nearest-first (see compact_setup)."""
    order = jnp.argsort(jnp.where(prims.valid, prims.zmin, jnp.inf))[:cap]
    return jax.tree_util.tree_map(lambda a: jnp.take(a, order, axis=0), prims)


def pack_setup_prims(prims: PrimSetup) -> jnp.ndarray:
    """PrimSetup → (16, P) coefficient-major f32 SMEM table."""
    P = prims.edges.shape[0]
    flat = jnp.concatenate([
        prims.edges.reshape(P, 12), prims.zinv, prims.luma[:, None]], axis=-1)
    return jnp.where(prims.valid[:, None], flat, 0.0).T


def _prim_far_key(far: float) -> int:
    """Smallest packed key strictly NEARER than ``far`` (max luma at 1/far):
    a pixel is a hit iff its running-max key exceeds this."""
    bits = int(np.float32(1.0 / far).view(np.int32)) & KEY_MASK
    return bits | LUMA_MASK


def _prim_kernel(tris_ref, idx_ref, count_ref, out_ref, *, width, near, far,
                 height, sky_top_l, sky_hor_l, fog_density,
                 list_band_factor=1, tile_rows=TILE_ROWS):
    """4-edge primitive band kernel. Key = top-20 bits of 1/z | 12-bit luma;
    visibility is a running MAX (larger 1/z = nearer). No divide in the pass
    loop — the one reciprocal (fog/shade) runs per pixel in the epilogue."""
    r = pl.program_id(0)
    lr = r // list_band_factor
    y0 = (r * tile_rows).astype(jnp.float32)

    px = jax.lax.broadcasted_iota(
        jnp.int32, (1, width), 1).astype(jnp.float32) + 0.5
    py = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, 1), 0).astype(jnp.float32) + (y0 + 0.5)

    inv_near = np.float32(1.0 / near)
    far_key = np.int32(_prim_far_key(far))

    def prim_pass(t, kmax):
        e0 = tris_ref[0, t] * px + (tris_ref[1, t] * py + tris_ref[2, t])
        e1 = tris_ref[3, t] * px + (tris_ref[4, t] * py + tris_ref[5, t])
        e2 = tris_ref[6, t] * px + (tris_ref[7, t] * py + tris_ref[8, t])
        e3 = tris_ref[9, t] * px + (tris_ref[10, t] * py + tris_ref[11, t])
        zi = tris_ref[12, t] * px + (tris_ref[13, t] * py + tris_ref[14, t])
        m = jnp.minimum(jnp.minimum(e0, e1), jnp.minimum(e2, e3))
        # inside ⇔ all border rows > 0 (sign-normalized); z > near ⇔ zi < 1/near
        ok = jnp.logical_and(m > 0.0, zi < inv_near)
        bits = jax.lax.bitcast_convert_type(zi, jnp.int32)
        lum_i = tris_ref[15, t].astype(jnp.int32)  # scalar (SMEM)
        key = jnp.bitwise_or(jnp.bitwise_and(bits, KEY_MASK), lum_i)
        return jnp.maximum(kmax, jnp.where(ok, key, 0))

    u = FAST_UNROLL

    def body(j, kmax):
        vals = [prim_pass(idx_ref[lr, u * j + i], kmax0) for i in range(u)]
        m = vals[0]
        for v in vals[1:]:
            m = jnp.maximum(m, v)
        return jnp.maximum(kmax, m)

    kmax0 = jnp.zeros((tile_rows, width), jnp.int32)
    kmax = jax.lax.fori_loop(0, (count_ref[lr, 0] + u - 1) // u, body, kmax0)

    hit = kmax > far_key
    ziw = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(kmax, KEY_MASK), jnp.float32)
    luma = jnp.bitwise_and(kmax, LUMA_MASK).astype(jnp.float32) * (1.0 / LUMA_MASK)
    # distance shade 1/(1+0.004·z) = zi/(zi+0.004) — no depth reconstruction
    shade = ziw * pl.reciprocal(ziw + 0.004, approx=True)
    t_sky = (py - 0.5) * (1.0 / max(height - 1, 1))
    sky = sky_top_l * (1.0 - t_sky) + sky_hor_l * t_sky
    lit = luma * shade
    if fog_density > 0.0:
        depth = pl.reciprocal(jnp.maximum(ziw, 1e-9), approx=True)
        f = jnp.exp(-fog_density * depth)
        lit = lit * f + sky * (1.0 - f)
    out_ref[:] = jnp.where(hit, lit, sky)


# Primitives per vectorized pass group (sublane axis of the (P, rows·W)
# broadcast ops). 8 = the f32 sublane tile height. Env override for A/B only.
VEC_P = int(_os.environ.get("TPUIL_FAST_VEC_P", 8))


def gather_band_tables(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(13, T) coefficient table + (R, k) band lists → (R, k, 16) band-resident
    coefficient tables (lane-padded 13 → 16 so DMA rows are 64-byte).

    This is the vectorized kernel's whole front-end: the gather happens ONCE
    per frame in XLA (bandwidth-bound, ~R·k·52 bytes), and the kernel then
    reads coefficients as natural sublane-major (P, 1) column slices — zero
    scalar loads, zero dynamic indexing inside the pass loop."""
    return jnp.pad(jnp.take(tbl.T, idx, axis=0), ((0, 0), (0, 0), (0, 3)))


def _vec_kernel(btbl_ref, count_ref, out_ref, *, width, near, far,
                height, sky_top_l, sky_hor_l, fog_density,
                list_band_factor=1, tile_rows=TILE_ROWS, vec_p=VEC_P):
    """Vectorized band pass: P primitives per loop body as (P, rows·W) VPU
    broadcasts — sublanes = primitives, lanes = flattened band pixels.

    The scalar kernel's inner loop issues 13 SMEM scalar loads per triangle
    and is scalar-issue-bound (PERFORMANCE.md round-3 log); here every
    coefficient arrives as a (P, 1) VMEM column slice and every arithmetic op
    covers P triangles at once, so the loop body is pure VPU work and runs
    ceil(count/P) iterations instead of count. Bit-exact vs _fast_kernel:
    identical f32 operands combined in the identical order per pixel (the
    rank-1 a·px / b·py+c split evaluates the same products), same approx
    reciprocal, same packed-key min."""
    r = pl.program_id(0)
    lr = r // list_band_factor  # list row: bands may share a coarser list
    y0 = (r * tile_rows).astype(jnp.float32)
    n = tile_rows * width

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    px = (lane % width).astype(jnp.float32) + 0.5
    py = (lane // width).astype(jnp.float32) + (y0 + 0.5)

    far_key = _pack_key_const(far)

    def group_pass(g, kmin):
        c = btbl_ref[0, pl.ds(g * vec_p, vec_p), :]  # (P, 16) f32
        e0 = c[:, 0:1] * px + (c[:, 1:2] * py + c[:, 2:3])
        e1 = c[:, 3:4] * px + (c[:, 4:5] * py + c[:, 5:6])
        e2 = c[:, 6:7] * px + (c[:, 7:8] * py + c[:, 8:9])
        znp_ = c[:, 9:10] * px + (c[:, 10:11] * py + c[:, 11:12])
        inside = jnp.minimum(jnp.minimum(e0, e1), e2) > 0.0
        den = e0 + e1 + e2
        z = znp_ * pl.reciprocal(den, approx=True)
        ok = jnp.logical_and(inside, z > near)
        bits = jax.lax.bitcast_convert_type(z, jnp.int32)
        lum_i = c[:, 12:13].astype(jnp.int32)  # (P, 1) int broadcast
        key = jnp.bitwise_or(jnp.bitwise_and(bits, KEY_MASK), lum_i)
        cand = jnp.where(ok, key, MISS_KEY)  # (P, N)
        return jnp.minimum(kmin, jnp.min(cand, axis=0, keepdims=True))

    kmin0 = jnp.full((1, n), MISS_KEY, jnp.int32)
    n_groups = (count_ref[lr, 0] + vec_p - 1) // vec_p
    kmin = jax.lax.fori_loop(0, n_groups, group_pass, kmin0)

    hit = kmin < far_key
    depth = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(kmin, KEY_MASK), jnp.float32)
    luma = jnp.bitwise_and(kmin, LUMA_MASK).astype(jnp.float32) * (1.0 / LUMA_MASK)
    shade = pl.reciprocal(1.0 + 0.004 * depth, approx=True)
    t_sky = (py - 0.5) * (1.0 / max(height - 1, 1))
    sky = sky_top_l * (1.0 - t_sky) + sky_hor_l * t_sky
    lit = luma * shade
    if fog_density > 0.0:
        f = jnp.exp(-fog_density * depth)
        lit = lit * f + sky * (1.0 - f)
    out_ref[:] = jnp.where(hit, lit, sky).reshape(tile_rows, width)


def _fast_kernel(tris_ref, idx_ref, count_ref, out_ref, *, width, near, far,
                 height, sky_top_l, sky_hor_l, fog_density,
                 list_band_factor=1, tile_rows=TILE_ROWS):
    r = pl.program_id(0)
    lr = r // list_band_factor  # list row: bands may share a coarser list
    y0 = (r * tile_rows).astype(jnp.float32)

    # Rank-1 affine structure: a·px varies only along lanes, b·py + c only
    # along sublanes. Keeping them as a (1, W) row and a (rows, 1) column
    # until the final broadcast-add halves the full-tile VPU ops per pass
    # (2 muls + 2 adds × 4 functions → 1 tiny mul + 1 tiny fma + 1 full-tile
    # add each) and is BIT-exact: each pixel sees the same operand values
    # combined in the same order as the all-(rows, W) form.
    px = jax.lax.broadcasted_iota(
        jnp.int32, (1, width), 1).astype(jnp.float32) + 0.5
    py = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, 1), 0).astype(jnp.float32) + (y0 + 0.5)

    far_key = _pack_key_const(far)

    def tri_pass(t, kmin):
        e0 = tris_ref[0, t] * px + (tris_ref[1, t] * py + tris_ref[2, t])
        e1 = tris_ref[3, t] * px + (tris_ref[4, t] * py + tris_ref[5, t])
        e2 = tris_ref[6, t] * px + (tris_ref[7, t] * py + tris_ref[8, t])
        znp_ = tris_ref[9, t] * px + (tris_ref[10, t] * py + tris_ref[11, t])
        # edges are sign-normalized at projection time (camera.py): inside the
        # front-projected part ⇔ all e_i > 0, so min alone decides — the
        # back-projection region of eye-crossing triangles lands all-negative.
        inside = jnp.minimum(jnp.minimum(e0, e1), e2) > 0.0
        den = e0 + e1 + e2
        z = znp_ * pl.reciprocal(den, approx=True)
        ok = jnp.logical_and(inside, z > near)
        bits = jax.lax.bitcast_convert_type(z, jnp.int32)
        lum_i = tris_ref[12, t].astype(jnp.int32)  # scalar (SMEM)
        key = jnp.bitwise_or(jnp.bitwise_and(bits, KEY_MASK), lum_i)
        return jnp.minimum(kmin, jnp.where(ok, key, MISS_KEY))

    # FAST_UNROLL-wide unroll: unlike a z-buffer select chain, packed-key
    # candidates are independent until the final min, so adjacent triangles'
    # latency chains (scalar SMEM loads included) overlap. Tail overshoot
    # (count not a multiple / beyond-count entries) is safe: list tails hold
    # non-hit or invalid triangles, which produce no passing pixels.
    u = FAST_UNROLL

    def body(j, kmin):
        vals = [tri_pass(idx_ref[lr, u * j + i], kmin0) for i in range(u)]
        m = vals[0]
        for v in vals[1:]:
            m = jnp.minimum(m, v)
        return jnp.minimum(kmin, m)

    kmin0 = jnp.full((tile_rows, width), MISS_KEY, jnp.int32)
    kmin = jax.lax.fori_loop(0, (count_ref[lr, 0] + u - 1) // u, body, kmin0)

    hit = kmin < far_key
    depth = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(kmin, KEY_MASK), jnp.float32)
    luma = jnp.bitwise_and(kmin, LUMA_MASK).astype(jnp.float32) * (1.0 / LUMA_MASK)
    shade = pl.reciprocal(1.0 + 0.004 * depth, approx=True)
    t_sky = (py - 0.5) * (1.0 / max(height - 1, 1))
    sky = sky_top_l * (1.0 - t_sky) + sky_hor_l * t_sky
    lit = luma * shade
    if fog_density > 0.0:
        # exponential extinction toward the sky color — one exp per PIXEL in
        # the band epilogue (render/weather.py contract); the wrapper also
        # shrinks `far` to the 1%-transmittance distance so fog CULLS geometry
        f = jnp.exp(-fog_density * depth)
        lit = lit * f + sky * (1.0 - f)
    out_ref[:] = jnp.where(hit, lit, sky)


@functools.partial(jax.jit, static_argnames=("height", "width", "near", "far",
                                             "interpret", "max_tris_per_tile",
                                             "compact_cap", "fog_density",
                                             "lod_px", "list_band_factor",
                                             "quads", "vec"))
def rasterize_luma_fast(
    setup: TriangleSetup,
    height: int,
    width: int,
    near: float = 0.5,
    far: float = 300.0,
    interpret: bool = False,
    max_tris_per_tile: int | None = None,
    compact_cap: int | None = None,
    fog_density: float = 0.0,
    lod_px: float = 0.0,
    list_band_factor: int = 1,
    quads: bool | None = None,
    vec: bool = False,
):
    """→ gray (H, W) f32 in [0,1] — the policy observation channel only.

    Equals rasterize_pallas_luma's gray output up to 12-bit luma quantization
    and approx-reciprocal depth rounding. ``max_tris_per_tile`` caps each
    band's nearest-first list (overflow drops the farthest triangles);
    ``compact_cap`` pre-gathers the valid triangles into a table that wide
    (see compact_setup) before any per-band work. ``fog_density`` > 0 fuses
    exponential fog into the epilogue AND shrinks ``far`` to the visibility
    limit (weather.visibility_far), so fog also culls triangle passes.
    ``quads`` selects the fused quad-primitive kernel (see fuse_prims);
    None = auto — on whenever the setup carries pair analysis (pair_ok).
    """
    if quads is None:
        quads = setup.pair_ok is not None and setup.zinv is not None
    if fog_density > 0.0:
        from carla_imitation_learning_tpu.render.weather import visibility_far

        far = visibility_far(fog_density, far)

    rows = band_rows(height)
    band = rows * list_band_factor
    assert height % band == 0, f"height {height} % {band} != 0"
    n_rows = height // rows
    n_list_rows = height // band
    kern_kw = dict(
        width=width, near=near, far=far, height=height,
        sky_top_l=float(np.asarray(SKY_TOP) @ np.asarray(LUMA_W)),
        sky_hor_l=float(np.asarray(SKY_HORIZON) @ np.asarray(LUMA_W)),
        fog_density=fog_density, list_band_factor=list_band_factor,
        tile_rows=rows)

    if quads:
        prims = fuse_prims(setup)
        if compact_cap is not None and compact_cap < prims.valid.shape[0]:
            prims = compact_prims(prims, compact_cap)
        tbl = pack_setup_prims(prims)
        lists_src, kern, pack_w = prims, _prim_kernel, PRIM_PACK_WIDTH
    else:
        if compact_cap is not None and compact_cap < setup.valid.shape[0]:
            setup = compact_setup(setup, compact_cap)
        tbl = pack_setup_fast(setup)
        lists_src, kern, pack_w = setup, _fast_kernel, FAST_PACK_WIDTH

    n_tris = tbl.shape[1]  # coefficient-major table
    k = n_tris if max_tris_per_tile is None else min(max_tris_per_tile, n_tris)
    idx, count = tile_lists_fast(lists_src, height, k, width=width, far=far,
                                 lod_px=lod_px, rows_per_band=band)
    if vec and not quads:
        # vectorized band pass: gather per-band coefficient tables up front
        # (gather_band_tables) and run the (P, rows·W) broadcast kernel —
        # no SMEM table, no idx indirection inside the kernel.
        step = max(VEC_P, 8)  # sublane-aligned group slices
        if k % step:
            pad = step - k % step
            idx = jnp.pad(idx, ((0, 0), (0, pad)))
            k += pad
        btbl = gather_band_tables(tbl, idx)
        vkern = functools.partial(_vec_kernel, **kern_kw, vec_p=step)
        return pl.pallas_call(
            vkern,
            grid=(n_rows,),
            in_specs=[
                pl.BlockSpec((1, k, 16),
                             lambda r: (r // list_band_factor, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_list_rows, 1), lambda r: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((rows, width), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((height, width), jnp.float32),
            interpret=interpret,
        )(btbl, count)
    if k % FAST_UNROLL:  # the unrolled loop may overshoot to the next multiple
        pad = FAST_UNROLL - k % FAST_UNROLL
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        k += pad

    kernel = functools.partial(kern, **kern_kw)
    out = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((pack_w, n_tris), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            # full-array SMEM blocks with a constant index map: Mosaic rejects
            # (1, k) row blocks (last-2-dims divisibility rule), and a constant
            # map stages the copy once for the whole grid anyway
            pl.BlockSpec((n_list_rows, k), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_list_rows, 1), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, width), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.float32),
        interpret=interpret,
    )(tbl, idx, count)
    return out
