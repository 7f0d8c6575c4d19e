"""Pure-JAX z-buffer rasterizer: lax.scan over triangle chunks.

The portable correctness reference for the Pallas tile kernel (ops/raster.py).
Per chunk, edge/depth evaluation is a broadcasted FMA over the pixel grid and
the z-test is a masked min-reduction — all fused by XLA. Buffers are carried
through the scan, so peak memory is O(chunk · H · W) per env.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from carla_imitation_learning_tpu.render.camera import TriangleSetup
from carla_imitation_learning_tpu.render.geometry import SEMANTIC_PALETTE, SEM_SKY

SKY_TOP = jnp.asarray([0.35, 0.55, 0.85])
SKY_HORIZON = jnp.asarray([0.75, 0.85, 0.95])


def sky_image(height: int, width: int) -> jnp.ndarray:
    """Vertical sky gradient background."""
    t = jnp.linspace(0.0, 1.0, height)[:, None, None]
    return jnp.broadcast_to(SKY_TOP * (1 - t) + SKY_HORIZON * t, (height, width, 3))


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk", "near", "far"))
def rasterize_jax(
    setup: TriangleSetup,
    height: int,
    width: int,
    chunk: int = 64,
    near: float = 0.5,
    far: float = 300.0,
):
    """→ (rgb (H,W,3) f32, sem (H,W) int32, depth (H,W) f32)."""
    T = setup.edges.shape[0]
    assert T % chunk == 0, f"triangle count {T} must be a multiple of chunk {chunk}"
    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    PX = px[None, :] * jnp.ones((height, 1))   # (H,W)
    PY = py[:, None] * jnp.ones((1, width))

    edges = setup.edges.reshape(T // chunk, chunk, 3, 3)
    znum = setup.znum.reshape(T // chunk, chunk, 3)
    colors = setup.colors.reshape(T // chunk, chunk, 3)
    classes = setup.classes.reshape(T // chunk, chunk)
    valid = setup.valid.reshape(T // chunk, chunk)
    textured = setup.unum is not None
    xs = (edges, znum, colors, classes, valid)
    if textured:
        xs = xs + (setup.unum.reshape(T // chunk, chunk, 3),
                   setup.vnum.reshape(T // chunk, chunk, 3))

    def body(carry, xs):
        zbuf, rgb, sem = carry
        e_c, zn_c, col_c, cls_c, val_c = xs[:5]

        # e_i(p) per chunk triangle: (C, 3, H, W)
        e = (e_c[:, :, 0, None, None] * PX + e_c[:, :, 1, None, None] * PY
             + e_c[:, :, 2, None, None])
        inside = jnp.all(e > 0.0, axis=1) | jnp.all(e < 0.0, axis=1)  # (C,H,W)
        den = jnp.sum(e, axis=1)
        den_safe = jnp.where(den == 0, 1e-9, den)
        z = (zn_c[:, 0, None, None] * PX + zn_c[:, 1, None, None] * PY
             + zn_c[:, 2, None, None]) / den_safe
        ok = inside & val_c[:, None, None] & (z > near) & (z < far)
        zm = jnp.where(ok, z, jnp.inf)  # (C,H,W)

        win = jnp.argmin(zm, axis=0)  # (H,W) best triangle in chunk
        zwin = jnp.take_along_axis(zm, win[None], axis=0)[0]
        better = zwin < zbuf
        zbuf = jnp.where(better, zwin, zbuf)
        col_win = col_c[win]  # (H,W,3)
        if textured:
            # perspective-correct surface UV → procedural factor; the SAME
            # texture_factor the Pallas kernel calls (ops/texture.py), so
            # both backends stay pixel-exact with each other
            from carla_imitation_learning_tpu.ops.texture import texture_factor

            # gather the WINNER's affine rows first: u/v/fac at (H,W), not
            # (C,H,W) — identical math on the winning triangle, C× less work
            un_c, vn_c = xs[5], xs[6]
            un_w, vn_w = un_c[win], vn_c[win]  # (H,W,3)
            den_w = jnp.take_along_axis(den_safe, win[None], axis=0)[0]
            u = (un_w[..., 0] * PX + un_w[..., 1] * PY + un_w[..., 2]) / den_w
            v = (vn_w[..., 0] * PX + vn_w[..., 1] * PY + vn_w[..., 2]) / den_w
            fac = texture_factor(u, v, cls_c[win])  # (H,W)
            col_win = col_win * fac[..., None]
        rgb = jnp.where(better[..., None], col_win, rgb)
        sem = jnp.where(better, cls_c[win], sem)
        return (zbuf, rgb, sem), None

    init = (
        jnp.full((height, width), jnp.inf),
        sky_image(height, width),
        jnp.full((height, width), SEM_SKY, jnp.int32),
    )
    (zbuf, rgb, sem), _ = jax.lax.scan(body, init, xs)

    # simple distance shading on hit pixels (depth cue, keeps flat look)
    hit = jnp.isfinite(zbuf)
    shade = jnp.where(hit, 1.0 / (1.0 + 0.004 * jnp.nan_to_num(zbuf, posinf=0.0)), 1.0)
    rgb = rgb * shade[..., None]
    depth = jnp.where(hit, zbuf, far)
    return rgb, sem, depth


def semantic_to_rgb(sem: jnp.ndarray) -> jnp.ndarray:
    """Semantic ids → palette colors (for visualization and the reference's
    'semantic' camera variant, train.py:97)."""
    return jnp.asarray(SEMANTIC_PALETTE)[sem]
