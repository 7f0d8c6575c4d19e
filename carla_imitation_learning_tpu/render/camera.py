"""Pinhole camera + 2D-homogeneous triangle setup.

Projection emits, per triangle, the 2D-homogeneous edge/interpolation
coefficients (Olano–Greer style): with screen-homogeneous vertices
v_i = (sx·w, sy·w, w), the edge rows are E_i = cross(v_{i+1}, v_{i+2}) and for
a pixel p = (px, py, 1):

    e_i(p) = E_i · p            inside ⇔ all e_i share a sign
    den(p) = Σ_i e_i(p)
    z(p)   = (Σ_i z_i E_i) · p / den(p)     (perspective-correct camera depth)

No near-plane clipping is required: triangles crossing the eye plane
rasterize correctly because the test/interp never divides by per-vertex w.
This setup is pure batched linear algebra — it runs as fused matmuls/VPU ops
ahead of the rasterizer.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class Camera(struct.PyTreeNode):
    pos: jnp.ndarray      # (3,) world position
    forward: jnp.ndarray  # (3,) unit
    right: jnp.ndarray    # (3,) unit
    down: jnp.ndarray     # (3,) unit (image y grows downward)


# CARLA-style rig: the reference's camera names (configs/model/vae.yaml:4
# FL/FR/RR/SL/SR; train.py:97 camera/semantic; :135 camera_sFOV).
# (yaw offset from heading in degrees, fov override or None).
CAMERA_PRESETS = {
    "camera": (0.0, None),        # forward dashboard
    "semantic": (0.0, None),      # same pose; semantic output channel
    "camera_sFOV": (0.0, 60.0),   # narrow field of view
    "FL": (45.0, None),           # front-left
    "FR": (-45.0, None),          # front-right
    "SL": (90.0, None),           # side-left
    "SR": (-90.0, None),          # side-right
    "RR": (180.0, None),          # rear
}


def camera_from_ego(ego_pos: jnp.ndarray, ego_yaw: jnp.ndarray,
                    height: float = 1.6, forward_offset: float = 0.5,
                    yaw_offset_deg: float = 0.0) -> Camera:
    """Rig camera: mounted at the ego, looking along heading + yaw offset,
    horizon level."""
    yaw = ego_yaw + jnp.deg2rad(yaw_offset_deg)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    ch, sh = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    forward = jnp.stack([c, s, jnp.zeros_like(c)], -1)
    right = jnp.stack([s, -c, jnp.zeros_like(c)], -1)
    down = jnp.array([0.0, 0.0, -1.0])
    mount = ego_pos + forward_offset * jnp.stack([ch, sh], -1)  # on the body
    pos = jnp.concatenate([mount, jnp.array([height])])
    return Camera(pos=pos, forward=forward, right=right, down=down)


class TriangleSetup(struct.PyTreeNode):
    """Per-triangle rasterization coefficients (all (T, 3))."""

    edges: jnp.ndarray   # (T, 3, 3) rows E_i
    znum: jnp.ndarray    # (T, 3)  Σ_i z_i E_i (depth numerator row)
    colors: jnp.ndarray  # (T, 3)
    classes: jnp.ndarray  # (T,)
    valid: jnp.ndarray   # (T,) bool — non-degenerate and not fully behind
    bbox: jnp.ndarray    # (T, 4) screen-space xmin, xmax, ymin, ymax (conservative)
    zmin: jnp.ndarray    # (T,) nearest camera depth (tile-cull priority)
    # Surface-UV numerator rows (Σ_i U_i E_i, like znum) for procedural
    # texturing (ops/texture.py); None when projected with textures=False.
    unum: jnp.ndarray | None = None  # (T, 3)
    vnum: jnp.ndarray | None = None  # (T, 3)
    # Screen-affine inverse depth: z(p) = det/den(p) ⇒ 1/z(p) = den(p)/det is
    # one affine row per PLANE, shared by every triangle in it. The fast quad
    # kernel (ops/raster_fast.py) evaluates depth from this row directly —
    # no per-pass perspective divide.
    zinv: jnp.ndarray | None = None  # (T, 3)
    # Even/odd triangle pairs (2i, 2i+1) that form a planar convex quad with
    # the scene emitters' split convention (geometry._quad: (v0,v1,v2) +
    # (v0,v2,v3)) and can be rasterized as ONE 4-edge primitive. None when
    # T is odd or fusion analysis was skipped.
    pair_ok: jnp.ndarray | None = None  # (T//2,) bool


def project_triangles(
    tris: jnp.ndarray,   # (T, 3, 3) world vertices
    colors: jnp.ndarray,
    classes: jnp.ndarray,
    cam: Camera,
    width: int,
    height: int,
    fov_deg: float = 90.0,
    near: float = 0.5,
    cullable: jnp.ndarray | None = None,  # (T,) bool — backface-cull these
    textures: bool = False,
) -> TriangleSetup:
    rel = tris - cam.pos  # (T,3,3)
    x = rel @ cam.right   # (T,3) camera-right coords
    y = rel @ cam.down
    z = rel @ cam.forward  # camera depth

    focal = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    # screen-homogeneous verts: (sx·w, sy·w, w) with w = z
    sx_w = (x * focal + z) * (width / 2.0)   # ((x·f/z)+1)/2·W  · z
    sy_w = (y * focal * (width / height) + z) * (height / 2.0)
    v = jnp.stack([sx_w, sy_w, z], axis=-1)  # (T,3,3) homogeneous screen verts

    e0 = jnp.cross(v[:, 1], v[:, 2])
    e1 = jnp.cross(v[:, 2], v[:, 0])
    e2 = jnp.cross(v[:, 0], v[:, 1])
    edges = jnp.stack([e0, e1, e2], axis=1)  # (T,3,3)

    # validity: some area and not entirely behind the near plane
    det = jnp.einsum("tc,tc->t", v[:, 0], e0)  # det(M) = v0 · (v1 × v2)

    # Sign-normalize: scale edge rows by sign(det) so pixels inside the
    # FRONT-projected part of any valid triangle see all e_i > 0 (at vertex i,
    # e_i = det/z_i with z_i > 0 there). The sign-agnostic kernels are
    # unaffected (all-positive is still same-sign); the fast rollout kernel
    # exploits it to test only min(e) > 0. z is untouched: znum scales with
    # den. The back-projection region of eye-crossing triangles flips to
    # all-negative and is rejected by the same test (it previously passed
    # same-sign and was discarded by its negative depth).
    edges = edges * jnp.where(det < 0.0, -1.0, 1.0)[:, None, None]

    znum = jnp.einsum("tv,tvc->tc", z, edges)  # Σ_i z_i E_i
    any_area = jnp.abs(det) > 1e-9
    front = jnp.any(z > near, axis=1)
    degenerate = jnp.all(tris == 0.0, axis=(1, 2))  # padding
    valid = any_area & front & ~degenerate

    if cullable is not None:
        # Backface culling for closed solids (building/vehicle boxes): faces
        # are wound with outward normals (geometry._box_tris), so a face whose
        # plane puts the camera on its back side can never be seen — roughly
        # half of every box's walls, and the roof whenever the camera is below
        # it. Double-sided geometry (ground, roads, poles, light heads) must
        # NOT be culled: pass cullable=False for those.
        n = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        facing = jnp.einsum("tc,tc->t", n, -rel[:, 0]) > 0.0  # cam.pos - v0
        valid &= facing | ~cullable

    # conservative screen bbox (for tile culling): vertices behind the eye
    # make the triangle's extent unbounded → clamp bbox to full screen then.
    safe_z = jnp.maximum(z, 1e-3)
    px = sx_w / safe_z
    py = sy_w / safe_z
    behind = jnp.any(z <= 1e-3, axis=1)
    xmin = jnp.where(behind, 0.0, jnp.min(px, axis=1))
    xmax = jnp.where(behind, float(width), jnp.max(px, axis=1))
    ymin = jnp.where(behind, 0.0, jnp.min(py, axis=1))
    ymax = jnp.where(behind, float(height), jnp.max(py, axis=1))
    bbox = jnp.stack([xmin, xmax, ymin, ymax], axis=-1)

    # screen-affine 1/z row (per plane): den(p)/det with the sign-normalized
    # edges, den = Σ_i e_i and |det| the matching normalized determinant
    abs_det = jnp.abs(det)
    zinv = jnp.sum(edges, axis=1) / jnp.where(abs_det > 1e-9, abs_det, 1.0)[:, None]

    # quad-pair fusability (even/odd pairs; geometry emitters' convention):
    # shared v0 + shared diagonal v2, coplanar, same flat color, every vertex
    # in front of the eye (guarantees a convex screen polygon), consistent
    # screen winding. Conservative: unfusable pairs rasterize as 2 triangles.
    pair_ok = None
    if tris.shape[0] % 2 == 0 and tris.shape[0] > 0:
        t0, t1 = tris[0::2], tris[1::2]
        share = (jnp.all(t0[:, 0] == t1[:, 0], axis=-1)
                 & jnp.all(t0[:, 2] == t1[:, 1], axis=-1))
        n0 = jnp.cross(t0[:, 1] - t0[:, 0], t0[:, 2] - t0[:, 0])
        dist = (jnp.abs(jnp.einsum("tc,tc->t", n0, t1[:, 2] - t0[:, 0]))
                / (jnp.linalg.norm(n0, axis=-1) + 1e-12))
        same_col = jnp.all(colors[0::2] == colors[1::2], axis=-1)
        front = jnp.all(z.reshape(-1, 2, 3) > 1e-3, axis=(1, 2))
        same_orient = jnp.sign(det[0::2]) == jnp.sign(det[1::2])
        pair_ok = (share & (dist <= 1e-3) & same_col & front & same_orient
                   & valid[0::2] & valid[1::2])

    unum = vnum = None
    if textures:
        # Surface-UV rows for procedural texturing (ops/texture.py): the
        # world-space UV of each vertex interpolates perspective-correctly as
        # u(p) = (Σ_i U_i E_i) · p / den(p) — identical machinery to znum.
        # Buildings parameterize by (x + y, z): x + y runs along either
        # axis-aligned facade; everything else by the ground plane (x, y).
        from carla_imitation_learning_tpu.render.geometry import SEM_BUILDING

        is_wall = (classes == SEM_BUILDING)[:, None]
        U = jnp.where(is_wall, tris[..., 0] + tris[..., 1], tris[..., 0])
        V = jnp.where(is_wall, tris[..., 2], tris[..., 1])
        unum = jnp.einsum("tv,tvc->tc", U, edges)
        vnum = jnp.einsum("tv,tvc->tc", V, edges)
    return TriangleSetup(edges=edges, znum=znum, colors=colors,
                         classes=classes, valid=valid, bbox=bbox,
                         zmin=jnp.min(z, axis=1), unum=unum, vnum=vnum,
                         zinv=zinv, pair_ok=pair_ok)
