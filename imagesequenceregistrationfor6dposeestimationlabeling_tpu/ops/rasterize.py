"""Point-splat object-coordinate rasterizer.

Replaces the moderngl/EGL OpenGL renderer (renderer.py:37-117): given a
dense surface cloud, render the per-pixel *object coordinates* of the
visible surface under a pose.  On TPU this is a projection + z-buffer
scatter-min — no rasterization pipeline needed (the reference itself only
uses the GL renderer for the optional ``useSurfEval`` refinement path,
inference.py:99-113).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pnp


@functools.partial(jax.jit, static_argnames=("res",))
def render_object_coords(
    pts: jnp.ndarray,       # (m, 3) object-frame points (CAD scale)
    R: jnp.ndarray,
    t: jnp.ndarray,
    K: jnp.ndarray,
    res: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (coord image (res, res, 3), mask (res, res)).

    Each pixel holds the object-frame coordinate of the nearest projected
    point (z-buffered); mask is 1 where any point landed.
    """
    m = pts.shape[0]
    uv, z = pnp.reproject(R[None], t[None], K, pts)
    uv = jnp.round(uv[0])
    z = z[0]
    inside = jnp.all((uv >= 0) & (uv < res), axis=-1) & (z > 0)
    n = res * res
    flat = (uv[:, 1] * res + uv[:, 0]).astype(jnp.int32)
    flat = jnp.where(inside, flat, n)
    zbuf = jax.ops.segment_min(jnp.where(inside, z, jnp.inf), flat, num_segments=n + 1)[:n]
    mask = jnp.isfinite(zbuf)
    # winning point per pixel: argmin via segment_min over point indices of
    # points matching the zbuffer depth
    z_at_pix = jnp.concatenate([zbuf, jnp.full((1,), jnp.inf)])[flat]
    won = inside & (z <= z_at_pix + 1e-9)
    idx = jax.ops.segment_min(
        jnp.where(won, jnp.arange(m), m), flat, num_segments=n + 1
    )[:n]
    coords = jnp.where(
        (idx < m)[:, None], pts[jnp.clip(idx, 0, m - 1)], 0.0
    ).reshape(res, res, 3)
    return coords, mask.reshape(res, res).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("res", "px_chunk", "albedo_fn"))
def render_mesh(
    verts: jnp.ndarray,        # (V, 3) world-frame vertices
    faces: jnp.ndarray,        # (T, 3) int32 triangle indices
    vert_colors: jnp.ndarray,  # (V, 3) per-vertex albedo in [0, 1]
    vert_normals: jnp.ndarray, # (V, 3) unit vertex normals (world frame)
    cam,                       # geometry.cameras.Camera (single view)
    res: int,
    light_pos: jnp.ndarray | None = None,
    ambient: float = 0.35,
    diffuse: float = 0.65,
    px_chunk: int = 2048,
    albedo_fn=None,
):
    """Z-buffered triangle rasterizer with Lambertian point-light shading.

    Replaces the pytorch3d MeshRenderer used ONLY for synthetic data
    generation in the reference (cowrendersynth.py:143-178: rasterizer +
    SoftPhongShader + silhouette pass, :1300-1334).  TPU-native design:
    every pixel chunk tests all triangles at once (barycentric inside
    tests are one (px, T) broadcast — MXU/VPU-friendly fixed shapes, no
    scanline serialization), then the nearest hit wins by masked argmin;
    shading interpolates vertex normals/albedo with perspective-correct
    barycentrics.

    Returns (rgb (res, res, 3), sil (res, res), depth (res, res) with +inf
    at misses).
    """
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import (
        cameras as cam_lib,
    )

    if light_pos is None:
        light_pos = cam_lib.camera_center(cam)

    xy_ndc, z = cam_lib.project_points(cam, verts)
    pix = cam_lib.ndc_to_pixel(xy_ndc, res)               # (V, 2)
    v2 = pix[faces]                                       # (T, 3, 2)
    zf = z[faces]                                         # (T, 3)

    a, b, c = v2[:, 0], v2[:, 1], v2[:, 2]
    # signed double-area of each screen triangle
    area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    degenerate = (jnp.abs(area) <= 1e-12) | jnp.any(zf <= 1e-6, axis=-1)

    # pixel centers, row-major
    centers = jnp.arange(res, dtype=jnp.float32) + 0.5
    yy, xx = jnp.meshgrid(centers, centers, indexing="ij")
    pts = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (res*res, 2)
    n_px = pts.shape[0]
    pad = (-n_px) % px_chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, px_chunk, 2)

    col_f = vert_colors[faces]                            # (T, 3, 3)
    nrm_f = vert_normals[faces]                           # (T, 3, 3)
    pos_f = verts[faces]                                  # (T, 3, 3)
    inv_z = 1.0 / jnp.maximum(zf, 1e-6)                   # (T, 3)

    def chunk_body(p):                                    # p: (px_chunk, 2)
        # barycentric coords of every pixel in every triangle (screen space)
        def edge(p0, p1):
            return ((p1[:, 0] - p0[:, 0])[None, :] * (p[:, 1, None] - p0[None, :, 1])
                    - (p1[:, 1] - p0[:, 1])[None, :] * (p[:, 0, None] - p0[None, :, 0]))

        w0 = edge(b, c) * inv_area[None, :]               # (px, T)
        w1 = edge(c, a) * inv_area[None, :]
        w2 = edge(a, b) * inv_area[None, :]
        inside = (
            (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            & ~degenerate[None, :]
        )
        # perspective-correct interpolation: attrs are interpolated as
        # (attr/z) with screen barycentrics, divided by interp(1/z)
        iz = w0 * inv_z[None, :, 0] + w1 * inv_z[None, :, 1] + w2 * inv_z[None, :, 2]
        zpix = 1.0 / jnp.maximum(iz, 1e-12)               # (px, T)
        zmask = jnp.where(inside, zpix, jnp.inf)
        best = jnp.argmin(zmask, axis=1)                  # (px,)
        hit = jnp.take_along_axis(zmask, best[:, None], axis=1)[:, 0] < jnp.inf

        def pick(w):
            return jnp.take_along_axis(w, best[:, None], axis=1)[:, 0]

        b0, b1, b2 = pick(w0), pick(w1), pick(w2)
        zb = pick(zpix)
        izv = inv_z[best]                                 # (px, 3)
        # perspective-correct barycentrics
        pb = jnp.stack([b0 * izv[:, 0], b1 * izv[:, 1], b2 * izv[:, 2]], -1) * zb[:, None]

        def interp(attr_f):                               # (T, 3, d) -> (px, d)
            af = attr_f[best]                             # (px, 3, d)
            return jnp.einsum("pk,pkd->pd", pb, af)

        nrm = interp(nrm_f)
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        wpos = interp(pos_f)
        # per-pixel procedural texturing: ``albedo_fn`` maps interpolated
        # WORLD positions (px, 3) -> albedo (px, 3), giving true
        # sub-triangle texture frequency (the reference's cow carries a
        # texture image via pytorch3d TexturesUV, cowrendersynth.py:127-141;
        # here the texture is a function of the surface point instead of a
        # UV atlas — no asset download, same appearance richness)
        albedo = interp(col_f) if albedo_fn is None else albedo_fn(wpos)
        ldir = light_pos[None, :] - wpos
        ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-12)
        lam = jnp.maximum(jnp.sum(nrm * ldir, axis=-1), 0.0)
        shade = jnp.clip(albedo * (ambient + diffuse * lam[:, None]), 0.0, 1.0)
        rgb = jnp.where(hit[:, None], shade, 0.0)
        depth = jnp.where(hit, zb, jnp.inf)
        return rgb, hit.astype(jnp.float32), depth

    rgb, sil, depth = jax.lax.map(chunk_body, pts_p)
    rgb = rgb.reshape(-1, 3)[:n_px].reshape(res, res, 3)
    sil = sil.reshape(-1)[:n_px].reshape(res, res)
    depth = depth.reshape(-1)[:n_px].reshape(res, res)
    return rgb, sil, depth
