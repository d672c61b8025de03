"""Procedural mesh scene — the reference's synthetic "cow" data path.

The reference generates a no-download synthetic dataset by rasterizing a
textured cow mesh with pytorch3d's MeshRenderer (cowrendersynth.py:31-179:
FoVPerspectiveCameras + SoftPhongShader RGB pass, :143-178; silhouette pass
:1300-1334; `generate_cow_renders(WithRT)` :1189-1336 returns images,
silhouettes and per-view cameras).  This module fills the same role
TPU-natively: a procedural asymmetric blob mesh (icosphere with a radial
deformation — no asset download) rendered by `ops.rasterize.render_mesh`
(z-buffered triangles + Lambertian point light) for N views on a sphere,
returning the same (images, sils, R_bop, t_bop, K) convention the BOP
loaders produce, so the whole pipeline runs on mesh-rendered data too.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import mcubes, rasterize


def icosphere(subdivisions: int = 3):
    """Unit icosphere: (V, 3) float32 verts, (T, 3) int32 faces."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    for _ in range(subdivisions):
        edge_mid = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(i, j):
            k = (min(i, j), max(i, j))
            if k not in edge_mid:
                m = verts_list[i] + verts_list[j]
                m /= np.linalg.norm(m)
                edge_mid[k] = len(verts_list)
                verts_list.append(m)
            return edge_mid[k]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)
    return verts.astype(np.float32), faces.astype(np.int32)


def blob_mesh(subdivisions: int = 3):
    """Asymmetric blob (the cow stand-in): icosphere with a smooth radial
    deformation, per-vertex NOCS-style albedo, area-weighted normals."""
    verts, faces = icosphere(subdivisions)
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    r = 1.0 + 0.18 * np.sin(3.0 * x) * np.cos(2.0 * y) + 0.12 * np.sin(2.5 * z + 0.7)
    # scale to the analytic object's footprint (~0.6 radius) so the default
    # cameras (f = 2.1*S, dist 4) frame it like the rest of the pipeline
    verts = verts * (0.5 * r[:, None])
    normals = mcubes.vertex_normals(verts.astype(np.float64), faces).astype(np.float32)
    span = verts.max(0) - verts.min(0)
    colors = (verts - verts.min(0)) / np.maximum(span, 1e-6)  # NOCS-ish albedo
    return verts.astype(np.float32), faces, colors.astype(np.float32), normals


def procedural_albedo(p: jnp.ndarray) -> jnp.ndarray:
    """High-frequency procedural albedo for surface points (px, 3) -> (px, 3).

    Multi-octave phase-warped sinusoids ("marble") mixed with a rotated
    checker — deterministic, non-repeating at the object scale (~0.6
    radius: frequencies 9-40 rad/unit give ~5-20 px features at the
    default 224^2 / f=2.1S framing).  Fills the role of the reference
    cow's texture image (cowrendersynth.py:127-141) for the texture-
    anchoring hypothesis (EXPERIMENTS.md round-4: texture-rich surfaces
    plausibly anchor descriptors that our flat-shaded scene cannot).
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    warp = 0.35 * jnp.sin(9.0 * y + 2.0 * jnp.cos(7.0 * z))
    m1 = jnp.sin(14.0 * x + 3.0 * jnp.sin(11.0 * y) + warp)
    m2 = jnp.sin(17.0 * (y + 0.6 * z) + 2.0 * jnp.cos(13.0 * x))
    # soft checker in a rotated frame (sharp edges = localizable features)
    u = 0.8 * x + 0.6 * z
    v = 0.8 * y - 0.6 * z
    checker = jnp.tanh(6.0 * jnp.sin(20.0 * u) * jnp.sin(20.0 * v))
    r = 0.55 + 0.30 * m1 + 0.12 * checker
    g = 0.50 + 0.28 * m2 - 0.10 * checker
    b = 0.45 + 0.22 * jnp.sin(26.0 * z + 2.0 * m1) + 0.08 * m2
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.02, 1.0)


class MeshScene(NamedTuple):
    images: np.ndarray     # (N, S, S, 3) float32 in [0, 1]
    sils: np.ndarray       # (N, S, S) float32 in {0, 1}
    depths: np.ndarray     # (N, S, S) float32, +inf at misses
    R_bop: np.ndarray
    t_bop: np.ndarray
    K: np.ndarray
    verts: np.ndarray
    faces: np.ndarray
    diameter: float


def make_mesh_scene(
    n_views: int = 8,
    image_size: int = 64,
    key=None,
    subdivisions: int = 3,
    dist: float = 4.0,
    textured: bool = False,
) -> MeshScene:
    """generate_cow_renders(WithRT) equivalent (cowrendersynth.py:1189-1336):
    N rasterized views + silhouettes + BOP-convention poses/intrinsics."""
    if key is None:
        key = jax.random.PRNGKey(0)
    S = image_size
    verts, faces, colors, normals = blob_mesh(subdivisions)
    R_bop, t_bop = synthetic.random_bop_poses(n_views, key, dist=dist)
    K = np.broadcast_to(
        np.asarray(
            [[2.1 * S, 0.0, S / 2.0], [0.0, 2.1 * S, S / 2.0], [0.0, 0.0, 1.0]],
            np.float32,
        ),
        (n_views, 3, 3),
    ).copy()
    cams = jax.device_get(
        cam_lib.camera_from_bop(jnp.asarray(R_bop), jnp.asarray(t_bop), jnp.asarray(K), S)
    )

    v_j = jnp.asarray(verts)
    f_j = jnp.asarray(faces)
    c_j = jnp.asarray(colors)
    n_j = jnp.asarray(normals)
    albedo_fn = procedural_albedo if textured else None

    # ALL views of a group render inside ONE jitted program (lax.map over
    # the view axis).  A per-view Python loop costs ~6 eager dispatches per
    # view (camera-bank slicing + the render call) at ~40-90 ms relay
    # round-trip each — tens of minutes at 1280 views, hours when the
    # relay throttles.  Camera slicing stays host-side numpy; groups bound
    # the fetched result and reuse one compiled shape.
    @jax.jit
    def render_group(Rg, Tg, fg, pg):
        def one(args):
            R1, T1, f1, p1 = args
            return rasterize.render_mesh(
                v_j, f_j, c_j, n_j, cam_lib.Camera(R1, T1, f1, p1, S), S,
                albedo_fn=albedo_fn,
            )
        return jax.lax.map(one, (Rg, Tg, fg, pg))

    group = min(32, n_views)
    imgs, sils, depths = [], [], []
    for b0 in range(0, n_views, group):
        sel = np.arange(b0, min(b0 + group, n_views))
        if len(sel) < group:  # pad the tail to the compiled shape
            sel = np.concatenate([sel, np.repeat(sel[-1:], group - len(sel))])
        rgb, sil, depth = jax.device_get(render_group(
            cams.R[sel], cams.T[sel], cams.focal[sel], cams.principal[sel]
        ))
        real = min(b0 + group, n_views) - b0
        imgs.append(rgb[:real])
        sils.append(sil[:real])
        depths.append(depth[:real])
    imgs = np.concatenate(imgs)
    sils = np.concatenate(sils)
    depths = np.concatenate(depths)

    diffs = verts.max(0) - verts.min(0)
    diameter = float(np.linalg.norm(diffs))
    return MeshScene(
        imgs, sils, depths,
        np.asarray(R_bop), np.asarray(t_bop), K,
        verts, faces, diameter,
    )
