"""Synthetic BOP-like scenes for tests and benchmarks.

The reference ships only empty placeholder zips under bop/ (SURVEY.md §0);
real data must be downloaded.  This module renders an *analytic* object
(blobby union of colored spheres — asymmetric so pose is well-defined)
through the same camera model the pipeline uses, producing images,
silhouettes and BOP-convention (R, t, K) exactly like
``generate_bop_realsamples`` (cowrendersynth.py:610-747) would.

Because the object is analytic we also get exact surface points and
ground-truth poses, enabling closed-loop tests of every stage:
NeRF fit -> correspondences -> descriptors -> PnP -> ICP -> Chamfer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import rotvec_to_matrix
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch


# Blob centers/radii/colors: deliberately asymmetric.
_CENTERS = jnp.asarray(
    [
        [0.0, 0.0, 0.0],
        [0.45, 0.1, 0.0],
        [-0.15, 0.42, 0.12],
        [0.0, -0.2, -0.45],
    ]
)
_RADII = jnp.asarray([0.45, 0.28, 0.22, 0.25])
_COLORS = jnp.asarray(
    [
        [0.9, 0.2, 0.1],
        [0.1, 0.8, 0.2],
        [0.2, 0.3, 0.9],
        [0.9, 0.8, 0.1],
    ]
)
# Sharp transition so the 0.05 and 0.5 density levels are within ~0.04 of
# each other (a trained NeRF's surface shell is similarly thin; the
# pipeline's mesh filters assume this).
_SHARPNESS = 80.0


def analytic_density(pts: jnp.ndarray) -> jnp.ndarray:
    """Soft union-of-spheres opacity in [0, 1), (..., 3) -> (..., 1)."""
    d = jnp.linalg.norm(pts[..., None, :] - _CENTERS, axis=-1) - _RADII  # (..., K)
    sdf = jnp.min(d, axis=-1)
    return jax.nn.sigmoid(-_SHARPNESS * sdf)[..., None]


def analytic_color(pts: jnp.ndarray) -> jnp.ndarray:
    """Per-point color = softmin-weighted blob colors + positional shading."""
    d = jnp.linalg.norm(pts[..., None, :] - _CENTERS, axis=-1) - _RADII
    w = jax.nn.softmax(-12.0 * d, axis=-1)
    base = w @ _COLORS
    shade = 0.25 * jnp.sin(6.0 * pts) + 0.75
    return jnp.clip(base * shade, 0.0, 1.0)


def analytic_field(pts, view_dirs=None, mode: str = "color"):
    """Field-function signature compatible with render.renderer."""
    dens = analytic_density(pts)
    if mode == "feature":
        feats = jnp.concatenate([analytic_color(pts), jnp.zeros(pts.shape[:-1] + (9,))], axis=-1)
    else:
        feats = analytic_color(pts)
    return dens, feats


def analytic_surface_points(n: int, key: jax.Array) -> jnp.ndarray:
    """Points close to the 0.5-opacity isosurface, via sphere sampling +
    rejection to the closest blob surface."""
    k1, k2 = jax.random.split(key)
    which = jax.random.randint(k1, (n,), 0, _CENTERS.shape[0])
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pts = _CENTERS[which] + d * _RADII[which][:, None]
    # keep only points on the outer surface (not inside another blob)
    dist = jnp.linalg.norm(pts[:, None, :] - _CENTERS, axis=-1) - _RADII
    outside_others = jnp.min(dist, axis=-1) > -1e-3
    return pts, outside_others


def analytic_features(pts: jnp.ndarray) -> jnp.ndarray:
    """A deterministic, injective 12-d 'descriptor' of position: color +
    the (scaled) coordinates themselves + low-frequency waves.  The linear
    coordinate block guarantees distinct surface points get distinct keys
    (no aliasing), so correspondence matching is testable without training."""
    c = analytic_color(pts)
    waves = jnp.concatenate([jnp.sin(2.1 * pts), jnp.cos(1.3 * pts)], axis=-1)
    f = jnp.concatenate([c, 2.0 * pts, waves], axis=-1)
    # Unit-normalize (x3): correspondence uses dot-product argmax
    # (inference.py:142-149), which is only meaningful for keys of equal
    # norm — InfoNCE training produces exactly that structure.
    return 3.0 * f / jnp.linalg.norm(f, axis=-1, keepdims=True)


class AnalyticField:
    """Duck-typed stand-in for models.fields.NerfField backed by the
    analytic scene — lets every pipeline stage be tested without training.

    Matches the flax calling convention: ``apply(params, ...)`` plus
    ``method=`` bound-method dispatch.
    """

    def density(self, pts):
        return analytic_density(pts)

    def features(self, pts):
        return analytic_features(pts)

    def custom_forward(self, pts):
        f = analytic_features(pts)
        return jnp.concatenate([f, jnp.zeros_like(f[..., :1])], axis=-1)

    def __call__(self, pts, view_dirs=None, mode="color"):
        dens = analytic_density(pts)
        if mode == "feature":
            return dens, analytic_features(pts)
        if mode == "color":
            return dens, analytic_color(pts)
        return dens, jnp.concatenate([analytic_color(pts), analytic_features(pts)], axis=-1)

    def apply(self, params, *args, method=None, **kwargs):
        if method is not None:
            return method(*args, **kwargs)
        return self(*args, **kwargs)


class SyntheticScene(NamedTuple):
    images: jnp.ndarray       # (N, S, S, 3) in [0, 1]
    sils: jnp.ndarray         # (N, S, S)
    R_bop: jnp.ndarray        # (N, 3, 3) OpenCV column convention
    t_bop: jnp.ndarray        # (N, 3)  already in normalized world units
    K: jnp.ndarray            # (N, 3, 3)
    diameter: float           # object diameter in world units


def random_bop_poses(n_views: int, key: jax.Array, dist: float = 4.0):
    """Cameras on a sphere of radius `dist` looking at the origin, with the
    OpenCV convention (z forward)."""
    k1, k2, k3 = jax.random.split(key, 3)
    # uniformly distributed view directions
    z = jax.random.uniform(k1, (n_views,), minval=-0.95, maxval=0.95)
    phi = jax.random.uniform(k2, (n_views,), minval=0.0, maxval=2 * jnp.pi)
    r = jnp.sqrt(1 - z**2)
    eye = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1) * dist
    # camera z-axis points from eye to origin
    fwd = -eye / jnp.linalg.norm(eye, axis=-1, keepdims=True)
    up0 = jnp.where(jnp.abs(fwd[:, 2:3]) > 0.9, jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0]))
    right = jnp.cross(fwd, up0)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    down = jnp.cross(fwd, right)
    # rows of R are camera axes (x right, y down, z forward): x_cam = R x + t
    R = jnp.stack([right, down, fwd], axis=-2)
    # small random roll for variety
    roll = jax.random.uniform(k3, (n_views,), minval=-0.3, maxval=0.3)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    zero = jnp.zeros_like(cr)
    one = jnp.ones_like(cr)
    Rz = jnp.stack(
        [
            jnp.stack([cr, -sr, zero], -1),
            jnp.stack([sr, cr, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )
    R = Rz @ R
    t = -jnp.einsum("nij,nj->ni", R, eye)
    return R, t


def make_scene(
    n_views: int = 16,
    image_size: int = 64,
    key: jax.Array | None = None,
    n_pts_per_ray: int = 96,
    dist: float = 4.0,
    chunk_pixels: int = 4096,
) -> SyntheticScene:
    key = key if key is not None else jax.random.PRNGKey(0)
    R_bop, t_bop = random_bop_poses(n_views, key, dist)
    S = image_size
    # Focal chosen so the object fills most of the frame, matching the
    # reference's tight SurfEmb crops (size = 224/max(w,h)/1.2).
    f = 2.1 * S
    K = jnp.broadcast_to(
        jnp.asarray([[f, 0.0, S / 2], [0.0, f, S / 2], [0.0, 0.0, 1.0]]), (n_views, 3, 3)
    )
    cam = cam_lib.camera_from_bop(R_bop, t_bop, K, S)
    min_depth = dist - 1.5
    max_depth = dist + 1.5

    def render_one(args):
        R, T, focal, principal = args
        cam_one = cam_lib.Camera(R, T, focal, principal, cam.image_size)
        bundle = cam_lib.grid_rays(cam_one, S, n_pts_per_ray, min_depth, max_depth)
        pts = cam_lib.ray_points(bundle)
        dens = analytic_density(pts)[..., 0]
        cols = analytic_color(pts)
        img, w = raymarch.composite(dens, cols)
        rgb = img[..., :3].reshape(S, S, 3)
        sil = (img[..., 3] > 0.5).astype(jnp.float32).reshape(S, S)
        return rgb * sil[..., None], sil

    images, sils = jax.lax.map(render_one, (cam.R, cam.T, cam.focal, cam.principal))
    # object diameter: max blob extent * 2 (analytic)
    extent = np.asarray(jnp.linalg.norm(_CENTERS, axis=-1) + _RADII)
    diameter = float(2 * extent.max())
    return SyntheticScene(images, sils, R_bop, t_bop, K, diameter)
