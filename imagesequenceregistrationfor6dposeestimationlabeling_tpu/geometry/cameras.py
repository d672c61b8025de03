"""Camera model and ray generation in pure JAX.

Replaces pytorch3d's ``PerspectiveCameras`` + ``NDCMultinomialRaysampler``
+ ``MonteCarloRaysampler`` (trainNerfFine.py:114-137, generateCors.py:136-139).

Conventions (matching the reference exactly so its artifacts transfer):

* BOP ground truth is OpenCV column convention:  ``x_cam = R x + t``,
  +x right, +y down, +z forward (nutil.py:129-138).
* The reference converts to a render convention by ``R' = R^T @ rot180_z``
  and ``t'[0:2] = -t[0:2]`` (trainNerfFine.py:91-94).  In that convention,
  world->camera for row vectors is ``x_cam = x_world @ R' + t'`` and the
  camera axes are +x left, +y up, +z forward.
* NDC for a square screen of S pixels:  ``x_ndc = 1 - 2*x_pix/S``,
  ``y_ndc = 1 - 2*y_pix/S`` (matches the loader's makeNDC math,
  cowrendersynth.py:725-732).  Pixel centers sit at ``x_pix = j + 0.5``.
* Ray "lengths" are camera-space z depths: directions are unnormalized
  with z_cam == 1 (pytorch3d unit_directions=False).
* GT image sampling uses grid coordinates ``g = -xy_ndc`` (the sign
  inversion of nutil.py:167-196).

All functions are batched over a leading camera dimension and jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import ROT180_Z


class Camera(NamedTuple):
    """Render-convention camera batch.

    R: (..., 3, 3) row-vector rotation (``x_cam = x_world @ R + T``)
    T: (..., 3)
    focal: (..., 2)  fx, fy in pixels
    principal: (..., 2)  px, py in pixels
    image_size: float  S (square screen)
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal: jnp.ndarray
    principal: jnp.ndarray
    image_size: jnp.ndarray

    def __getitem__(self, idx):
        return Camera(self.R[idx], self.T[idx], self.focal[idx], self.principal[idx], self.image_size)


class RayBundle(NamedTuple):
    """origins/directions: (..., 3); lengths: (..., P); xys: (..., 2) NDC."""

    origins: jnp.ndarray
    directions: jnp.ndarray
    lengths: jnp.ndarray
    xys: jnp.ndarray


def camera_from_bop(R_bop: jnp.ndarray, t_bop: jnp.ndarray, K: jnp.ndarray, image_size) -> Camera:
    """BOP (cam_R_m2c, cam_t_m2c, K) -> render convention.

    Mirrors trainNerfFine.py:91-94 plus the focal/principal extraction at
    trainNerfFine.py:255-258.  ``t_bop`` must already be divided by the
    diameter scale when used for NeRF training.
    """
    R = jnp.swapaxes(R_bop, -1, -2) @ ROT180_Z
    T = t_bop * jnp.asarray([-1.0, -1.0, 1.0])
    focal = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    principal = K[..., 0:2, 2]
    return Camera(R=R, T=T, focal=focal, principal=principal, image_size=jnp.asarray(image_size, jnp.float32))


def camera_center(cam: Camera) -> jnp.ndarray:
    """World-space camera origin:  C @ R + T = 0  =>  C = -T @ R^T."""
    return -jnp.einsum("...j,...ij->...i", cam.T, cam.R, precision=jax.lax.Precision.HIGHEST)


def pixel_to_ndc(xy_pix: jnp.ndarray, S) -> jnp.ndarray:
    return 1.0 - 2.0 * xy_pix / S


def ndc_to_pixel(xy_ndc: jnp.ndarray, S) -> jnp.ndarray:
    return (1.0 - xy_ndc) * S / 2.0


def ndc_directions(cam: Camera, xys_ndc: jnp.ndarray) -> jnp.ndarray:
    """World-space unnormalized ray directions with camera z == 1.

    In camera coords the pixel at NDC (x, y) sees direction
    ``((x - px_ndc)/fx_ndc, (y - py_ndc)/fy_ndc, 1)`` where
    ``f_ndc = 2 f / S`` and ``p_ndc = 1 - 2 p / S``.
    """
    S = cam.image_size
    f_ndc = 2.0 * cam.focal / S
    p_ndc = 1.0 - 2.0 * cam.principal / S
    # component-wise on purpose: the vectorized form
    # ``(xys - p_ndc[..., None, :]) / f_ndc[..., None, :]`` miscompiles on
    # the TPU backend when the camera math is fused into a larger program —
    # the (..., 1, 2) -> (..., N, 2) lane-2 broadcast reads one lane as
    # garbage and a whole direction component comes back inf (reproduced
    # on v5e/axon, EXPERIMENTS.md round 5 "entry NaN").  Per-component
    # (..., 1) broadcasts lower cleanly and are fp-identical ops.
    dx = (xys_ndc[..., 0] - p_ndc[..., 0:1]) / f_ndc[..., 0:1]
    dy = (xys_ndc[..., 1] - p_ndc[..., 1:2]) / f_ndc[..., 1:2]
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    # world dir: x_cam = x_world @ R  =>  x_world = x_cam @ R^T ... but for
    # directions (no translation):  d_world = d_cam @ R^T.
    return jnp.einsum("...nj,...ij->...ni", d_cam, cam.R, precision=jax.lax.Precision.HIGHEST)


def project_points(cam: Camera, pts_world: jnp.ndarray):
    """World points -> (xy_ndc, z_cam)."""
    x_cam = jnp.einsum("...nj,...ji->...ni", pts_world, cam.R, precision=jax.lax.Precision.HIGHEST) + cam.T[..., None, :]
    z = x_cam[..., 2]
    S = cam.image_size
    f_ndc = 2.0 * cam.focal / S
    p_ndc = 1.0 - 2.0 * cam.principal / S
    # component-wise for the same TPU lane-2 broadcast hazard as
    # ndc_directions above
    x = f_ndc[..., 0:1] * x_cam[..., 0] / z + p_ndc[..., 0:1]
    y = f_ndc[..., 1:2] * x_cam[..., 1] / z + p_ndc[..., 1:2]
    return jnp.stack([x, y], axis=-1), z


def grid_rays(cam: Camera, image_size: int, n_pts: int, min_depth, max_depth) -> RayBundle:
    """Full-image grid raysampler (NDCMultinomialRaysampler equivalent).

    Returns rays flattened over pixels, row-major (y outer, x inner), at
    pixel centers.  Shapes: (..., S*S, 3) / (..., S*S, P) / (..., S*S, 2).
    """
    S = image_size
    centers = (jnp.arange(S, dtype=jnp.float32) + 0.5)
    ndc_1d = 1.0 - 2.0 * centers / S
    yy, xx = jnp.meshgrid(ndc_1d, ndc_1d, indexing="ij")
    xys = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (S*S, 2)
    xys = jnp.broadcast_to(xys, cam.R.shape[:-2] + xys.shape)
    dirs = ndc_directions(cam, xys)
    origins = camera_center(cam)[..., None, :]
    origins = jnp.broadcast_to(origins, dirs.shape)
    lengths = jnp.linspace(min_depth, max_depth, n_pts).astype(jnp.float32)
    lengths = jnp.broadcast_to(lengths, dirs.shape[:-1] + (n_pts,))
    return RayBundle(origins=origins, directions=dirs, lengths=lengths, xys=xys)


def rays_at_pixels(cam: Camera, pix_idx: jnp.ndarray, image_size: int, n_pts: int, min_depth, max_depth) -> RayBundle:
    """Grid rays restricted to flat row-major pixel indices (the static-
    shape analog of the reference's maskRays silhouette restriction,
    pren.py:207-213): same pixel-center NDC convention as grid_rays."""
    S = image_size
    row = (pix_idx // S).astype(jnp.float32)
    col = (pix_idx % S).astype(jnp.float32)
    x = 1.0 - 2.0 * (col + 0.5) / S
    y = 1.0 - 2.0 * (row + 0.5) / S
    xys = jnp.stack([x, y], axis=-1)
    dirs = ndc_directions(cam, xys)
    origins = jnp.broadcast_to(camera_center(cam)[..., None, :], dirs.shape)
    lengths = jnp.linspace(min_depth, max_depth, n_pts).astype(jnp.float32)
    lengths = jnp.broadcast_to(lengths, dirs.shape[:-1] + (n_pts,))
    return RayBundle(origins=origins, directions=dirs, lengths=lengths, xys=xys)


def monte_carlo_rays(
    cam: Camera,
    n_rays: int,
    n_pts: int,
    min_depth,
    max_depth,
    key: jax.Array,
    stratified: bool = True,
) -> RayBundle:
    """MonteCarloRaysampler equivalent: uniform xys in [-1, 1]^2 per camera,
    stratified jittered depths (trainNerfFine.py:133-136)."""
    batch_shape = cam.R.shape[:-2]
    k_xy, k_z = jax.random.split(key)
    xys = jax.random.uniform(k_xy, batch_shape + (n_rays, 2), minval=-1.0, maxval=1.0)
    dirs = ndc_directions(cam, xys)
    origins = jnp.broadcast_to(camera_center(cam)[..., None, :], dirs.shape)
    edges = jnp.linspace(min_depth, max_depth, n_pts + 1).astype(jnp.float32)
    lo, hi = edges[:-1], edges[1:]
    if stratified:
        u = jax.random.uniform(k_z, batch_shape + (n_rays, n_pts))
    else:
        u = 0.5
    lengths = lo + (hi - lo) * u
    lengths = jnp.broadcast_to(lengths, dirs.shape[:-1] + (n_pts,))
    return RayBundle(origins=origins, directions=dirs, lengths=lengths, xys=xys)


def ray_points(bundle: RayBundle) -> jnp.ndarray:
    """(..., P, 3) world points: o + d * length (ray_bundle_to_ray_points)."""
    return bundle.origins[..., None, :] + bundle.directions[..., None, :] * bundle.lengths[..., :, None]


def crop_K(K: jnp.ndarray, x2, y2, hs1, hw, hh, square_size, max_b) -> jnp.ndarray:
    """Bounding-box crop + resize K fixup (cowrendersynth.py:717-723).

    ``x2, y2`` top-left of bbox; ``hs1`` half size of padded square;
    ``hw, hh`` half bbox width/height; ``square_size`` the padded square's
    edge; ``max_b`` the final resized size.
    """
    K = K.astype(jnp.float32)
    scale = max_b / square_size
    K = K.at[..., 0, 2].add(-x2 + hs1 - hw)
    K = K.at[..., 1, 2].add(-y2 + hs1 - hh)
    K = K * scale
    K = K.at[..., 2, 2].set(1.0)
    return K


def surfemb_crop_M(x, y, w, h, crop_res: int = 224, pad: float = 1.2):
    """SurfEmb-style affine crop (inference.py:215-221): returns the 2x3
    affine M mapping full-image pixels to the crop, and the 3x3 Ms."""
    center_x = x + w / 2.0
    center_y = y + h / 2.0
    size = crop_res / max(w, h) / pad
    M = jnp.asarray(
        [
            [size, 0.0, -center_x * size + crop_res / 2.0],
            [0.0, size, -center_y * size + crop_res / 2.0],
        ],
        dtype=jnp.float32,
    )
    Ms = jnp.concatenate([M, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    return M, Ms


def downsample_K(K: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Pixel-center-correct K downsample (inference.py:261-263)."""
    K = K.astype(jnp.float32)
    K = K.at[0:2, 2].add(0.5)
    K = K.at[0:2].divide(factor)
    K = K.at[0:2, 2].add(-0.5)
    return K
