"""High-level volumetric rendering entry points.

TPU-first redesign of ``ImplicitRendererStratified`` (pren.py:41-253,
pren2.py, prenBack.py): instead of renderer objects with frozen-ray state,
these are pure jittable functions over fixed-shape ray bundles.  Mask-
restricted rays (pren.py:207-213) are handled by *sampling a fixed number
of rays inside the mask* (pad-and-mask discipline) rather than dynamic
filtering.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.cameras import (
    Camera,
    RayBundle,
    grid_rays,
    monte_carlo_rays,
    ray_points,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch


def render_bundle(
    field_fn: Callable,
    bundle: RayBundle,
    mode: str = "color",
    threshold_mode: bool = False,
    weight_mode: bool = False,
    threshold: float = 0.03,
    eps: float = 1e-10,
):
    """Evaluate the field along rays and EA-composite.

    field_fn(points, view_dirs, mode) -> (densities (..., P, 1), feats).
    Returns (images (..., C+1), weights (..., P)).
    """
    pts = ray_points(bundle)
    dens, feats = field_fn(pts, bundle.directions, mode)
    return raymarch.composite(
        dens[..., 0],
        feats,
        eps=eps,
        threshold_mode=threshold_mode,
        weight_mode=weight_mode,
        threshold=threshold,
    )


def render_coarse_fine(
    coarse_fn: Callable,
    fine_fn: Callable,
    cam: Camera,
    key: jax.Array,
    n_rays: int,
    n_pts_coarse: int,
    n_pts_fine: int,
    min_depth,
    max_depth,
    add_input_samples: bool = True,
):
    """The trainNerfFine hot path (trainNerfFine.py:288-300):

    * coarse model on stratified MC rays (64 pts),
    * fine model on importance-resampled depths (256 new + 64 input, sorted),
      driven by the *detached* coarse weights.

    Returns (coarse images, fine images, ray xys) where images are rgb+sil.
    """
    k_rays, k_pdf = jax.random.split(key)
    bundle = monte_carlo_rays(cam, n_rays, n_pts_coarse, min_depth, max_depth, k_rays)
    coarse_img, coarse_w = render_bundle(coarse_fn, bundle, mode="color")
    z_fine = raymarch.importance_resample(
        bundle.lengths,
        jax.lax.stop_gradient(coarse_w),
        n_pts_fine,
        k_pdf,
        det=False,
        add_input_samples=add_input_samples,
    )
    fine_bundle = bundle._replace(lengths=z_fine)
    fine_img, _ = render_bundle(fine_fn, fine_bundle, mode="color")
    return coarse_img, fine_img, bundle.xys


def freeze_fine_bundle(
    coarse_fn: Callable,
    cam: Camera,
    key: jax.Array,
    n_rays: int,
    n_pts_coarse: int,
    n_pts_fine: int,
    min_depth,
    max_depth,
    add_input_samples: bool = True,
) -> RayBundle:
    """The ``rayFreeze`` knob (pren.py:127-129, 200-239) made functional.

    The reference's stateful renderer samples rays + importance-resamples
    once on the first call, stores them as ``self.frozenRays`` and reuses
    the stored bundle on every later call (skipping the raysampler and the
    coarse pass).  The JAX equivalent is explicit: call this once to get
    the frozen bundle (coarse pass under stop_gradient, exactly the
    reference's ``torch.no_grad`` at pren.py:203), then re-feed it to
    ``render_bundle`` for each subsequent render.
    """
    k_rays, k_pdf = jax.random.split(key)
    bundle = monte_carlo_rays(cam, n_rays, n_pts_coarse, min_depth, max_depth, k_rays)
    _, coarse_w = render_bundle(
        lambda p, d, m: jax.tree.map(jax.lax.stop_gradient, coarse_fn(p, d, m)),
        bundle, mode="color",
    )
    z_fine = raymarch.importance_resample(
        bundle.lengths, coarse_w, n_pts_fine, k_pdf,
        det=False, add_input_samples=add_input_samples,
    )
    return bundle._replace(lengths=z_fine)


def masked_ray_indices(silhouette: jnp.ndarray, n_rays: int, key: jax.Array):
    """Sample a fixed number of pixel indices inside a silhouette.

    Replaces the dynamic `maskRays` filtering (pren.py:207-213) with a
    static-shape choice: rays are drawn (with replacement when the mask is
    small) proportional to the mask.
    """
    flat = silhouette.reshape(-1)
    logits = jnp.where(flat > 0.5, 0.0, -1e9)
    return jax.random.categorical(key, logits, shape=(n_rays,))


def render_grid_chunked(
    field_fn: Callable,
    cam: Camera,
    image_size: int,
    n_pts: int,
    min_depth,
    max_depth,
    mode: str = "feature",
    threshold_mode: bool = True,
    threshold: float = 0.2,
    chunk: int = 32768,
):
    """Full-image grid render (one camera), chunked over rays so the
    (S*S, P, 360) activations never exceed VMEM/HBM budgets.

    Returns (images (S*S, C+1), weights (S*S, P), bundle).
    Equivalent to renderer_grid + batched_forward (generateCors.py:300-304).
    """
    bundle = grid_rays(cam, image_size, n_pts, min_depth, max_depth)
    images, weights = render_rays_chunked(
        field_fn, bundle, mode=mode, threshold_mode=threshold_mode,
        threshold=threshold, chunk=chunk,
    )
    return images, weights, bundle


def render_rays_chunked(
    field_fn: Callable,
    bundle: RayBundle,
    mode: str = "feature",
    threshold_mode: bool = True,
    threshold: float = 0.2,
    chunk: int = 32768,
):
    """Chunked EA render of an arbitrary flat ray bundle (N rays).
    Returns (images (N, C+1), weights (N, P))."""
    n = bundle.origins.shape[0]
    n_pts = bundle.lengths.shape[-1]
    pad = (-n) % chunk
    o = jnp.pad(bundle.origins, ((0, pad), (0, 0)))
    d = jnp.pad(bundle.directions, ((0, pad), (0, 0)))
    l = jnp.pad(bundle.lengths, ((0, pad), (0, 0)))

    def body(args):
        o_c, d_c, l_c = args
        pts = o_c[:, None, :] + d_c[:, None, :] * l_c[:, :, None]
        dens, feats = field_fn(pts, d_c, mode)
        return raymarch.composite(
            dens[..., 0], feats, threshold_mode=threshold_mode, threshold=threshold
        )

    n_chunks = (n + pad) // chunk
    o = o.reshape(n_chunks, chunk, 3)
    d = d.reshape(n_chunks, chunk, 3)
    l = l.reshape(n_chunks, chunk, n_pts)
    images, weights = jax.lax.map(body, (o, d, l))
    images = images.reshape(n_chunks * chunk, -1)[:n]
    weights = weights.reshape(n_chunks * chunk, -1)[:n]
    return images, weights


def render_depth(bundle: RayBundle, weights: jnp.ndarray) -> jnp.ndarray:
    """Per-ray depth from EA weights — the depth-map output branch of the
    back-face renderer (prenBack.py:256-270)."""
    return raymarch.surface_depth(bundle.lengths, weights)


def back_ray_bundle(front_bundle: RayBundle, front_hits: jnp.ndarray, div: float = 3.0) -> RayBundle:
    """Back rays (generateCors.py:323-329): origin = front surface hit,
    direction = -normalize(camera origin), lengths = (l - l0)/div."""
    o = front_bundle.origins
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    lengths = (front_bundle.lengths - front_bundle.lengths[..., 0:1]) / div
    return RayBundle(origins=front_hits, directions=d, lengths=lengths, xys=front_bundle.xys)


import functools as _functools


@_functools.lru_cache(maxsize=16)
def _density_grid_fn(field, grid_res: int, chunk: int):
    """One cached jitted program per (field, grid_res): callers used to
    re-jit a params-closure per call, re-tracing the chunked lax.map every
    time (seconds of host time on a 1-CPU box)."""

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel

    def run(params):
        # fused density kernel on TPU when the field is kernel-configured
        # (the 128^3 grid is 2.1M pure density evals, nerf.py:676-687)
        return density_grid(
            field_kernel.density_eval_fn(field, params),
            grid_res=grid_res, chunk=chunk,
        )

    return jax.jit(run)


def density_grid_cached(field, params, grid_res: int = 128, chunk: int = 262144) -> jnp.ndarray:
    """``density_grid`` of a NerfField's density head, trace-cached."""
    return _density_grid_fn(field, grid_res, chunk)(params)


def density_grid(field_density_fn: Callable, grid_res: int = 128, chunk: int = 262144) -> jnp.ndarray:
    """Evaluate density on a grid_res^3 grid over [-1, 1]^3.

    Returns D with D[i, j, k] = density at (x=t[i], y=t[j], z=t[k]) so that
    marching-cubes vertex coordinates come out in (x, y, z) index order
    (the reference achieves the same with a movedim dance, nerf.py:676-700;
    vertices are then mapped to world coords via (v - 64) / 64).
    """
    t = jnp.linspace(-1.0, 1.0, grid_res)
    xx, yy, zz = jnp.meshgrid(t, t, t, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)

    def body(p):
        return field_density_fn(p)[..., 0]

    n = pts.shape[0]
    n_chunks = n // chunk if n % chunk == 0 else n // chunk + 1
    pad = n_chunks * chunk - n
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    dens = jax.lax.map(body, pts.reshape(n_chunks, chunk, 3))
    return dens.reshape(-1)[:n].reshape(grid_res, grid_res, grid_res)
