"""Monte-Carlo surface-hit sampling over all training views.

Shared by the negative-key build (trainPose.py:315-353) and feature baking
(genFeat.py:160-216): render mask-restricted MC rays with thresholded EA
weights and keep the per-ray surface hit o + d * argmax(w * l).

TPU design: one jitted function per (camera, loop) slice with a *fixed*
ray count; silhouette restriction is a categorical draw over mask pixels
instead of dynamic filtering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch


@functools.partial(jax.jit, static_argnames=("field", "n_rays", "n_pts", "image_size"))
def _hits_one_view(
    field,
    params,
    cam: cam_lib.Camera,
    sil: jnp.ndarray,
    key: jax.Array,
    n_rays: int,
    n_pts: int,
    image_size: int,
    min_depth: float,
    max_depth: float,
    threshold: float,
):
    S = image_size
    k_pix, k_jit, k_z = jax.random.split(key, 3)
    flat = sil.reshape(-1)
    logits = jnp.where(flat > 0.5, 0.0, -1e9)
    pix = jax.random.categorical(k_pix, logits, shape=(n_rays,))
    py = (pix // S).astype(jnp.float32)
    px = (pix % S).astype(jnp.float32)
    jitter = jax.random.uniform(k_jit, (n_rays, 2))
    xy_pix = jnp.stack([px, py], -1) + jitter
    xys = cam_lib.pixel_to_ndc(xy_pix, S)
    dirs = cam_lib.ndc_directions(cam, xys)
    origins = jnp.broadcast_to(cam_lib.camera_center(cam)[None, :], dirs.shape)
    edges = jnp.linspace(min_depth, max_depth, n_pts + 1)
    u = jax.random.uniform(k_z, (n_rays, n_pts))
    lengths = edges[:-1] + (edges[1:] - edges[:-1]) * u
    pts = origins[:, None, :] + dirs[:, None, :] * lengths[:, :, None]
    dens = field_kernel.density_eval_fn(field, params)(pts)[..., 0]
    dens = raymarch.threshold_densities(dens, threshold)
    w = raymarch.ea_weights(dens)
    hits = raymarch.surface_points(origins, dirs, lengths, w)
    valid = (flat[pix] > 0.5) & (w.sum(-1) > 0)
    return hits, valid, xys


@functools.partial(jax.jit, static_argnames=("field", "n_rays", "n_pts", "image_size"))
def _hits_all_views(
    field,
    params,
    cam_all: cam_lib.Camera,
    sils: jnp.ndarray,
    keys: jax.Array,
    n_rays: int,
    n_pts: int,
    image_size: int,
    min_depth: float,
    max_depth: float,
    threshold: float,
):
    """One pass of every view in a SINGLE program (vmap over cameras).

    The per-view Python loop this replaces cost one ~40-90 ms relay
    dispatch per (loop, view) — 19 loops x 256 views was ~410 s of pure
    dispatch in feature baking; now it is `n_loops` dispatches total."""

    def one(cam, sil, key):
        return _hits_one_view(
            field, params, cam, sil, key, n_rays, n_pts, image_size,
            min_depth, max_depth, threshold,
        )

    cam_axes = cam_lib.Camera(0, 0, 0, 0, None)
    return jax.vmap(one, in_axes=(cam_axes, 0, 0))(cam_all, sils, keys)


def sample_surface_hits(
    field,
    params,
    R_bop,
    t_bop,
    K,
    sils,
    n_loops: int,
    rays_per_image: int,
    image_size: int,
    n_pts: int = 128,
    threshold: float = 0.2,
    depth_margin: float = 2.0,
    seed: int = 0,
):
    """Collect surface hits over `n_loops` passes of all views.

    Returns (hits (M, 3) np.ndarray) with invalid rays already dropped.
    """
    S = image_size
    cam_all = cam_lib.camera_from_bop(jnp.asarray(R_bop), jnp.asarray(t_bop), jnp.asarray(K), S)
    z = np.abs(np.asarray(t_bop)[:, 2])
    min_d, max_d = float(z.min() - depth_margin), float(z.max() + depth_margin)
    n_views = np.asarray(R_bop).shape[0]
    sils_j = jnp.asarray(sils)
    key = jax.random.PRNGKey(seed)
    outs = []
    for loop in range(n_loops):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n_views)
        hits, valid, _ = _hits_all_views(
            field, params, cam_all, sils_j, keys,
            rays_per_image, n_pts, S, min_d, max_d, threshold,
        )
        # async dispatch: queue every loop's program, fetch once below —
        # a per-loop np.asarray would sync 2 x n_loops relay round-trips
        outs.append((hits, valid))
    if not outs:
        return np.zeros((0, 3), np.float32)
    outs = jax.device_get(outs)
    all_hits = [h.reshape(-1, 3)[v.reshape(-1)] for h, v in outs]
    return np.concatenate(all_hits, axis=0)
