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
