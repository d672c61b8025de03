"""Pose-quality metrics: ADD / ADD-S (inference.py:116-121) and the
0.1 * diameter correctness criterion (README.md:21)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.pointcloud import nn_query


def add_metric(verts: jnp.ndarray, R_gt, t_gt, R_est, t_est) -> jnp.ndarray:
    """Mean vertex distance under the two poses (column convention)."""
    hp = jax.lax.Precision.HIGHEST
    a = jnp.matmul(verts, jnp.swapaxes(R_gt, -1, -2), precision=hp) + t_gt
    b = jnp.matmul(verts, jnp.swapaxes(R_est, -1, -2), precision=hp) + t_est
    return jnp.linalg.norm(a - b, axis=-1).mean()


def adds_metric(
    verts: jnp.ndarray, R_gt, t_gt, R_est, t_est,
    surface_points: jnp.ndarray | None = None, chunk: int = 8192,
) -> jnp.ndarray:
    """Symmetric variant: mean NN distance from GT-posed ``verts`` to the
    estimated-posed NN target cloud.  The reference NN-targets the BAKED
    surface cloud (``surfacePointsScaled``, inference.py:118-120); pass it
    as ``surface_points`` for strict parity.  When omitted, ``verts``
    doubles as the target — equivalent for dense clouds."""
    hp = jax.lax.Precision.HIGHEST
    if surface_points is None:
        surface_points = verts
    a = jnp.matmul(verts, jnp.swapaxes(R_gt, -1, -2), precision=hp) + t_gt
    b = jnp.matmul(surface_points, jnp.swapaxes(R_est, -1, -2), precision=hp) + t_est
    d, _ = nn_query(a, b, chunk=chunk)
    return d.mean()


def pose_correct(verts, R_gt, t_gt, R_est, t_est, diameter: float, symmetric: bool = False,
                 surface_points=None):
    if symmetric:
        m = adds_metric(verts, R_gt, t_gt, R_est, t_est, surface_points=surface_points)
    else:
        m = add_metric(verts, R_gt, t_gt, R_est, t_est)
    return m < 0.1 * diameter
