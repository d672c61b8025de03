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


def adds_metric(verts: jnp.ndarray, R_gt, t_gt, R_est, t_est, chunk: int = 8192) -> jnp.ndarray:
    """Symmetric variant: mean NN distance from GT-posed verts to the
    estimated-posed cloud (inference.py:118-120 uses the baked surface
    cloud as the NN target; we use `verts` for both)."""
    hp = jax.lax.Precision.HIGHEST
    a = jnp.matmul(verts, jnp.swapaxes(R_gt, -1, -2), precision=hp) + t_gt
    b = jnp.matmul(verts, jnp.swapaxes(R_est, -1, -2), precision=hp) + t_est
    d, _ = nn_query(a, b, chunk=chunk)
    return d.mean()


def pose_correct(verts, R_gt, t_gt, R_est, t_est, diameter: float, symmetric: bool = False):
    m = adds_metric if symmetric else add_metric
    return m(verts, R_gt, t_gt, R_est, t_est) < 0.1 * diameter
