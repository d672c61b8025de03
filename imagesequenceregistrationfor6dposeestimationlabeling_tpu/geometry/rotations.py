"""SO(3)/SE(3) utilities in pure JAX.

Replaces the reference's OpenCV ``Rodrigues`` (inference.py:128,
pose_refine.py:7-18), scipy ``Rotation.from_rotvec`` (poseEstSurf.py:144),
and numpy euler helper (nutil.py:111-127).  Everything is batched /
vmappable and differentiable (the exp-map Jacobian comes from ``jax.grad``
instead of OpenCV's hand-coded Jacobian).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def rotvec_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exp-map, (..., 3) -> (..., 3, 3).

    Uses the Taylor-safe form so it is differentiable at the identity.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]
    K = hat(rvec)
    K2 = K @ K
    small = theta2 < 1e-12
    # double-where so sqrt(0) never enters the backward pass (NaN grads)
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a * K + b * K2


def matrix_to_rotvec(R: jnp.ndarray) -> jnp.ndarray:
    """Log-map, (..., 3, 3) -> (..., 3).  Safe near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # antisymmetric part
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale_generic = theta / jnp.maximum(2.0 * sin_theta, 1e-12)
    scale_small = 0.5 + theta * theta / 12.0
    near_pi = theta > (jnp.pi - 1e-3)
    scale = jnp.where(theta < 1e-4, scale_small, scale_generic)
    generic = w * scale[..., None]

    # Near pi: axis from the diagonal of (R + I)/2 = aa^T ... cos term
    A = (R + jnp.eye(3, dtype=R.dtype)) / 2.0
    axis_sq = jnp.clip(jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1), 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs using off-diagonals (largest-axis reference)
    idx = jnp.argmax(axis_sq, axis=-1)

    def sign_fix(axis, A, idx):
        s01 = jnp.sign(A[..., 0, 1])
        s02 = jnp.sign(A[..., 0, 2])
        s12 = jnp.sign(A[..., 1, 2])
        ax0 = jnp.stack([axis[..., 0], axis[..., 1] * s01, axis[..., 2] * s02], axis=-1)
        ax1 = jnp.stack([axis[..., 0] * s01, axis[..., 1], axis[..., 2] * s12], axis=-1)
        ax2 = jnp.stack([axis[..., 0] * s02, axis[..., 1] * s12, axis[..., 2]], axis=-1)
        stacked = jnp.stack([ax0, ax1, ax2], axis=-2)
        return jnp.take_along_axis(stacked, idx[..., None, None], axis=-2)[..., 0, :]

    pi_axis = sign_fix(axis, A, idx)
    pi_vec = pi_axis * theta[..., None]
    return jnp.where(near_pi[..., None], pi_vec, generic)


def euler_zyx_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """rot_z @ rot_y @ rot_x of (..., 3) euler angles (nutil.py:111-127)."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rx = jnp.stack(
        [jnp.stack([one, zero, zero], -1), jnp.stack([zero, cx, -sx], -1), jnp.stack([zero, sx, cx], -1)], -2
    )
    ry = jnp.stack(
        [jnp.stack([cy, zero, sy], -1), jnp.stack([zero, one, zero], -1), jnp.stack([-sy, zero, cy], -1)], -2
    )
    rz = jnp.stack(
        [jnp.stack([cz, -sz, zero], -1), jnp.stack([sz, cz, zero], -1), jnp.stack([zero, zero, one], -1)], -2
    )
    return rz @ ry @ rx


ROT180_Z = jnp.asarray([[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]])


def relative_pose(R1, t1, R2, t2):
    """``compute_rel_poses`` (choosePose.py:43-51): (R1^T R2, t2 - t1)."""
    rel_R = jnp.matmul(jnp.swapaxes(R1, -1, -2), R2, precision=jax.lax.Precision.HIGHEST)
    rel_t = t2 - t1
    return rel_R, rel_t


def relative_pose_se3(R1, t1, R2, t2):
    """``calculate_relative_pose`` (verfication.py:9-19): T2 @ inv(T1)."""
    R1T = jnp.swapaxes(R1, -1, -2)
    rel_R = jnp.matmul(R2, R1T, precision=jax.lax.Precision.HIGHEST)
    rel_t = t2 - jnp.einsum("...ij,...j->...i", rel_R, t1)
    return rel_R, rel_t


def invert_pose(R, t):
    """Inverse of x -> R x + t."""
    RT = jnp.swapaxes(R, -1, -2)
    return RT, -jnp.einsum("...ij,...j->...i", RT, t)


def kabsch(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Best-fit rigid transform (R, t) minimizing ||R src + t - dst||^2.

    Replaces Open3D's ``TransformationEstimationPointToPoint`` (icp.py:103).
    src, dst: (N, 3); weights: (N,) optional.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / jnp.maximum(weights.sum(), 1e-12)
    mu_s = (src * w[:, None]).sum(0)
    mu_d = (dst * w[:, None]).sum(0)
    sc = src - mu_s
    dc = dst - mu_d
    H = jnp.matmul((sc * w[:, None]).T, dc, precision=jax.lax.Precision.HIGHEST)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    D = D.at[2, 2].set(d)
    R = jnp.matmul(jnp.matmul(Vt.T, D, precision=jax.lax.Precision.HIGHEST), U.T, precision=jax.lax.Precision.HIGHEST)
    t = mu_d - R @ mu_s
    return R, t


def transform_points(R, t, pts):
    """Apply x -> x R^T + t, i.e. column-convention R x + t for row points."""
    return jnp.einsum("...nj,...ij->...ni", pts, R, precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
