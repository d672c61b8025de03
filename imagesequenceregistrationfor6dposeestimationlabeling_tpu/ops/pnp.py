"""Perspective-n-Point on TPU: batched closed-form P3P + fixed-shape RANSAC.

Replaces ``cv2.solvePnPRansac`` (inference.py:123-134), ``cv2.solveP3P``
(poseEstSurf.py:138) and the per-hypothesis Python loop: all H hypotheses
are solved *simultaneously* — the quartic by vmapped Durand-Kerner, the
3-point alignment by closed-form Kabsch, the inlier scoring by one
(H, N) reprojection matmul on the MXU.  OpenCV's adaptive iteration count
becomes a fixed hypothesis budget (the reference caps at 500/10k anyway).

Conventions: OpenCV column form, x_cam = R x_world + t, pixel
u = fx Xc/Zc + cx.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import (
    kabsch,
    rotvec_to_matrix,
    matrix_to_rotvec,
    hat,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.polynomial import (
    durand_kerner,
    real_roots_mask,
)


def bearings(p2d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords (..., 2) -> unit bearing vectors (..., 3)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (p2d[..., 0] - cx) / fx
    y = (p2d[..., 1] - cy) / fy
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _poly_mul(a, b):
    """Multiply small static coefficient lists (highest degree first)."""
    out = [0.0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = out[i + j] + ai * bj
    return out


def p3p_grunert(p3d: jnp.ndarray, f: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form P3P (Grunert's quartic).

    p3d: (3, 3) world points; f: (3, 3) unit bearings (camera frame).
    Returns (R (4, 3, 3), t (4, 3), valid (4,)) — up to 4 solutions,
    padded with identity/invalid.
    """
    P1, P2, P3 = p3d[0], p3d[1], p3d[2]
    f1, f2, f3 = f[0], f[1], f[2]
    aa = jnp.sum((P2 - P3) ** 2)
    bb = jnp.sum((P1 - P3) ** 2)
    cc = jnp.sum((P1 - P2) ** 2)
    p = 2.0 * jnp.dot(f2, f3)
    q = 2.0 * jnp.dot(f1, f3)
    r = 2.0 * jnp.dot(f1, f2)
    m = aa / jnp.maximum(bb, 1e-12)
    n = cc / jnp.maximum(bb, 1e-12)

    # u = N(v)/D(v) with N = (1 - m + n) v^2 + (m - n) q v - (1 + m - n)
    # derived from eliminating s1 between the three law-of-cosines eqs:
    #   u^2 + v^2 - p u v = m (1 + v^2 - q v)
    #   1 + u^2 - r u     = n (1 + v^2 - q v)
    n2 = 1.0 - m + n
    n1 = (m - n) * q
    n0 = -(1.0 + m - n)
    d1 = p
    d0 = -r

    N = [n2, n1, n0]
    D = [d1, d0]
    # quartic: N^2 - r N D + (1 - n) D^2 ... careful: substitute u into
    #   u^2 - r u + 1 - n (1 + v^2 - q v) = 0
    # multiplied by D^2:
    #   N^2 - r N D + (1 - n (1 + v^2 - q v)) D^2 = 0
    NN = _poly_mul(N, N)  # degree 4
    ND = _poly_mul(N, D)  # degree 3
    DD = _poly_mul(D, D)  # degree 2
    g = [-n, n * q, 1.0 - n]  # 1 - n(1 + v^2 - q v) as poly in v (deg 2)
    GDD = _poly_mul(g, DD)  # degree 4

    def pad(c, deg=4):
        return [0.0] * (deg + 1 - len(c)) + list(c)

    NN = pad(NN)
    ND = pad(ND)
    GDD = pad(GDD)
    coeffs = jnp.stack([NN[k] - r * ND[k] + GDD[k] for k in range(5)])

    # guard degenerate leading coefficient (solutions marked invalid)
    lead_ok = jnp.abs(coeffs[0]) > 1e-10
    roots = durand_kerner(coeffs[None], n_iters=50)[0]  # (4,) complex
    v = roots.real
    is_real = real_roots_mask(roots, tol=5e-3)

    denom_u = d1 * v + d0
    u = (n2 * v * v + n1 * v + n0) / jnp.where(jnp.abs(denom_u) < 1e-9, 1e-9, denom_u)
    s1_sq = bb / jnp.maximum(1.0 + v * v - q * v, 1e-12)
    s1 = jnp.sqrt(jnp.maximum(s1_sq, 0.0))
    s2 = u * s1
    s3 = v * s1
    valid = is_real & (v > 1e-6) & (u > 1e-6) & (s1 > 1e-9) & lead_ok

    # camera-frame points, then 3-point Kabsch world->camera
    X = jnp.stack(
        [s1[:, None] * f1[None], s2[:, None] * f2[None], s3[:, None] * f3[None]], axis=1
    )  # (4 roots, 3 pts, 3)

    def solve_rt(Xc):
        R, t = kabsch(p3d, Xc)
        return R, t

    R, t = jax.vmap(solve_rt)(X)
    return R, t, valid


def reproject(R, t, K, pts):
    """(..., 3, 3) R, (..., 3) t, (N, 3) pts -> (..., N, 2) pixels and z."""
    xc = jnp.einsum("...ij,nj->...ni", R, pts, precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
    z = xc[..., 2]
    u = K[0, 0] * xc[..., 0] / z + K[0, 2]
    v = K[1, 1] * xc[..., 1] / z + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


class RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray      # (N,) bool
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def ransac_pnp(
    p3d: jnp.ndarray,
    p2d: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    weights: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
    n_hyp: int = 500,
    reproj_err: float = 2.0,
    refine_iters: int = 10,
) -> RansacResult:
    """Fixed-budget RANSAC-P3P (cv2.solvePnPRansac equivalent,
    inference.py:123-134: P3P flag, 500 iters, reprojectionError=2).

    Each hypothesis: 4 random correspondences -> P3P on 3 + disambiguation
    on the 4th -> inlier count on the MXU; best hypothesis is
    Gauss-Newton-refined on its inliers (OpenCV refines with LM).
    ``weights`` biases the correspondence draw; ``valid`` restricts which
    correspondences may score as inliers (pad-and-mask discipline —
    OpenCV simply never sees filtered-out points, inference.py:288-290).
    """
    N = p3d.shape[0]
    if weights is None:
        logits = jnp.zeros((N,))
    else:
        logits = jnp.log(jnp.maximum(weights, 1e-12))
    if valid is None:
        valid = jnp.ones((N,), bool) if weights is None else weights > 0
    keys = jax.random.split(key, 2)
    samp = jax.random.categorical(keys[0], logits, shape=(n_hyp, 4))

    f_all = bearings(p2d, K)  # (N, 3)

    def solve_one(idx):
        pts = p3d[idx]
        f = f_all[idx]
        R, t, valid = p3p_grunert(pts[:3], f[:3])  # (4, ...)
        # disambiguate with the 4th point
        uv, z = reproject(R, t, K, pts[3:4])  # (4, 1, 2)
        err4 = jnp.linalg.norm(uv[:, 0] - p2d[idx[3]], axis=-1)
        err4 = jnp.where(valid & (z[:, 0] > 0), err4, 1e9)
        best = jnp.argmin(err4)
        return R[best], t[best], err4[best] < 1e8

    R_h, t_h, ok_h = jax.vmap(solve_one)(samp)  # (H, 3, 3), (H, 3), (H,)

    uv, z = reproject(R_h, t_h, K, p3d)  # (H, N, 2)
    err = jnp.linalg.norm(uv - p2d[None], axis=-1)
    inl = (err < reproj_err) & (z > 0) & valid[None, :]  # (H, N)
    counts = jnp.where(ok_h, inl.sum(-1), -1)
    best = jnp.argmax(counts)
    R0, t0 = R_h[best], t_h[best]
    inliers = inl[best]
    success = counts[best] >= 4

    # Gauss-Newton refinement on inliers (masked, fixed iterations).
    def gn_step(carry, _):
        R, t = carry
        uv, z = reproject(R, t, K, p3d)
        res = (uv - p2d) * inliers[:, None]  # (N, 2)

        # Jacobian wrt (omega, dt) of pixel residuals, evaluated analytically
        xc = jnp.einsum("ij,nj->ni", R, p3d, precision=jax.lax.Precision.HIGHEST) + t
        X, Y, Z = xc[:, 0], xc[:, 1], xc[:, 2]
        fx, fy = K[0, 0], K[1, 1]
        iZ = 1.0 / jnp.maximum(Z, 1e-9)
        # d(uv)/d(xc)
        J_u = jnp.stack([fx * iZ, jnp.zeros_like(Z), -fx * X * iZ * iZ], -1)
        J_v = jnp.stack([jnp.zeros_like(Z), fy * iZ, -fy * Y * iZ * iZ], -1)
        J_uv = jnp.stack([J_u, J_v], 1)  # (N, 2, 3)
        # d(xc)/d(omega) = -[xc]_x (left perturbation R <- exp(w) R), d/d t = I
        Jw = -hat(xc)  # (N, 3, 3)
        J = jnp.concatenate([J_uv @ Jw, J_uv], axis=-1)  # (N, 2, 6)
        J = J * inliers[:, None, None]
        JtJ = jnp.einsum("nik,nil->kl", J, J) + 1e-6 * jnp.eye(6)
        Jtr = jnp.einsum("nik,ni->k", J, res)
        delta = -jnp.linalg.solve(JtJ, Jtr)
        dR = rotvec_to_matrix(delta[:3])
        return (dR @ R, dR @ t + delta[3:]), None

    (R_f, t_f), _ = jax.lax.scan(gn_step, (R0, t0), None, length=refine_iters)
    # keep refinement only if it didn't diverge
    uv0, z0 = reproject(R0, t0, K, p3d)
    uvf, zf = reproject(R_f, t_f, K, p3d)
    e0 = jnp.sum(jnp.where(inliers, jnp.linalg.norm(uv0 - p2d, axis=-1), 0.0))
    ef = jnp.sum(jnp.where(inliers, jnp.linalg.norm(uvf - p2d, axis=-1), 0.0))
    use_f = ef <= e0
    R_out = jnp.where(use_f, R_f, R0)
    t_out = jnp.where(use_f, t_f, t0)
    return RansacResult(R_out, t_out, inliers, inl[best].sum(), success)


def solve_p3p_batch(p3d: jnp.ndarray, p2d: jnp.ndarray, K: jnp.ndarray):
    """Batched raw P3P: (H, 3, 3) points + (H, 3, 2) pixels -> up to 4
    solutions each (replaces the cv2.solveP3P loop, poseEstSurf.py:133-144).
    Returns (R (H, 4, 3, 3), t (H, 4, 3), valid (H, 4))."""
    f = bearings(p2d, K)
    return jax.vmap(p3p_grunert)(p3d, f)
