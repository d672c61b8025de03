"""Gradient pose refinement — pose_refine.py rebuilt in pure JAX.

The reference maximizes the average query-key log-probability of the
initially-visible surface with scipy BFGS + a custom OpenCV-Rodrigues
autograd function (pose_refine.py:21-104), and only ever updates t (it
passes a zero rotvec and returns R unchanged, pose_refine.py:95-104).

Here: the objective is fully differentiable in JAX ((rotvec, t) via our
exp-map), optimized with jax.scipy.optimize BFGS inside one jit —
including the rotation, which strictly dominates the reference's
translation-only refinement.  A `translation_only` flag reproduces the
reference's exact behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import rotvec_to_matrix
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.grid_sample import grid_sample
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.rasterize import render_object_coords


def _bfgs(f, x0: jnp.ndarray, n_steps: int, n_backtrack: int = 12, max_step: float = 1.0):
    """Minimal BFGS with backtracking Armijo line search and a trust
    region (jittable; the reference used scipy BFGS, pose_refine.py:99).
    The trust region keeps the optimizer in the local basin — the log-prob
    objective has a degenerate far-field optimum where all points collapse
    to one pixel."""
    dim = x0.shape[0]
    vg = jax.value_and_grad(f)

    def step(carry, _):
        x, g, fx, H = carry
        p = jnp.nan_to_num(-(H @ g))
        p_norm = jnp.linalg.norm(p)
        p = jnp.where(p_norm > max_step, p * (max_step / jnp.maximum(p_norm, 1e-12)), p)

        def bt(carry_bt, _):
            alpha, done = carry_bt
            x_new = x + alpha * p
            f_new = f(x_new)
            ok = f_new <= fx + 1e-4 * alpha * jnp.dot(g, p)
            alpha_next = jnp.where(ok | done, alpha, alpha * 0.5)
            return (alpha_next, done | ok), None

        (alpha, ok), _ = jax.lax.scan(bt, (jnp.asarray(1.0), jnp.asarray(False)), None, length=n_backtrack)
        alpha = jnp.where(ok, alpha, 0.0)
        s = alpha * p
        x_new = x + s
        f_new, g_new = vg(x_new)
        y = g_new - g
        sy = jnp.dot(s, y)
        # curvature condition guards against an exploding inverse Hessian
        curv_ok = sy > 1e-8 * jnp.linalg.norm(s) * jnp.linalg.norm(y) + 1e-20
        rho = jnp.where(curv_ok, 1.0 / jnp.where(curv_ok, sy, 1.0), 0.0)
        I = jnp.eye(dim)
        V = I - rho * jnp.outer(s, y)
        H_new = V @ H @ V.T + rho * jnp.outer(s, s)
        H_new = jnp.where(curv_ok, H_new, H)
        # reject non-finite steps entirely
        bad = ~jnp.isfinite(f_new)
        x_new = jnp.where(bad, x, x_new)
        g_new = jnp.where(bad, g, g_new)
        f_new = jnp.where(bad, fx, f_new)
        return (x_new, g_new, f_new, H_new), None

    f0, g0 = vg(x0)
    (x, g, fx, H), _ = jax.lax.scan(step, (x0, g0, f0, jnp.eye(dim)), None, length=n_steps)
    return x, fx


@functools.partial(jax.jit, static_argnames=("n_steps", "translation_only", "n_denom"))
def refine_pose(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    query_img: jnp.ndarray,     # (res, res, e)
    K: jnp.ndarray,             # (3, 3) crop camera
    surf_pts: jnp.ndarray,      # (m, 3) baked surface points (CAD scale)
    surf_keys: jnp.ndarray,     # (m, e)
    key: jax.Array,
    n_steps: int = 50,
    lr: float = 0.0,            # 0 -> use BFGS; >0 -> plain gradient descent
    translation_only: bool = False,
    n_denom: int = 10960,       # n_samples_denom (pose_refine.py:22)
):
    """Returns (R, t, final score).  Score = -mean log prob (lower=better),
    matching the reference's objective (pose_refine.py:70-93)."""
    res = query_img.shape[0]
    e = query_img.shape[-1]

    # visible surface under the initial pose + its keys (pose_refine.py:34-47)
    coords, mask = render_object_coords(surf_pts, R0, t0, K, res)
    coord_flat = coords.reshape(-1, 3)
    vis = mask.reshape(-1) > 0.5
    # keys of the visible coords: nearest surface point's key — the
    # rasterizer already gives exact surface points, so gather via NN-free
    # identity: rasterized coords ARE surf_pts entries.
    # For key lookup we re-associate by projecting the same way.
    # Simpler: recompute winning indices as part of the objective-free
    # setup — approximate with a small NN over the visible coords.
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.pointcloud import nn_query

    _, nn_idx = nn_query(coord_flat, surf_pts, chunk=8192)
    keys_vis = surf_keys[nn_idx]  # (n_pix, e)

    # log-denominator per pixel from a random key subset (pose_refine.py:53-56)
    sel = jax.random.permutation(key, surf_keys.shape[0])[: min(n_denom, surf_keys.shape[0])]
    denom_img = jax.nn.logsumexp(
        jnp.einsum("hwe,ne->hwn", query_img, surf_keys[sel], precision=jax.lax.Precision.HIGHEST),
        axis=-1,
        keepdims=True,
    )  # (res, res, 1)

    # Parameter scaling: rotations in radians, translations in units of
    # 10% of the camera distance — balances gradient magnitudes and makes
    # the BFGS trust region meaningful in both blocks.
    t_scale = 0.1 * jnp.linalg.norm(t0)

    def objective(params):
        w, dt = params[:3], params[3:] * t_scale
        if translation_only:
            w = w * 0.0
        R = rotvec_to_matrix(w) @ R0
        t = t0 + dt
        xc = jnp.einsum("ij,nj->ni", R, coord_flat, precision=jax.lax.Precision.HIGHEST) + t
        u = K[0, 0] * xc[:, 0] / xc[:, 2] + K[0, 2]
        v = K[1, 1] * xc[:, 1] / xc[:, 2] + K[1, 2]
        # torch grid_sample align_corners=False with +0.5 offset
        gx = (u + 0.5) * (2.0 / res) - 1.0
        gy = (v + 0.5) * (2.0 / res) - 1.0
        grid = jnp.stack([gx, gy], axis=-1)[None]
        q = grid_sample(query_img[None], grid, mode="bilinear", align_corners=False, padding_mode="border")[0]
        d = grid_sample(denom_img[None], grid, mode="bilinear", align_corners=False, padding_mode="border")[0][:, 0]
        log_nom = jnp.sum(q * keys_vis, axis=-1)
        per_px = (log_nom - d) * vis
        n_vis = jnp.maximum(vis.sum(), 1)
        return -(per_px.sum() / n_vis) / 2.0

    x0 = jnp.zeros((6,))
    if lr > 0:
        grad_fn = jax.grad(objective)

        def step(x, _):
            return x - lr * grad_fn(x), None

        x, _ = jax.lax.scan(step, x0, None, length=n_steps)
        fval = objective(x)
    else:
        x, fval = _bfgs(objective, x0, n_steps, max_step=0.3)
    w, dt = x[:3], x[3:] * t_scale
    if translation_only:
        w = w * 0.0
    R = rotvec_to_matrix(w) @ R0
    t = t0 + dt
    return R, t, fval
