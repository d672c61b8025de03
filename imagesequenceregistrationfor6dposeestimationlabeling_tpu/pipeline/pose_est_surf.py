"""SurfEmb pose hypothesis sampling + scoring — poseEstSurf.py rebuilt.

The reference's ``estimate_pose`` (poseEstSurf.py:11-261):

1. build the correspondence distribution corr = softmax(q @ k^T) * mask_prob
   over (pixels x keys), sharpen by alpha, inversion-sample 4-tuples,
2. P3P per 4-tuple (a *Python loop* over cv2.solveP3P in the reference,
   poseEstSurf.py:133-144 — here one vmapped batch on the MXU),
3. prune by 2D spread / depth range / normal visibility
   (poseEstSurf.py:147-169),
4. score surviving poses: project all object points, z-buffer per pixel
   via scatter-min (torch_scatter -> jax segment_min), mask score +
   coordinate log-prob score (poseEstSurf.py:182-237).

All stages are fixed-shape: pruning produces a validity mask instead of
filtering; scoring runs over max_pose_evaluations slots.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.cameras import downsample_K
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pnp


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(H, W[, C]) -> (H//k, W//k[, C]) average pooling."""
    if x.ndim == 2:
        H, W = x.shape
        return x[: H - H % k, : W - W % k].reshape(H // k, k, W // k, k).mean(axis=(1, 3))
    H, W, C = x.shape
    return x[: H - H % k, : W - W % k].reshape(H // k, k, W // k, k, C).mean(axis=(1, 3))


def _max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    H, W = x.shape
    return x[: H - H % k, : W - W % k].reshape(H // k, k, W // k, k).max(axis=(1, 3))


def _max_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/1 same max pool on (..., H, W)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) * (x.ndim - 2) + (3, 3), (1,) * x.ndim, "SAME"
    )


class SurfEmbResult(NamedTuple):
    R: jnp.ndarray              # (P, 3, 3)
    t: jnp.ndarray              # (P, 3)
    pose_scores: jnp.ndarray    # (P,)
    mask_scores: jnp.ndarray
    coord_scores: jnp.ndarray
    valid: jnp.ndarray          # (P,) surviving-pose mask


@functools.partial(
    jax.jit,
    static_argnames=("down_sample", "max_poses", "max_pose_evaluations", "max_pool", "mesh"),
)
def estimate_pose(
    mask_lgts: jnp.ndarray,     # (r, r)
    query_img: jnp.ndarray,     # (r, r, e)
    obj_pts: jnp.ndarray,       # (m, 3)
    obj_normals: jnp.ndarray,   # (m, 3)
    obj_keys: jnp.ndarray,      # (m, e)
    obj_diameter: float,
    K: jnp.ndarray,             # (3, 3)
    key: jax.Array,
    down_sample: int = 3,
    max_poses: int = 10000,
    max_pose_evaluations: int = 1000,
    alpha: float = 1.5,
    dist_2d_min: float = 0.1,
    max_pool: bool = True,
    mesh=None,
) -> SurfEmbResult:
    """With ``mesh``, the hypothesis axis (max_poses P3P solves + pruning,
    then max_pose_evaluations z-buffer scorings) shards over the mesh
    'data' axis — the SURVEY §2c "batch-parallel pose hypotheses" plan
    (the reference loops cv2.solveP3P per hypothesis and scores 500 poses
    at a time on one GPU, poseEstSurf.py:133-144, 244-250).  Both axes
    must divide the mesh size (the defaults 10000/1000 divide 8)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import (
        mesh as mesh_lib,
    )

    def shard_hyp(x):
        # shard the leading hypothesis axis; no-op without a mesh
        return mesh_lib.constrain(
            x, mesh, (mesh_lib.DATA_AXIS,) + (None,) * (x.ndim - 1)
        )

    m, e = obj_keys.shape
    Kd = downsample_K(K, down_sample)

    mask_log_prob = _max_pool(jax.nn.log_sigmoid(mask_lgts), down_sample)
    neg_mask_log_prob = _max_pool(jax.nn.log_sigmoid(-mask_lgts), down_sample)
    mask_lgts_d = _avg_pool(mask_lgts, down_sample)
    res = mask_lgts_d.shape[0]
    n = res * res
    mask_prob = jax.nn.sigmoid(mask_lgts_d).reshape(n)

    if max_pool:
        mask_log_prob = _max_pool_3x3_same(mask_log_prob)
        neg_mask_log_prob = _max_pool_3x3_same(neg_mask_log_prob)
    mask_log_prob = mask_log_prob.reshape(n)
    neg_mask_log_prob = neg_mask_log_prob.reshape(n)

    # correspondence distribution (poseEstSurf.py:67-107)
    queries = _avg_pool(query_img, down_sample).reshape(n, e)
    logits = jnp.matmul(queries, obj_keys.T, precision=jax.lax.Precision.HIGHEST)
    corr_log = jax.nn.log_softmax(logits, axis=1)  # (n, m)
    corr = jnp.exp(corr_log) * mask_prob[:, None]
    if max_pool:
        cl = corr_log.reshape(res, res, m)
        corr_log = _max_pool_3x3_same(jnp.moveaxis(cl, -1, 0))
        corr_log = jnp.moveaxis(corr_log, 0, -1).reshape(n, m)

    # inversion sampling of 4-tuples (poseEstSurf.py:110-121)
    k_samp, k_sol = jax.random.split(key)
    flat = corr.reshape(-1) ** alpha
    cdf = jnp.cumsum(flat)
    cdf = cdf / cdf[-1]
    u = jax.random.uniform(k_samp, (max_poses, 4))
    corr_idx = jnp.searchsorted(cdf, u)
    p2d_idx = corr_idx // m
    p3d_idx = corr_idx % m
    yy = p2d_idx // res
    xx = p2d_idx % res
    p2d = shard_hyp(jnp.stack([xx, yy], axis=-1).astype(jnp.float32))  # (P, 4, 2)
    p3d = shard_hyp(obj_pts[p3d_idx])  # (P, 4, 3)
    n3d = shard_hyp(obj_normals[p3d_idx[:, :3]])  # (P, 3, 3)

    # batched P3P + random valid solution (poseEstSurf.py:133-144)
    Rs, ts, valid4 = pnp.solve_p3p_batch(p3d[:, :3], p2d[:, :3], Kd)  # (P, 4, ...)
    pick_scores = jnp.where(valid4, jax.random.uniform(k_sol, valid4.shape), -1.0)
    pick = jnp.argmax(pick_scores, axis=1)
    R = jnp.take_along_axis(Rs, pick[:, None, None, None], axis=1)[:, 0]
    t = jnp.take_along_axis(ts, pick[:, None, None], axis=1)[:, 0]
    pose_ok = valid4.any(axis=1)

    # pruning (poseEstSurf.py:147-169)
    d2 = jnp.linalg.norm(p2d[:, :3, None] - p2d[:, None, :3], axis=-1).max(axis=(1, 2))
    dist_ok = d2 >= dist_2d_min * res
    z = t[:, 2]
    z_min = Kd[0, 0] * obj_diameter / (res * 20.0)
    z_max = Kd[0, 0] * obj_diameter / (res * 0.5)
    size_ok = (z_min < z) & (z < z_max)
    n3d_cam = jnp.einsum("pij,pkj->pki", R, n3d, precision=jax.lax.Precision.HIGHEST)
    p3d_cam = jnp.einsum("pij,pkj->pki", R, p3d[:, :3], precision=jax.lax.Precision.HIGHEST) + t[:, None]
    normals_ok = jnp.all(jnp.sum(n3d_cam * p3d_cam, axis=-1) < 0, axis=-1)
    keep = pose_ok & dist_ok & size_ok & normals_ok

    # take the first max_pose_evaluations surviving poses (stable order)
    order = jnp.argsort(~keep, stable=True)  # survivors first
    sel = order[:max_pose_evaluations]
    R_e = shard_hyp(R[sel])
    t_e = shard_hyp(t[sel])
    valid_e = shard_hyp(keep[sel])
    P = max_pose_evaluations

    # scoring (poseEstSurf.py:182-237)
    uv, z_all = pnp.reproject(R_e, t_e, Kd, obj_pts)  # (P, m, 2)
    uv = jnp.round(uv)
    inside = jnp.all((uv >= 0) & (uv < res), axis=-1)  # (P, m)
    u_flat = (uv[..., 1] * res + uv[..., 0]).astype(jnp.int32)
    u_flat = jnp.where(inside, u_flat, n)  # ignore bin

    # z-buffer: per pose-pixel segment min over point depths
    pose_offsets = (jnp.arange(P) * (n + 1))[:, None]
    seg = (u_flat + pose_offsets).reshape(-1)
    z_flat = jnp.where(z_all > 0, z_all, jnp.inf).reshape(-1)
    seg_min = jax.ops.segment_min(z_flat, seg, num_segments=P * (n + 1))
    seg_min = seg_min.reshape(P, n + 1)[:, :n]  # (P, n)
    visible_px = jnp.isfinite(seg_min) & (seg_min > 0)

    # which point won each pixel: the point whose z equals the segment min
    # (per-point gather of its pixel's min depth; outside points see inf)
    z_win_padded = jnp.concatenate([seg_min, jnp.full((P, 1), jnp.inf)], axis=1)  # (P, n+1)
    min_at_pixel = jnp.take_along_axis(z_win_padded, u_flat, axis=1)  # (P, m)
    won = inside & (z_all <= min_at_pixel + 1e-9)

    # mask score (poseEstSurf.py:208-210): visible pixels get mask_log_prob,
    # the rest neg_mask_log_prob
    mask_score = jnp.where(visible_px, mask_log_prob[None, :], neg_mask_log_prob[None, :]).mean(axis=1)

    # coord score (poseEstSurf.py:212-217): mean over visible pixels of the
    # correspondence log prob of the winning point; corr_log is (n, m)
    cl_vals = corr_log[jnp.clip(u_flat, 0, n - 1), jnp.arange(m)[None, :]]  # (P, m)
    cl_vals = jnp.where(won, cl_vals, 0.0)
    n_won = jnp.maximum(jnp.sum(won, axis=1), 1)
    coord_score = jnp.sum(cl_vals, axis=1) / n_won
    has_vis = jnp.any(won, axis=1)
    coord_score = jnp.where(has_vis, coord_score, -jnp.inf)

    mask_score = mask_score / jnp.log(2.0)
    coord_score = coord_score / jnp.log(float(m))
    score = mask_score + coord_score
    score = jnp.where(valid_e, score, -jnp.inf)
    return SurfEmbResult(R_e, t_e, score, mask_score, coord_score, valid_e)
