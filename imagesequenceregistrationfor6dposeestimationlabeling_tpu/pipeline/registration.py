"""Pose selection, ICP refinement and Chamfer evaluation — the
registration finale (choosePose.py, icp.py, verfication.py) on TPU.

* Relative-pose tensors: rel(i, j) = (R_i^T R_j, t_j - t_i)
  (choosePose.py:43-51, 98-114), vectorized over all pairs.
* Agreement matrix: ADD-S(rel_gt(i,j), rel_pred(i,j)) < 0.1 * diameter
  (choosePose.py:116-142); the image with the most agreements wins
  (choosePose.py:144-151).
* ICP: tiled NN (MXU distance matmul) + Kabsch per iteration under
  lax.while semantics, replacing Open3D point-to-point ICP (icp.py:96-106).
* Chamfer verification of consecutive pairs (verfication.py:59-108).
* Final metric: Chamfer(pred full cloud, CAD cloud) vs 0.1 * diameter
  (icp.py:109-126).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import rotations
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc


def relative_pose_tensor(R: jnp.ndarray, t: jnp.ndarray):
    """(N, 3, 3), (N, 3) -> rel_R (N, N, 3, 3), rel_t (N, N, 3) with
    rel(i, j) = (R_i^T R_j, t_j - t_i)."""
    rel_R = jnp.einsum("ika,jkb->ijab", R, R, precision=jax.lax.Precision.HIGHEST)  # R_i^T R_j
    rel_t = t[None, :, :] - t[:, None, :]
    return rel_R, rel_t


@functools.partial(jax.jit, static_argnames=("pair_chunk", "mesh"))
def agreement_matrix(
    rel_R_gt, rel_t_gt, rel_R_pred, rel_t_pred, verts, diameter, pair_chunk: int = 64,
    mesh=None,
):
    """(N, N) bool: ADD-S of predicted vs GT relative pose < 0.1*diam.

    verts should be a modest subsample (<= ~512) — the metric is a
    tolerance check, not a precise distance (choosePose.py:131-135).

    With ``mesh``, each lax.map chunk's pair axis shards over the mesh
    'data' axis (pair ADD-S evaluations are independent).
    """
    N = rel_R_gt.shape[0]
    V = verts.shape[0]

    def pair_adds(Rg, tg, Rp, tp):
        hp = jax.lax.Precision.HIGHEST
        a = jnp.matmul(verts, Rg.T, precision=hp) + tg
        b = jnp.matmul(verts, Rp.T, precision=hp) + tp
        d2 = pc.pairwise_sqdist(a, b)
        return jnp.sqrt(jnp.maximum(d2.min(axis=1), 0.0)).mean()

    flat = (
        rel_R_gt.reshape(-1, 3, 3),
        rel_t_gt.reshape(-1, 3),
        rel_R_pred.reshape(-1, 3, 3),
        rel_t_pred.reshape(-1, 3),
    )
    n_pairs = N * N
    pad = (-n_pairs) % pair_chunk
    flat = tuple(jnp.pad(f, ((0, pad),) + ((0, 0),) * (f.ndim - 1)) for f in flat)
    chunks = tuple(f.reshape(-1, pair_chunk, *f.shape[1:]) for f in flat)
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib

    chunks = tuple(
        mesh_lib.constrain(c, mesh, (None, mesh_lib.DATA_AXIS) + (None,) * (c.ndim - 2))
        for c in chunks
    )
    errs = jax.lax.map(lambda args: jax.vmap(pair_adds)(*args), chunks)
    errs = errs.reshape(-1)[:n_pairs].reshape(N, N)
    return errs < 0.1 * diameter, errs


def choose_best_image(agree: np.ndarray, top_k: int = 50):
    """argmax row-sum + top-k list (choosePose.py:144-151)."""
    sums = np.asarray(agree).sum(axis=1)
    order = np.argsort(-sums)
    return int(order[0]), order[:top_k]


class ICPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inlier_rmse: jnp.ndarray
    fitness: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("max_iters", "chunk", "mesh"))
def icp_point_to_point(
    source: jnp.ndarray,
    target: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    threshold: float,
    max_iters: int = 30,
    source_mask=None,
    target_mask=None,
    chunk: int = 8192,
    mesh=None,
) -> ICPResult:
    """Open3D registration_icp(PointToPoint) equivalent (icp.py:101-103).

    Transform convention: x' = R x + t applied to source.

    With ``mesh``, each iteration's NN sweep shards the source points over
    the mesh 'data' axis (SURVEY §2c); the Kabsch moment sums reduce over
    the shards via XLA-inserted psum.
    """
    s_mask = jnp.ones(source.shape[0], bool) if source_mask is None else source_mask

    def body(i, carry):
        R, t = carry
        moved = jnp.matmul(source, R.T, precision=jax.lax.Precision.HIGHEST) + t
        d, idx = pc.nn_query(moved, target, ref_mask=target_mask, chunk=chunk, mesh=mesh)
        w = (d < threshold) & s_mask
        Rk, tk = rotations.kabsch(moved, target[idx], w.astype(source.dtype))
        return (Rk @ R, Rk @ t + tk)

    R, t = jax.lax.fori_loop(0, max_iters, body, (R0, t0))
    moved = jnp.matmul(source, R.T, precision=jax.lax.Precision.HIGHEST) + t
    d, _ = pc.nn_query(moved, target, ref_mask=target_mask, chunk=chunk, mesh=mesh)
    inl = (d < threshold) & s_mask
    n_inl = jnp.maximum(inl.sum(), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d * d, 0.0)) / n_inl)
    fitness = inl.sum() / jnp.maximum(s_mask.sum(), 1)
    return ICPResult(R, t, rmse, fitness)


def register_halves(
    upper: np.ndarray,
    lower: np.ndarray,
    R_gt_chosen: np.ndarray,
    t_gt_chosen: np.ndarray,
    R_pred_chosen: np.ndarray,
    t_pred_chosen: np.ndarray,
    cad_points: np.ndarray,
    diameter: float,
    icp_threshold: float = 20.0,
    icp_iters: int = 30,
    mesh="auto",
):
    """icp.py:48-126: bring the upper half into the lower/CAD frame.

    1. actual_upper = upper @ R_GT^T + t_GT (chosen image's GT pose),
    2. init transform = inverse of that image's *predicted* pose,
    3. point-to-point ICP of actual_upper onto lower,
    4. stack clouds, Chamfer vs the CAD cloud.

    ``mesh="auto"`` shards the ICP/Chamfer NN sweeps over all local devices
    when more than one is present (SURVEY §2c sharded point-cloud tiles).
    Returns dict with the final transform, chamfer and the merged cloud.
    """
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib

    if mesh == "auto":
        mesh = mesh_lib.auto_mesh()
    upper_j = jnp.asarray(upper, jnp.float32)
    lower_j = jnp.asarray(lower, jnp.float32)
    actual_upper = upper_j @ jnp.asarray(R_gt_chosen, jnp.float32).T + jnp.asarray(
        t_gt_chosen, jnp.float32
    )
    R_inv, t_inv = rotations.invert_pose(
        jnp.asarray(R_pred_chosen, jnp.float32), jnp.asarray(t_pred_chosen, jnp.float32)
    )
    res = icp_point_to_point(
        actual_upper, lower_j, R_inv, t_inv, icp_threshold, max_iters=icp_iters,
        mesh=mesh,
    )
    moved = actual_upper @ res.R.T + res.t
    merged = jnp.concatenate([moved, lower_j], axis=0)
    chamfer = pc.chamfer_distance(merged, jnp.asarray(cad_points, jnp.float32), mesh=mesh)
    return {
        "R": np.asarray(res.R),
        "t": np.asarray(res.t),
        "fitness": float(res.fitness),
        "inlier_rmse": float(res.inlier_rmse),
        "chamfer": float(chamfer),
        "correct": float(chamfer) < 0.1 * diameter,
        "merged": np.asarray(merged),
    }


@functools.partial(jax.jit, static_argnames=("mesh",))
def _verify_pairs(cloud, R_gt, t_gt, R_pred, mesh=None):
    """All n-1 consecutive-pair Chamfer checks in ONE program: a lax.map
    over pairs (sequential per pair to bound HBM at O(V^2) for one pair),
    replacing n-1 separate ~40-90 ms relay dispatches.  With ``mesh`` each
    pair's Chamfer NN sweep shards its point axis over the mesh."""

    def pair(args):
        Rg_i, tg_i, Rg_j, tg_j, Rp_i, Rp_j = args
        rel_R, _ = rotations.relative_pose_se3(Rg_i, tg_i, Rg_j, tg_j)
        # rotation-only comparison exactly as verfication.py:83-85
        pc_gt = (cloud @ Rp_i.T) @ rel_R
        pc_pred = cloud @ Rp_j
        return pc.chamfer_distance(pc_gt, pc_pred, mesh=mesh)

    args = (R_gt[:-1], t_gt[:-1], R_gt[1:], t_gt[1:], R_pred[:-1], R_pred[1:])
    return jax.lax.map(pair, args)


def verify_consecutive(
    cloud: np.ndarray,
    R_gt: np.ndarray,
    t_gt: np.ndarray,
    R_pred: np.ndarray,
    t_pred: np.ndarray,
    mesh="auto",
):
    """verfication.py:59-108: per consecutive image pair, Chamfer between
    the cloud rotated by the GT relative pose vs the predicted next pose.
    Returns (best index, chamfer list)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib

    if mesh == "auto":
        mesh = mesh_lib.auto_mesh()
    out = np.asarray(
        _verify_pairs(
            jnp.asarray(cloud, jnp.float32),
            jnp.asarray(R_gt, jnp.float32),
            jnp.asarray(t_gt, jnp.float32),
            jnp.asarray(R_pred, jnp.float32),
            mesh=mesh,
        )
    )
    best = int(np.argmin(out))
    return best, out.tolist()
