"""Point-cloud kernels: brute-force NN, FPS, normals, outlier removal.

Replaces sklearn KDTree (generateCors.py:216-259 etc.), pytorch3d
``sample_farthest_points`` (CUDA) and ``estimate_pointcloud_normals``
(CUDA), and Open3D's ``remove_radius_outlier`` / point-cloud distance.

On TPU, for clouds up to a few 100k points, a tiled distance **matmul**
(|a|^2 + |b|^2 - 2 a.b^T on the MXU) beats any tree structure; every op
here reduces to that primitive.  All functions take an optional validity
mask so padded (static-shape) clouds work under jit.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib

_BIG = 1e30


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) x (M, 3) -> (N, M) squared distances via MXU matmul."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2.T - 2.0 * cross, 0.0)


def nn_query(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk: int = 8192,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor of each query in ref.  Returns (dist, idx).

    With ``mesh``, the QUERY axis shards over the mesh 'data' axis (the
    SURVEY §2c "sharded point-cloud tiles" plan): each device scans the
    replicated reference cloud for its slice of queries — embarrassingly
    parallel, no collective needed (per-query results stay device-local and
    downstream reductions psum via XLA).  On a single-device TPU this
    dispatches to the fused Pallas kernel (ops/pallas_kernels); the XLA
    tiling below is the reference implementation / CPU / sharded path.
    """
    if ref.shape[0] == 0 or query.shape[0] == 0:
        raise ValueError(
            f"nn_query: empty cloud (query {query.shape[0]}, ref {ref.shape[0]}) "
            "— an upstream surface extraction or filter produced no points"
        )
    if mesh is not None:
        return _nn_query_sharded(query, ref, ref_mask, chunk, mesh)
    if jax.default_backend() == "tpu":
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pallas_kernels

        return pallas_kernels.nn_min(query, ref, ref_mask, interpret=False)
    return _nn_query_xla(query, ref, ref_mask, chunk)


@functools.partial(jax.jit, static_argnames=("chunk", "mesh"))
def _nn_query_sharded(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray],
    chunk: int,
    mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = query.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = mesh_lib.constrain(q, mesh, (mesh_lib.DATA_AXIS, None))
    d, i = _nn_query_impl(q, ref, ref_mask, chunk)
    return d[:n], i[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _nn_query_xla(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _nn_query_impl(query, ref, ref_mask, chunk)


def _nn_query_impl(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n_ref = ref.shape[0]
    pad = (-n_ref) % chunk
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    mask = jnp.ones((n_ref,), bool) if ref_mask is None else ref_mask
    mask_p = jnp.pad(mask, (0, pad))
    n_chunks = (n_ref + pad) // chunk
    ref_c = ref_p.reshape(n_chunks, chunk, 3)
    mask_c = mask_p.reshape(n_chunks, chunk)

    def body(i, carry):
        best_d, best_i = carry
        d = pairwise_sqdist(query, ref_c[i])  # (N, chunk)
        d = jnp.where(mask_c[i][None, :], d, _BIG)
        arg = jnp.argmin(d, axis=-1)
        dmin = jnp.take_along_axis(d, arg[:, None], axis=-1)[:, 0]
        better = dmin < best_d
        best_i = jnp.where(better, arg + i * chunk, best_i)
        best_d = jnp.where(better, dmin, best_d)
        return best_d, best_i

    init = (jnp.full((query.shape[0],), _BIG), jnp.zeros((query.shape[0],), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    return jnp.sqrt(best_d), best_i


def chamfer_distance(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_mask: Optional[jnp.ndarray] = None,
    b_mask: Optional[jnp.ndarray] = None,
    chunk: int = 8192,
    mesh=None,
) -> jnp.ndarray:
    """Bidirectional mean NN distance / 2 — Open3D-compatible Chamfer
    (icp.py:113-117, verfication.py:96-102).  With ``mesh`` both NN sweeps
    shard their query axis over the mesh."""
    d_ab, _ = nn_query(a, b, b_mask, chunk, mesh=mesh)
    d_ba, _ = nn_query(b, a, a_mask, chunk, mesh=mesh)
    ma = jnp.ones_like(d_ab) if a_mask is None else a_mask.astype(d_ab.dtype)
    mb = jnp.ones_like(d_ba) if b_mask is None else b_mask.astype(d_ba.dtype)
    mean_ab = jnp.sum(d_ab * ma) / jnp.maximum(jnp.sum(ma), 1.0)
    mean_ba = jnp.sum(d_ba * mb) / jnp.maximum(jnp.sum(mb), 1.0)
    return (mean_ab + mean_ba) / 2.0


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk: int = 4096,
):
    """k nearest neighbors (dists, idx) of each query point in ref."""
    n_ref = ref.shape[0]
    pad = (-n_ref) % chunk
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    mask = jnp.ones((n_ref,), bool) if ref_mask is None else ref_mask
    mask_p = jnp.pad(mask, (0, pad))
    n_chunks = (n_ref + pad) // chunk
    ref_c = ref_p.reshape(n_chunks, chunk, 3)
    mask_c = mask_p.reshape(n_chunks, chunk)

    def body(i, carry):
        best_d, best_i = carry  # (N, k)
        d = pairwise_sqdist(query, ref_c[i])
        d = jnp.where(mask_c[i][None, :], d, _BIG)
        neg_d, arg = jax.lax.top_k(-d, k)  # top-k smallest
        cand_d = jnp.concatenate([best_d, -neg_d], axis=-1)
        cand_i = jnp.concatenate([best_i, arg + i * chunk], axis=-1)
        neg_best, sel = jax.lax.top_k(-cand_d, k)
        best_i = jnp.take_along_axis(cand_i, sel, axis=-1)
        return -neg_best, best_i

    n = query.shape[0]
    init = (jnp.full((n, k), _BIG), jnp.zeros((n, k), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    return jnp.sqrt(best_d), best_i


@functools.partial(jax.jit, static_argnames=("block",))
def _fps_block(pts, valid, min_d, last, block: int):
    """One bounded FPS program: `block` sequential selections.

    Returns the updated running min-distance, the last selected index,
    and the `block` indices selected this program.
    """

    def body(i, carry):
        min_d, last, idxs = carry
        d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(jnp.where(valid, min_d, -1.0)).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return min_d, nxt, idxs

    idxs0 = jnp.zeros((block,), jnp.int32)
    return jax.lax.fori_loop(0, block, body, (min_d, last, idxs0))


def farthest_point_sampling(
    pts: jnp.ndarray, n_samples: int, mask: Optional[jnp.ndarray] = None, key=None
) -> jnp.ndarray:
    """Indices of `n_samples` farthest points (pytorch3d fps equivalent,
    generateCors.py:207-208, trainPose.py:336-338, genFeat.py:199-201).

    Iterative argmax over running min-distance: O(K*N), each step a fused
    VPU pass — MXU not needed.

    Host-blocked: selections run in bounded programs of FPS_BLOCK
    iterations each, with the (min_d, last) state carried on device and
    one small fetch per block.  A single 80k-selection fori_loop over a
    ~1.3M-point cloud (1280 views x 20 loops x 50 rays) runs for minutes
    and trips the TPU worker watchdog ("worker crashed", EXPERIMENTS.md
    round 4) — the same failure generate_cors hit before view-blocking.
    Runs with n_samples-1 <= FPS_BLOCK keep a single program, and the
    block decomposition is bit-identical to the monolithic loop (same
    op sequence, just partitioned — tested in test_pointcloud.py).
    """
    n = pts.shape[0]
    pts = jnp.asarray(pts)
    valid = jnp.ones((n,), bool) if mask is None else jnp.asarray(mask)
    start = jnp.argmax(valid).astype(jnp.int32)  # first valid point
    if n_samples <= 1:
        return start[None][:n_samples]
    block = min(int(os.environ.get("FPS_BLOCK", "8192")), n_samples - 1)
    min_d = jnp.full((n,), _BIG)
    last = start
    chunks = [np.asarray(start)[None]]
    remaining = n_samples - 1
    while remaining > 0:
        min_d, last, idxs = _fps_block(pts, valid, min_d, last, block)
        take = min(block, remaining)
        # the fetch syncs: bounds the in-flight program chain on the relay
        chunks.append(np.asarray(jax.device_get(idxs))[:take])
        remaining -= take
    return jnp.asarray(np.concatenate(chunks).astype(np.int32))


@functools.partial(jax.jit, static_argnames=("nb_points", "chunk"))
def radius_outlier_mask(
    pts: jnp.ndarray,
    nb_points: int,
    radius: float,
    mask: Optional[jnp.ndarray] = None,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Open3D remove_radius_outlier equivalent (generateCors.py:257):
    keep points with >= nb_points neighbors within radius (excluding self)."""
    n = pts.shape[0]
    valid = jnp.ones((n,), bool) if mask is None else mask
    pad = (-n) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    val_p = jnp.pad(valid, (0, pad))
    n_chunks = (n + pad) // chunk
    pc = pts_p.reshape(n_chunks, chunk, 3)
    vc = val_p.reshape(n_chunks, chunk)

    def body(i, count):
        d = pairwise_sqdist(pts, pc[i])
        within = (d <= radius * radius) & vc[i][None, :]
        return count + jnp.sum(within, axis=-1)

    counts = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((n,), jnp.int32))
    counts = counts - 1  # self
    return (counts >= nb_points) & valid


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(
    pts: jnp.ndarray, k: int = 64, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """PCA normals from the k-NN covariance (pytorch3d
    estimate_pointcloud_normals, generateCors.py:211).  The reference
    negates the result (generateCors.py:211 leading minus) — callers do
    orientation themselves."""
    d, idx = knn(pts, pts, k, ref_mask=mask)
    nbrs = pts[idx]  # (N, k, 3)
    mu = nbrs.mean(axis=1, keepdims=True)
    x = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", x, x, precision=jax.lax.Precision.HIGHEST) / k
    w, v = jnp.linalg.eigh(cov)
    return v[..., 0]  # eigenvector of smallest eigenvalue


def subsample_surface(pts, n_fps, normals_k, mask=None):
    """generateCors.py:204-215: FPS to n_fps points + PCA normals, oriented
    outward (reference flips sign of pytorch3d's result; we orient away
    from the centroid which matches for star-shaped objects)."""
    idx = farthest_point_sampling(pts, n_fps, mask)
    sub = pts[idx]
    normals = estimate_normals(sub, k=min(normals_k, n_fps))
    centroid = sub.mean(axis=0, keepdims=True)
    outward = jnp.sum(normals * (sub - centroid), axis=-1, keepdims=True)
    normals = normals * jnp.where(outward >= 0, 1.0, -1.0)
    return sub, normals, idx
