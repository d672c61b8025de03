"""The disk artifact bus.

The reference's stages communicate only through files (SURVEY.md §1):
checkpoints, ``.npy`` arrays and per-view ``.pt`` ray dumps with the
directory convention ``{UH}_{dataset}_obj_{objid}/...``.  We keep the same
tree and stems but store numpy (``.npy``/``.npz``) instead of torch
pickles.

Layout per half-sequence experiment dir (exp):
  exp/<obj>Cors/a1.npy                    denoised MC surface cloud
  exp/<obj>Cors/subvert1.npy              1000-pt FPS subsample
  exp/<obj>Cors/subnormal1.npy            normals of the subsample
  exp/<obj>Cors/224_posVec/<i>.npy        per-view front surface hits
  exp/<obj>Cors/224_sampledRayxys/<i>.npy per-view ray xys (NDC)
  exp/<obj>Cors/224_posVecBack/<i>.npy    per-view back hits
  exp/<obj>Cors/224_sampledRayBackxys/<i>.npy
  exp/<obj>poseEst/negVec.npy             negative key cloud
  exp/<obj>poseEst/vert1_scaled.npy       baked surface points (CAD scale)
  exp/<obj>poseEst/feat1_scaled.npy       baked 12-d features
  exp/<obj>poseEst/normals_scaled.npy
  exp/<obj>pred_R.npy, <obj>pred_t.npy    per-image pose dumps
"""

from __future__ import annotations

import os

import numpy as np


def cors_dir(exp_dir: str, objid) -> str:
    return os.path.join(exp_dir, f"{objid}Cors")


def pose_dir(exp_dir: str, objid) -> str:
    return os.path.join(exp_dir, f"{objid}poseEst")


def nerf_dir(exp_dir: str, objid) -> str:
    return os.path.join(exp_dir, f"{objid}TLESSObj_Fine")


def save_view_rays(cors: str, render_size: int, view_id: int, xys, pos_vec, back_xys, back_vec):
    for sub, arr in [
        (f"{render_size}_sampledRayxys", xys),
        (f"{render_size}_posVec", pos_vec),
        (f"{render_size}_sampledRayBackxys", back_xys),
        (f"{render_size}_posVecBack", back_vec),
    ]:
        d = os.path.join(cors, sub)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"{view_id}.npy"), np.asarray(arr))


def load_view_rays(cors: str, render_size: int, view_id: int):
    out = []
    for sub in [
        f"{render_size}_sampledRayxys",
        f"{render_size}_posVec",
        f"{render_size}_sampledRayBackxys",
        f"{render_size}_posVecBack",
    ]:
        out.append(np.load(os.path.join(cors, sub, f"{view_id}.npy")))
    return tuple(out)


def has_view_rays(cors: str, render_size: int, view_id: int) -> bool:
    return os.path.exists(os.path.join(cors, f"{render_size}_posVec", f"{view_id}.npy"))


def save_array(path_dir: str, name: str, arr):
    os.makedirs(path_dir, exist_ok=True)
    np.save(os.path.join(path_dir, name), np.asarray(arr))


def load_array(path_dir: str, name: str):
    return np.load(os.path.join(path_dir, name))


def load_keys(pose_d: str, trim: bool = True):
    """Load the baked surface arrays (vert1/feat1/normals_scaled) with the
    cycled pad tail removed.

    gen_feat cycles points up to a bucket boundary for compile-cache
    stability and records the true count in ``n_keys.npy``.  Duplicated
    prefix points are harmless for argmax correspondence but double-weight
    the cycled prefix in ICP least-squares, Chamfer means and ADD means —
    every metric/registration consumer must use the trimmed arrays.
    Returns (verts, feats, normals, n_real); ``trim=False`` keeps the
    padded arrays (correspondence consumers) while still reporting n_real.
    """
    verts = load_array(pose_d, "vert1_scaled.npy")
    feats = load_array(pose_d, "feat1_scaled.npy")
    normals_p = os.path.join(pose_d, "normals_scaled.npy")
    normals = np.load(normals_p) if os.path.exists(normals_p) else None
    n_keys_p = os.path.join(pose_d, "n_keys.npy")
    n_real = int(np.load(n_keys_p)[0]) if os.path.exists(n_keys_p) else verts.shape[0]
    if trim:
        verts = verts[:n_real]
        feats = feats[:n_real]
        if normals is not None:
            normals = normals[:n_real]
    return verts, feats, normals, n_real
