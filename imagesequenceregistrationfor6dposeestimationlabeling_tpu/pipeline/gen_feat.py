"""Feature baking — genFeat.py rebuilt.

After descriptor training, bake per-surface-point features at CAD scale
(genFeat.py:160-228):

1. sample surface hits over all views (19 loops), FPS -> 80k,
2. keep |x| < 1.2, marching-cubes mesh at threshold 0.05 for normals,
3. keep hits within 0.05 of the mesh; normals from the nearest mesh vertex,
4. evaluate the (trained) feature head at the points,
5. scale verts to CAD units by diam/1.8, save
   vert1_scaled.npy / feat1_scaled.npy / normals_scaled.npy.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FeatConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import mcubes
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, surface_sampling
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer


def gen_feat(
    field,
    params,
    R_bop,
    t_bop,
    K,
    sils,
    diameter: float,
    out_dir: str,
    objid,
    cfg: FeatConfig = FeatConfig(),
    image_size: int = 224,
    rays_per_image: int = 50,
    grid_res: int = 128,
    diam_scaling: float = 1.8,
    seed: int = 0,
    threshold: float = 0.2,
):
    pose = artifacts.pose_dir(out_dir, objid)
    os.makedirs(pose, exist_ok=True)

    hits = surface_sampling.sample_surface_hits(
        field,
        params,
        R_bop,
        t_bop,
        K,
        sils,
        n_loops=cfg.sample_loops,
        rays_per_image=rays_per_image,
        image_size=image_size,
        threshold=threshold,
        seed=seed,
    )
    hits_j = jnp.asarray(hits, jnp.float32)
    n_fps = min(cfg.n_points, hits.shape[0])
    idx = pc.farthest_point_sampling(hits_j, n_fps)
    pts = np.asarray(hits_j[idx])
    pts = pts[np.abs(pts).max(-1) < cfg.bound]

    # Mesh at the finer threshold for normals (genFeat.py:206-212).
    grid = renderer.density_grid_cached(field, params, grid_res=grid_res)
    verts_idx, tris = mcubes.marching_tetrahedra(np.asarray(grid), cfg.mc_threshold)
    if verts_idx.shape[0] < 4:
        raise RuntimeError(
            f"gen_feat: marching cubes found {verts_idx.shape[0]} vertices at "
            f"density threshold {cfg.mc_threshold} — the field has no surface "
            "at this level (undertrained NeRF or wrong threshold for an "
            "analytic field)"
        )
    mverts = mcubes.index_to_world(verts_idx, grid_res, exact=True)
    mnormals = mcubes.vertex_normals(mverts, tris)

    d, nn_idx = pc.nn_query(jnp.asarray(pts), jnp.asarray(mverts, jnp.float32))
    close = np.asarray(d) < cfg.mesh_dist
    pts = pts[close]
    normals = mnormals[np.asarray(nn_idx)[close]]
    if pts.shape[0] == 0:
        raise RuntimeError(
            f"gen_feat: no surface hits within mesh_dist={cfg.mesh_dist} of the "
            "marching-cubes mesh — hit threshold and mc_threshold disagree "
            "about where the surface is"
        )

    n_real = pts.shape[0]
    if cfg.pad_multiple > 1 and n_real > 0:
        # cycle points up to the bucket boundary (duplicate keys are
        # harmless for argmax correspondence and keep shapes stable across
        # runs — see FeatConfig.pad_multiple).  The true count is saved in
        # n_keys.npy so metric/registration consumers can trim the cycled
        # tail (duplicates would double-weight the cycled prefix in
        # ADD means and ICP least-squares).
        target = int(np.ceil(n_real / cfg.pad_multiple) * cfg.pad_multiple)
        reps = np.resize(np.arange(n_real), target)
        pts = pts[reps]
        normals = normals[reps]

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields as _fields

    feats = np.asarray(_fields.eval_features(field, params, jnp.asarray(pts)))

    scale = diameter / diam_scaling
    artifacts.save_array(pose, "vert1_scaled.npy", pts * scale)
    artifacts.save_array(pose, "feat1_scaled.npy", feats)
    artifacts.save_array(pose, "normals_scaled.npy", normals)
    artifacts.save_array(pose, "n_keys.npy", np.asarray([n_real]))
    return pts * scale, feats, normals
