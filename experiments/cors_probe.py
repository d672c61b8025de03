"""Split the cors phase cost (bench: ~11.5 s for 2 halves) into
surface-extraction (device grid + HOST marching tetrahedra + filters) vs
the all-views surface-hit render (one device program).

Uses the cached bench scenes + a freshly trained tiny-step NeRF?  No —
training to convergence here would cost a minute; instead the field is
initialized and the density threshold dropped so marching tetrahedra sees
a comparable vertex load.  The probe reports wall seconds per stage at the
bench's shapes (224^2 views, 128^3 grid), which is what the bench pays.

Usage: python experiments/cors_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import CorsConfig, FieldConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import mcubes, pointcloud as pc
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import generate_cors
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer

S, GRID, V = 224, 128, 8


def main():
    field = fields.NerfField(FieldConfig())
    params = fields.init_field(field, jax.random.PRNGKey(0))
    cfg = CorsConfig(density_threshold=0.0005)  # fresh init -> low density

    def dens_fn(pts):
        return field.apply(params, pts, method=field.density)

    # --- stage 1a: density grid (device)
    jit_dens = jax.jit(dens_fn)
    for it in range(2):
        t0 = time.perf_counter()
        grid = renderer.density_grid(jit_dens, grid_res=GRID)
        float(grid[0, 0, 0])  # fetch = the only real sync on the axon relay
        t_grid = time.perf_counter() - t0
    print(f"density_grid {GRID}^3 (device): {t_grid:6.2f} s")

    # --- stage 1b: marching tetrahedra (host C++) on an analytic sphere
    # grid — the fresh-init field has no surface, and what matters here is
    # the host cost at a REALISTIC vertex count (bench surfaces: 30-80k)
    lin = np.linspace(-1, 1, GRID, dtype=np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (0.7 - np.sqrt(X**2 + Y**2 + Z**2)).clip(0) * 2.0
    for it in range(2):
        t0 = time.perf_counter()
        verts_idx, _ = mcubes.marching_tetrahedra(g, 0.2)
        t_mc = time.perf_counter() - t0
    print(f"marching_tetrahedra (host): {t_mc:6.2f} s -> {verts_idx.shape[0]} verts")

    mverts = mcubes.index_to_world(verts_idx, GRID, exact=True)

    # --- stage 1c: outlier filter + FPS-1000 + normals (device+host mix)
    mj = jnp.asarray(mverts, jnp.float32)
    for it in range(2):
        t0 = time.perf_counter()
        keep = pc.radius_outlier_mask(mj, cfg.outlier_nb_points, cfg.outlier_radius)
        kept = np.asarray(mverts)[np.asarray(keep)]
        kj = jnp.asarray(kept, jnp.float32)
        sub, normals, _ = pc.subsample_surface(
            kj, min(cfg.n_subsurface, kept.shape[0]), normals_k=cfg.normals_k
        )
        float(normals[0, 0])  # fetch-sync
        t_filt = time.perf_counter() - t0
    print(f"outlier+FPS+normals: {t_filt:6.2f} s ({mverts.shape[0]} -> {kept.shape[0]} pts)")

    # --- stage 2: all-views front+back hit render (one device program)
    rng = np.random.default_rng(1)
    R = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    t = np.zeros((V, 3), np.float32)
    t[:, 2] = 10.0
    K = np.tile(
        np.array([[2 * S, 0, S / 2], [0, 2 * S, S / 2], [0, 0, 1]], np.float32), (V, 1, 1)
    )
    cam_all = cam_lib.camera_from_bop(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K), S)
    budget = 16384  # typical silhouette budget at 224^2 (bench scenes)
    sel = np.stack([rng.permutation(S * S)[:budget].astype(np.int32) for _ in range(V)])
    val = np.ones((V, budget), bool)
    mpad, mmask = generate_cors._pad_cloud(np.asarray(mverts[:40000]))
    for it in range(2):
        t0 = time.perf_counter()
        out = generate_cors.views_surface_hits(
            field, params, cam_all, jnp.asarray(sel), jnp.asarray(val), mpad, mmask,
            S, cfg.grid_pts_per_ray, 8.0, 12.0, cfg.density_threshold,
            cfg.mesh_filter_dist, cfg.back_len_div,
        )
        float(out["pos_vec"][0, 0, 0])  # fetch-sync
        t_views = time.perf_counter() - t0
        tag = "cold" if it == 0 else "warm"
        print(f"views_surface_hits {V} views x {budget} rays ({tag}): {t_views:6.2f} s")

    total = t_grid + t_mc + t_filt + t_views
    print(f"per-half total (warm): {total:6.2f} s -> x2 halves = {2 * total:6.2f} s")


if __name__ == "__main__":
    main()
