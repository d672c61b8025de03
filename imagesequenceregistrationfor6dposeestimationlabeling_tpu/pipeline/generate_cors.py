"""Correspondence precompute — generateCors.py rebuilt for TPU.

Per half-sequence, after NeRF training:

1. Extract + denoise the MC surface cloud (a1.npy) and its 1000-pt FPS
   subsample with normals (subvert1/subnormal1.npy)
   (generateCors.py:200-265).
2. For every training view, full-grid feature render with thresholded
   densities -> per-pixel front surface hits (posVec), then back rays from
   the front hits toward the camera-origin direction -> back hits
   (posVecBack); both filtered to within 0.1 of the mesh cloud
   (generateCors.py:268-361).

TPU design: the per-view render is one jitted fixed-shape computation over
all S*S pixels; silhouette masking and the mesh-distance filter produce a
boolean validity mask instead of dynamic filtering.  Host code compacts
per-view arrays once when writing the artifact bus (variable-length files
are fine on disk).
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import CorsConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel, mcubes
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer


def extract_surface(field, params, cfg: CorsConfig, grid_res: int = 128):
    """Steps: density grid -> marching tetrahedra -> radius-outlier removal
    -> FPS-1000 + normals.  Returns (mverts, subverts, subnormals)."""
    import time as _time

    _t = [_time.perf_counter()]

    def _mark(name):
        # CORS_TIMING=1 sub-stage prints (this function is the cors phase
        # pole after the round-5 view-block pipelining: 0.7-1.0 s/half at
        # bench scale, EXPERIMENTS.md round 5)
        if os.environ.get("CORS_TIMING"):
            now = _time.perf_counter()
            print(f"    surface[{name}]: {now - _t[0]:.3f} s")
            _t[0] = now

    grid = renderer.density_grid_cached(field, params, grid_res=grid_res)
    grid = np.asarray(grid)
    _mark("density_grid")
    verts_idx, _tris = mcubes.marching_tetrahedra(grid, cfg.density_threshold)
    _mark("march_tets")
    if verts_idx.shape[0] < 10:
        raise RuntimeError(
            f"surface extraction found {verts_idx.shape[0]} vertices at density "
            f"threshold {cfg.density_threshold} — the NeRF has not converged "
            "(train longer / check LR warmup) or the threshold is too high"
        )
    mverts = mcubes.index_to_world(verts_idx, grid_res, exact=True)
    mverts_j = jnp.asarray(mverts, jnp.float32)
    keep = np.asarray(pc.radius_outlier_mask(mverts_j, cfg.outlier_nb_points, cfg.outlier_radius))
    _mark("radius_outlier")
    mverts = np.asarray(mverts)[keep]
    if mverts.shape[0] < 10:
        raise RuntimeError(
            f"surface denoising kept {mverts.shape[0]} of {keep.shape[0]} vertices "
            f"(radius-outlier nb_points={cfg.outlier_nb_points}, "
            f"radius={cfg.outlier_radius}) — the extracted surface is too sparse "
            "for these filters (train the NeRF longer or loosen the smoke-scale "
            "filters)"
        )
    mverts_j = jnp.asarray(mverts, jnp.float32)
    n_sub = min(cfg.n_subsurface, mverts.shape[0])
    sub, normals, _ = pc.subsample_surface(mverts_j, n_sub, normals_k=min(cfg.normals_k, n_sub))
    sub, normals = jax.device_get((sub, normals))  # one round-trip, not two
    _mark("fps_normals")
    return mverts, sub, normals


@functools.partial(
    jax.jit, static_argnames=("field", "image_size", "n_pts", "use_kernel")
)
def view_surface_hits(
    field,
    params,
    cam: cam_lib.Camera,
    sel_idx: jnp.ndarray,
    sel_valid: jnp.ndarray,
    mverts_pad: jnp.ndarray,
    mverts_mask: jnp.ndarray,
    image_size: int,
    n_pts: int,
    min_depth: float,
    max_depth: float,
    threshold: float,
    mesh_dist: float,
    back_div: float,
    use_kernel: bool = True,
):
    """One view's front + back surface hits over a fixed budget of
    silhouette pixels (``sel_idx``: (M,) flat row-major indices, padded;
    ``sel_valid``: padding mask).  Restricting rays to the silhouette is
    the reference's maskRays=True (pren.py:207-213, generateCors.py:300) —
    it cuts the render cost by the background fraction (~2-3x).

    Both passes are density-only: the reference renders mode='feature'
    here (generateCors.py:300) but never uses the composited features —
    only the weights (for posVec) — so evaluating the feature head per
    sample point would be pure waste.  ``use_kernel=False`` forces the
    flax density path (required under a >1-device mesh: XLA auto-SPMD
    cannot partition the Pallas custom call).

    Returns dict of arrays + validity masks.
    """
    dens_fn = field_kernel.density_eval_fn(field, params) if use_kernel else (
        lambda pts: field.apply(params, pts, method=field.density))

    def field_fn(pts, dirs, mode):
        dens = dens_fn(pts)
        return dens, dens  # composited "features" are discarded by this caller

    # Front pass: silhouette-pixel rays, thresholded EA weights.
    bundle = cam_lib.rays_at_pixels(cam, sel_idx, image_size, n_pts, min_depth, max_depth)
    images, weights = renderer.render_rays_chunked(
        field_fn,
        bundle,
        mode="density",
        threshold_mode=True,
        threshold=threshold,
        chunk=min(32768, sel_idx.shape[0]),
    )
    pos_vec = raymarch.surface_points(bundle.origins, bundle.directions, bundle.lengths, weights)
    hit = weights.sum(-1) > 0  # ray actually crossed the surface
    d_mesh, _ = pc.nn_query(pos_vec, mverts_pad, ref_mask=mverts_mask)
    front_valid = sel_valid & hit & (d_mesh < mesh_dist)

    # Back pass (generateCors.py:323-334): rays from the front hit pointing
    # along -normalize(camera origin); lengths rescaled by /3.
    back = renderer.back_ray_bundle(bundle._replace(origins=bundle.origins), pos_vec, div=back_div)

    def back_density(args):
        o, d, l = args
        pts = o[:, None, :] + d[:, None, :] * l[:, :, None]
        return dens_fn(pts)[..., 0]

    chunk = min(32768, sel_idx.shape[0])
    n = back.origins.shape[0]
    n_chunks = n // chunk if n % chunk == 0 else n // chunk + 1
    pad = n_chunks * chunk - n
    o = jnp.pad(back.origins, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    dd = jnp.pad(back.directions, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    ll = jnp.pad(back.lengths, ((0, pad), (0, 0))).reshape(n_chunks, chunk, n_pts)
    dens = jax.lax.map(back_density, (o, dd, ll)).reshape(-1, n_pts)[:n]
    bw = raymarch.back_weights(dens, threshold_mode=True, threshold=0.05)
    back_vec = raymarch.surface_points(back.origins, back.directions, back.lengths, bw)
    d_mesh_b, _ = pc.nn_query(back_vec, mverts_pad, ref_mask=mverts_mask)
    back_valid = front_valid & (bw.sum(-1) > 0) & (d_mesh_b < mesh_dist)

    return {
        "xys": bundle.xys,
        "pos_vec": pos_vec,
        "front_valid": front_valid,
        "back_vec": back_vec,
        "back_valid": back_valid,
    }


@functools.partial(jax.jit, static_argnames=("field", "image_size", "n_pts", "mesh"))
def views_surface_hits(
    field,
    params,
    cams: cam_lib.Camera,      # (V, ...) camera bank
    sel_idx: jnp.ndarray,      # (V, M)
    sel_valid: jnp.ndarray,    # (V, M)
    mverts_pad: jnp.ndarray,
    mverts_mask: jnp.ndarray,
    image_size: int,
    n_pts: int,
    min_depth: float,
    max_depth: float,
    threshold: float,
    mesh_dist: float,
    back_div: float,
    mesh=None,
):
    """ALL views' front+back surface hits in ONE program: a lax.map over
    the view axis (sequential per view, so HBM stays at one view's
    footprint) replacing V separate ~40-90 ms relay dispatches.  The
    reference loops views in Python (generateCors.py:268).

    With a ``mesh``, views are processed in mesh-sized groups — each group
    vmapped with the view axis sharded over 'data', so every device owns
    one view's render (SURVEY §2c view-axis DP for this stage).

    Single-device, the sequential per-view lax.map stays: a vmap-block
    variant (views batched 8 at a time) measured bit-identical outputs
    but NO win (1.25 vs 1.09 s warm for 8 views x 16k rays — the phase
    is device-compute-bound, not dispatch-bound; EXPERIMENTS.md round
    4), so the simpler single-view program shape is kept."""

    multi = mesh is not None and mesh.devices.size > 1

    def one(args):
        R, T, f, p, si, sv = args
        cam = cam_lib.Camera(R, T, f, p, image_size)
        return view_surface_hits(
            field, params, cam, si, sv, mverts_pad, mverts_mask,
            image_size, n_pts, min_depth, max_depth, threshold, mesh_dist,
            back_div, use_kernel=not multi,
        )

    args = (cams.R, cams.T, cams.focal, cams.principal, sel_idx, sel_valid)
    if mesh is None or mesh.devices.size <= 1:
        return jax.lax.map(one, args)
    V = int(cams.R.shape[0])

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import (
        mesh as mesh_lib,
    )

    g = int(mesh.devices.size)
    pad = (-V) % g

    def pad_group(x):
        x = jnp.asarray(x)
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)])
        return x.reshape((V + pad) // g, g, *x.shape[1:])

    grouped = jax.tree.map(pad_group, args)

    def group(a):
        a = jax.tree.map(
            lambda x: mesh_lib.constrain(x, mesh, (mesh_lib.DATA_AXIS,)), a
        )
        return jax.vmap(one)(a)

    out = jax.lax.map(group, grouped)
    return jax.tree.map(lambda x: x.reshape(V + pad, *x.shape[2:])[:V], out)


def _pad_cloud(verts: np.ndarray, multiple: int = 8192):
    n = verts.shape[0]
    padded = int(np.ceil(max(n, 1) / multiple) * multiple)
    out = np.zeros((padded, 3), np.float32)
    out[:n] = verts
    mask = np.zeros((padded,), bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


def generate_cors(
    field,
    params,
    R_bop,
    t_bop,
    K,
    sils,
    out_dir: str,
    objid,
    cfg: CorsConfig = CorsConfig(),
    grid_res: int = 128,
    image_size: int | None = None,
    depth_margin: float = 2.0,
    mesh="auto",
):
    """Run the full correspondence precompute and write the artifact bus.

    ``sils`` may be at a different resolution than ``image_size``; the
    reference re-loads data at render_size=224 (generateCors.py:97).
    On a multi-device mesh the fresh-run path shards the view axis.
    """
    if mesh == "auto":
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import (
            mesh as mesh_lib,
        )

        mesh = mesh_lib.auto_mesh()
    if mesh is not None and params is not None:
        # trained params arrive committed to one device; the sharded view
        # program constrains over the whole mesh — replicate them first
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import (
            mesh as mesh_lib,
        )

        params = mesh_lib.replicate(params, mesh)
    S = image_size or cfg.render_size
    cors = artifacts.cors_dir(out_dir, objid)
    os.makedirs(cors, exist_ok=True)

    # CORS_TIMING=1: per-stage wall prints (experiments/cors_e2e_probe.py)
    import time as _time

    _t = [_time.perf_counter()]

    def _mark(name):
        if os.environ.get("CORS_TIMING"):
            now = _time.perf_counter()
            print(f"  cors[{name}]: {now - _t[0]:.2f} s")
            _t[0] = now

    mverts, sub, subnormals = extract_surface(field, params, cfg, grid_res)
    _mark("extract_surface")
    artifacts.save_array(cors, "a1.npy", mverts)
    artifacts.save_array(cors, "subvert1.npy", sub)
    artifacts.save_array(cors, "subnormal1.npy", subnormals)
    _mark("save_surface")

    mverts_pad, mverts_mask = _pad_cloud(mverts)
    cam_all = cam_lib.camera_from_bop(jnp.asarray(R_bop), jnp.asarray(t_bop), jnp.asarray(K), S)
    z = np.abs(np.asarray(t_bop)[:, 2])
    min_d, max_d = float(z.min() - depth_margin), float(z.max() + depth_margin)

    # fixed silhouette-pixel budget shared by all views (one compiled shape)
    sil_flat = np.asarray(sils).reshape(np.asarray(R_bop).shape[0], -1) > 0.5
    max_count = max(int(sil_flat.sum(axis=1).max()), 1)
    budget = min(S * S, int(np.ceil(max_count / 8192)) * 8192)

    n_views = np.asarray(R_bop).shape[0]
    pending = [i for i in range(n_views) if not artifacts.has_view_rays(cors, S, i)]

    def view_sel(i):
        idx = np.where(sil_flat[i])[0]
        if idx.size == 0:
            idx = np.zeros((1,), np.int64)
        k = min(idx.size, budget)
        sel = np.zeros((budget,), np.int32)
        sel[:k] = idx[:k]
        sel_valid = np.zeros((budget,), bool)
        sel_valid[:k] = True
        return sel, sel_valid

    def save_view(i, out, v=None):
        pick = (lambda a: a[v]) if v is not None else (lambda a: a)
        fv = np.asarray(pick(out["front_valid"]))
        bv = np.asarray(pick(out["back_valid"]))
        xys = np.asarray(pick(out["xys"]))
        artifacts.save_view_rays(
            cors, S, i,
            xys[fv], np.asarray(pick(out["pos_vec"]))[fv],
            xys[bv], np.asarray(pick(out["back_vec"]))[bv],
        )

    hit_args = (
        mverts_pad, mverts_mask, S, cfg.grid_pts_per_ray, min_d, max_d,
        cfg.density_threshold, cfg.mesh_filter_dist, cfg.back_len_div,
    )
    if len(pending) == n_views:
        # fresh run: views batched into one device program per BLOCK (lax.map
        # over views), then ONE device->host fetch per block — per-view
        # np.asarray compaction would cost 5 arrays x V views of ~50 ms
        # relay round-trips each (seconds of pure dispatch per half).
        # Blocks are capped at `view_block`: a single program over 1280
        # views at 224^2 runs for tens of minutes and trips the TPU
        # worker's watchdog ("worker crashed", EXPERIMENTS.md round 4);
        # blocks also bound HBM for the fetched result.  Runs with
        # <= view_block views (the bench) keep their exact single-program
        # shape and compile cache.
        #
        # Pipelining (VERDICT r4 next #5): ALL block programs are
        # dispatched up-front (JAX async dispatch keeps the device busy
        # back-to-back; each block stays a watchdog-sized program), then
        # fetched in order while a small thread pool writes the per-view
        # artifacts — host np.save I/O overlaps device render of the
        # later blocks instead of serializing after each fetch.
        from concurrent.futures import ThreadPoolExecutor

        view_block = int(os.environ.get("CORS_VIEW_BLOCK", "128"))
        sels = np.stack([view_sel(i)[0] for i in pending])
        vals = np.stack([view_sel(i)[1] for i in pending])
        dispatched = []
        for b0 in range(0, n_views, view_block):
            blk = list(range(b0, min(b0 + view_block, n_views)))
            real = len(blk)
            if b0 > 0 and real < view_block:
                # pad the tail block to the same compiled shape
                blk = blk + [blk[-1]] * (view_block - real)
            cam_blk = cam_lib.Camera(
                cam_all.R[np.asarray(blk)], cam_all.T[np.asarray(blk)],
                cam_all.focal[np.asarray(blk)], cam_all.principal[np.asarray(blk)],
                cam_all.image_size,
            )
            res = views_surface_hits(
                field, params, cam_blk,
                jnp.asarray(sels[np.asarray(blk)]), jnp.asarray(vals[np.asarray(blk)]),
                *hit_args, mesh=mesh,
            )
            dispatched.append((blk, real, res))
        _mark("views_render_dispatch")
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = []
            for blk, real, res in dispatched:
                out = jax.device_get(res)
                futs.extend(pool.submit(save_view, i, out, v)
                            for v, i in enumerate(blk[:real]))
            _mark("views_fetch")
            for f in futs:
                f.result()  # surface write errors
        _mark("views_save")
    else:
        # partial resume: per-view programs for just the missing views
        # (idempotent skip, generateCors.py:277-278)
        for i in pending:
            sel, sel_valid = view_sel(i)
            out = jax.device_get(view_surface_hits(
                field, params, cam_all[i], jnp.asarray(sel), jnp.asarray(sel_valid),
                *hit_args,
            ))
            save_view(i, out)
    return cors
