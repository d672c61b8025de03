"""Correspondence precompute + feature baking against the analytic field."""

import numpy as np
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import CorsConfig, FeatConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, generate_cors, gen_feat

S = 48


@pytest.fixture(scope="module")
def cors_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp"))
    scene = synthetic.make_scene(n_views=4, image_size=S)
    field = synthetic.AnalyticField()
    cfg = CorsConfig(
        render_size=S,
        grid_pts_per_ray=96,
        density_threshold=0.5,
        mesh_filter_dist=0.1,
        outlier_nb_points=5,
        outlier_radius=0.15,
        n_subsurface=300,
        normals_k=48,
    )
    cors = generate_cors.generate_cors(
        field, None, scene.R_bop, scene.t_bop, scene.K, scene.sils, out, 1, cfg, grid_res=48
    )
    return scene, field, cors, out


def test_surface_artifacts(cors_run):
    scene, field, cors, out = cors_run
    a1 = artifacts.load_array(cors, "a1.npy")
    sub = artifacts.load_array(cors, "subvert1.npy")
    nrm = artifacts.load_array(cors, "subnormal1.npy")
    assert a1.shape[0] > 300 and sub.shape == (300, 3) and nrm.shape == (300, 3)
    dens = np.asarray(synthetic.analytic_density(jnp.asarray(a1)))[:, 0]
    assert ((dens > 0.05) & (dens < 0.95)).mean() > 0.9  # verts on the isosurface band


def test_per_view_hits_on_surface(cors_run):
    scene, field, cors, out = cors_run
    xys, pos_vec, back_xys, back_vec = artifacts.load_view_rays(cors, S, 0)
    assert pos_vec.shape[0] > 50
    dens = np.asarray(synthetic.analytic_density(jnp.asarray(pos_vec)))[:, 0]
    assert np.median(dens) > 0.2  # front hits at/inside the surface shell
    # front hits reproject onto their own pixels
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)[0]
    xy_proj, _ = cam_lib.project_points(cam, jnp.asarray(pos_vec))
    pix_proj = np.asarray(cam_lib.ndc_to_pixel(xy_proj, S))
    pix_orig = np.asarray(cam_lib.ndc_to_pixel(jnp.asarray(xys), S))
    err = np.linalg.norm(pix_proj - pix_orig, axis=-1)
    assert np.median(err) < 1.0, np.median(err)


def test_back_hits_behind_front(cors_run):
    scene, field, cors, out = cors_run
    xys, pos_vec, back_xys, back_vec = artifacts.load_view_rays(cors, S, 0)
    assert back_vec.shape[0] > 20
    dens = np.asarray(synthetic.analytic_density(jnp.asarray(back_vec)))[:, 0]
    assert np.median(dens) > 0.02  # back hits on the object's far shell
    # back hits sit behind their corresponding front hits along the ray
    # (they are a subset, so compare distances from the world origin side)
    cam_o_dir = None  # direction is -normalize(camera origin), shared per view


def test_gen_feat_artifacts(cors_run):
    scene, field, cors, out = cors_run
    cfg = FeatConfig(n_points=2000, mc_threshold=0.5, mesh_dist=0.1, sample_loops=3)
    verts, feats, normals = gen_feat.gen_feat(
        field,
        None,
        scene.R_bop,
        scene.t_bop,
        scene.K,
        scene.sils,
        scene.diameter,
        out,
        1,
        cfg,
        image_size=S,
        rays_per_image=64,
        grid_res=48,
        threshold=0.5,
    )
    assert verts.shape[0] > 200
    # baked arrays are cycled up to the pad_multiple bucket: stable key
    # count across runs -> downstream programs reuse their compile cache
    assert verts.shape[0] % cfg.pad_multiple == 0
    assert feats.shape == (verts.shape[0], 12)
    assert normals.shape == verts.shape
    # padded tail entries are cycled copies of real points, not zeros
    assert np.abs(verts[-1]).max() > 0
    # saved at CAD scale: diameter/1.8 multiplier
    scale = scene.diameter / 1.8
    dens = np.asarray(synthetic.analytic_density(jnp.asarray(verts / scale)))[:, 0]
    assert ((dens > 0.02) & (dens < 0.98)).mean() > 0.8
    # features match the analytic features of the unscaled points
    expect = np.asarray(synthetic.analytic_features(jnp.asarray(verts / scale)))
    np.testing.assert_allclose(feats, expect, atol=1e-4)
    # normals roughly outward (positive dot with radial dir for blobby shape)
    radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    cos = np.sum(normals * radial, -1)
    assert np.median(cos) > 0.3


def test_resume_per_view_matches_batched(cors_run):
    """Deleting one view's dumps and re-running takes the per-view resume
    path; its artifacts must equal the batched all-views program's."""
    import os
    import shutil

    scene, field, cors, out = cors_run
    orig = artifacts.load_view_rays(cors, S, 2)
    for sub in (f"{S}_sampledRayxys", f"{S}_posVec",
                f"{S}_sampledRayBackxys", f"{S}_posVecBack"):
        os.remove(os.path.join(cors, sub, "2.npy"))
    assert not artifacts.has_view_rays(cors, S, 2)
    cfg = CorsConfig(
        render_size=S, grid_pts_per_ray=96, density_threshold=0.5,
        mesh_filter_dist=0.1, outlier_nb_points=5, outlier_radius=0.15,
        n_subsurface=300, normals_k=48,
    )
    generate_cors.generate_cors(
        field, None, scene.R_bop, scene.t_bop, scene.K, scene.sils, out, 1,
        cfg, grid_res=48,
    )
    redone = artifacts.load_view_rays(cors, S, 2)
    for a, b in zip(orig, redone):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_generate_cors_view_blocks_match_single_program(tmp_path, monkeypatch):
    """Round 4: large view counts run one program per block (the 1280-view
    single program tripped the TPU worker watchdog).  Blocked output must
    equal the single-program output, including a padded tail block."""
    import os

    scene = synthetic.make_scene(n_views=5, image_size=32)
    field = synthetic.AnalyticField()
    cfg = CorsConfig(
        render_size=32, grid_pts_per_ray=64, density_threshold=0.5,
        mesh_filter_dist=0.15, outlier_nb_points=4, outlier_radius=0.2,
        n_subsurface=200, normals_k=48,
    )
    out_a = str(tmp_path / "single")
    cors_a = generate_cors.generate_cors(
        field, None, scene.R_bop, scene.t_bop, scene.K, scene.sils, out_a, 1,
        cfg, grid_res=40,
    )
    monkeypatch.setenv("CORS_VIEW_BLOCK", "2")  # 5 views -> 2+2+padded tail
    out_b = str(tmp_path / "blocked")
    cors_b = generate_cors.generate_cors(
        field, None, scene.R_bop, scene.t_bop, scene.K, scene.sils, out_b, 1,
        cfg, grid_res=40,
    )
    for i in range(5):
        a = artifacts.load_view_rays(cors_a, 32, i)
        b = artifacts.load_view_rays(cors_b, 32, i)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
