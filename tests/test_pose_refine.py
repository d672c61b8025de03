"""Rasterizer + refinement tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import rotvec_to_matrix
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.rasterize import render_object_coords
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import pose_refine
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer

S = 96


def sharp_features(pts):
    """High-frequency injective descriptor: gradient-based refinement needs
    features that change quickly on the surface (a trained SurfEmb head
    does; the smooth matching features in data/synthetic.py do not)."""
    f = jnp.concatenate(
        [jnp.sin(14.0 * pts), jnp.cos(11.0 * pts), jnp.sin(17.0 * pts[..., ::-1]), 2.0 * pts],
        axis=-1,
    )
    return 3.0 * f / jnp.linalg.norm(f, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(n_views=1, image_size=S)
    pts, ok = synthetic.analytic_surface_points(10000, jax.random.PRNGKey(5))
    pts_n = pts[np.asarray(ok)]
    scale = scene.diameter / 1.8
    verts = np.asarray(pts_n) * scale
    feats = np.asarray(sharp_features(pts_n))

    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)[0]
    z = np.abs(np.asarray(scene.t_bop)[:, 2])
    images, weights, bundle = renderer.render_grid_chunked(
        lambda p, d, m: synthetic.analytic_field(p, d, m),
        cam, S, 96, float(z.min() - 2), float(z.max() + 2),
        mode="feature", threshold_mode=True, threshold=0.5, chunk=S * S,
    )
    pos = raymarch.surface_points(bundle.origins, bundle.directions, bundle.lengths, weights)
    qmap = np.asarray(sharp_features(pos)).reshape(S, S, 12)
    # zero out non-object pixels: a trained CNN yields uninformative (not
    # adversarial) features there; the analytic stand-in would otherwise
    # produce garbage keys of the camera-origin point
    hit = (np.asarray(weights.sum(-1)) > 0).reshape(S, S)
    valid = (np.asarray(scene.sils[0]) > 0.5) & hit
    qmap = qmap * valid[..., None]
    K_inf = jnp.asarray(scene.K[0]).at[0:2, 2].add(-0.5)
    return scene, verts, feats, jnp.asarray(qmap, jnp.float32), K_inf, scale


def test_rasterizer_coords_project_back(setup):
    scene, verts, feats, qmap, K_inf, scale = setup
    R_gt = jnp.asarray(scene.R_bop[0], jnp.float32)
    t_gt = jnp.asarray(scene.t_bop[0], jnp.float32) * scale
    coords, mask = render_object_coords(jnp.asarray(verts, jnp.float32), R_gt, t_gt, K_inf, S)
    assert 0.05 < float(mask.mean()) < 0.95
    # each rendered coord must be an actual surface point that projects to
    # (approximately) its own pixel
    ys, xs = np.where(np.asarray(mask) > 0.5)
    c = np.asarray(coords)[ys, xs]
    xc = c @ np.asarray(R_gt).T + np.asarray(t_gt)
    u = np.asarray(K_inf)[0, 0] * xc[:, 0] / xc[:, 2] + np.asarray(K_inf)[0, 2]
    v = np.asarray(K_inf)[1, 1] * xc[:, 1] / xc[:, 2] + np.asarray(K_inf)[1, 2]
    err = np.hypot(u - xs, v - ys)
    assert np.median(err) < 1.0


def test_refine_improves_perturbed_pose(setup):
    """Translation-dominant perturbation: the log-prob objective has a
    clear basin in t (the analytic features are smooth, so rotation
    sensitivity is weak — matching the reference, which only refines t,
    pose_refine.py:95-104)."""
    scene, verts, feats, qmap, K_inf, scale = setup
    R_gt = jnp.asarray(scene.R_bop[0], jnp.float32)
    t_gt = jnp.asarray(scene.t_bop[0], jnp.float32) * scale
    # ~4-6 px of image-space error: large enough to clear the bilinear
    # discretization floor (~0.5 px), small enough to stay in the basin
    dR = rotvec_to_matrix(jnp.asarray([0.02, -0.015, 0.02]))
    R0 = dR @ R_gt
    t0 = t_gt + jnp.asarray([0.1, -0.08, 0.3]) * scale
    add0 = float(metrics.add_metric(jnp.asarray(verts, jnp.float32), R_gt, t_gt, R0, t0))
    R1, t1, score = pose_refine.refine_pose(
        R0, t0, qmap, K_inf,
        jnp.asarray(verts, jnp.float32), jnp.asarray(feats, jnp.float32),
        jax.random.PRNGKey(0), n_steps=40,
    )
    add1 = float(metrics.add_metric(jnp.asarray(verts, jnp.float32), R_gt, t_gt, R1, t1))
    assert add1 < add0 * 0.8, (add0, add1)


def test_refine_translation_only_keeps_rotation(setup):
    scene, verts, feats, qmap, K_inf, scale = setup
    R_gt = jnp.asarray(scene.R_bop[0], jnp.float32)
    t_gt = jnp.asarray(scene.t_bop[0], jnp.float32) * scale
    t0 = t_gt + jnp.asarray([0.1, 0.08, 0.4]) * scale
    R1, t1, score = pose_refine.refine_pose(
        R_gt, t0, qmap, K_inf,
        jnp.asarray(verts, jnp.float32), jnp.asarray(feats, jnp.float32),
        jax.random.PRNGKey(0), n_steps=30, translation_only=True,
    )
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R_gt), atol=1e-6)
    err0 = float(jnp.linalg.norm(t0 - t_gt))
    err1 = float(jnp.linalg.norm(t1 - t_gt))
    assert err1 < err0
