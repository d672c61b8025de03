"""SurfEmb hypothesis sampler/scorer: GT pose must rank at/near the top."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import pose_est_surf
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer

# res/3 = 48 correspondence grid: P3P from 4-point minimal sets needs this
# resolution for usable hypotheses (the reference runs 224/3 = 74)
S = 144


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(n_views=1, image_size=S)
    pts, ok = synthetic.analytic_surface_points(8000, jax.random.PRNGKey(3))
    pts_n = pts[np.asarray(ok)]
    scale = scene.diameter / 1.8
    verts = np.asarray(pts_n) * scale
    feats = np.asarray(synthetic.analytic_features(pts_n))
    normals = np.asarray(pts_n / jnp.linalg.norm(pts_n, axis=-1, keepdims=True))

    # ideal query map + mask logits for view 0
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)[0]
    z = np.abs(np.asarray(scene.t_bop)[:, 2])
    images, weights, bundle = renderer.render_grid_chunked(
        lambda p, d, m: synthetic.analytic_field(p, d, m),
        cam, S, 96, float(z.min() - 2), float(z.max() + 2),
        mode="feature", threshold_mode=True, threshold=0.5, chunk=S * S,
    )
    pos = raymarch.surface_points(bundle.origins, bundle.directions, bundle.lengths, weights)
    qmap = np.asarray(synthetic.analytic_features(pos)).reshape(S, S, 12)
    sil = np.asarray(scene.sils[0])
    mask_lgts = jnp.asarray(sil * 12.0 - 6.0, jnp.float32)
    return scene, verts, feats, normals, jnp.asarray(qmap, jnp.float32), mask_lgts, scale


def test_surfemb_finds_pose(setup):
    scene, verts, feats, normals, qmap, mask_lgts, scale = setup
    K_inf = jnp.asarray(scene.K[0]).at[0:2, 2].add(-0.5)
    res = pose_est_surf.estimate_pose(
        mask_lgts, qmap,
        jnp.asarray(verts, jnp.float32), jnp.asarray(normals, jnp.float32),
        jnp.asarray(feats, jnp.float32),
        float(scene.diameter * scale), K_inf, jax.random.PRNGKey(0),
        max_poses=3000, max_pose_evaluations=384,
    )
    assert bool(res.valid.any())
    best = int(jnp.argmax(res.pose_scores))
    R_b, t_b = res.R[best], res.t[best]
    R_gt = jnp.asarray(scene.R_bop[0])
    t_gt = jnp.asarray(scene.t_bop[0]) * scale
    add = float(metrics.add_metric(jnp.asarray(verts, jnp.float32), R_gt, t_gt, R_b, t_b))
    # hypothesis sampling from 4 correspondences without refinement: the
    # reference accepts under 0.1*diam after its own scoring
    assert add < 0.2 * scene.diameter * scale, add


@pytest.mark.slow
def test_surfemb_inference_path_beats_or_ties_pnp(setup):
    """The wired useSurfEval path (pipeline.inference.estimate_pose_surfemb
    -> scorer -> refiner) must beat or tie the default argmax-PnP path on
    the same inputs (reference inference.py:324-366)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import InferenceConfig
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import inference

    scene, verts, feats, normals, qmap, mask_lgts, scale = setup

    class IdealCNN:
        def apply(self, params, image_batch):
            return jnp.concatenate([qmap, mask_lgts[..., None]], axis=-1)[None]

    K_inf = jnp.asarray(scene.K[0]).at[0:2, 2].add(-0.5)
    verts_j = jnp.asarray(verts, jnp.float32)
    feats_j = jnp.asarray(feats, jnp.float32)
    R_gt = jnp.asarray(scene.R_bop[0])
    t_gt = jnp.asarray(scene.t_bop[0]) * scale

    # reference-scale hypothesis budget (poseEstSurf.py:13-15) — at smaller
    # budgets the sampled 4-tuples are too sparse for scoring to rank well
    cfg = InferenceConfig()
    R_s, t_s, score = inference.estimate_pose_surfemb(
        IdealCNN(), None, jnp.asarray(scene.images[0]), K_inf,
        verts_j, jnp.asarray(normals, jnp.float32), feats_j,
        float(scene.diameter * scale), jax.random.PRNGKey(0), cfg=cfg,
    )
    add_surf = float(metrics.add_metric(verts_j, R_gt, t_gt, R_s, t_s))

    est = inference.estimate_pose_single(
        IdealCNN(), None, jnp.asarray(scene.images[0]), jnp.asarray(scene.sils[0]),
        K_inf, verts_j, feats_j, jax.random.PRNGKey(0),
    )
    add_pnp = float(metrics.add_metric(verts_j, R_gt, t_gt, est.R, est.t))

    assert np.isfinite(score)
    assert add_surf < 0.15 * scene.diameter * scale, (add_surf, add_pnp)
    # beats or ties PnP (10% slack for RNG)
    assert add_surf <= add_pnp * 1.1, (add_surf, add_pnp)


def test_scores_separate_good_from_bad(setup):
    scene, verts, feats, normals, qmap, mask_lgts, scale = setup
    K_inf = jnp.asarray(scene.K[0]).at[0:2, 2].add(-0.5)
    res = pose_est_surf.estimate_pose(
        mask_lgts, qmap,
        jnp.asarray(verts, jnp.float32), jnp.asarray(normals, jnp.float32),
        jnp.asarray(feats, jnp.float32),
        float(scene.diameter * scale), K_inf, jax.random.PRNGKey(1),
        max_poses=3000, max_pose_evaluations=384,
    )
    R_gt = jnp.asarray(scene.R_bop[0])
    t_gt = jnp.asarray(scene.t_bop[0]) * scale
    adds = jax.vmap(
        lambda R, t: metrics.add_metric(jnp.asarray(verts, jnp.float32), R_gt, t_gt, R, t)
    )(res.R, res.t)
    adds = np.asarray(adds)
    scores = np.asarray(res.pose_scores)
    valid = np.asarray(res.valid)
    good = valid & (adds < 0.15 * scene.diameter * scale)
    bad = valid & (adds > 0.5 * scene.diameter * scale)
    if good.sum() >= 3 and bad.sum() >= 3:
        assert np.median(scores[good]) > np.median(scores[bad])


def test_surfemb_hypothesis_axis_sharded_matches(setup):
    """SURVEY §2c batch-parallel pose hypotheses: sharding the hypothesis
    axis over the 8-device mesh must not change the result."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import (
        mesh as mesh_lib,
    )

    scene, verts, feats, normals, qmap, mask_lgts, scale = setup
    K_inf = jnp.asarray(scene.K[0]).at[0:2, 2].add(-0.5)
    args = (
        mask_lgts, qmap,
        jnp.asarray(verts, jnp.float32), jnp.asarray(normals, jnp.float32),
        jnp.asarray(feats, jnp.float32),
        float(scene.diameter * scale), K_inf, jax.random.PRNGKey(0),
    )
    kw = dict(max_poses=1024, max_pose_evaluations=128)
    res0 = pose_est_surf.estimate_pose(*args, **kw)
    res1 = pose_est_surf.estimate_pose(*args, **kw, mesh=mesh_lib.make_mesh(8))
    np.testing.assert_array_equal(np.asarray(res1.valid), np.asarray(res0.valid))
    np.testing.assert_allclose(np.asarray(res1.R), np.asarray(res0.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res1.t), np.asarray(res0.t), atol=1e-5)
    # scores may differ at fp level (sharded reductions); the ranking of
    # the best hypothesis must not
    np.testing.assert_allclose(
        np.asarray(res1.pose_scores), np.asarray(res0.pose_scores),
        rtol=1e-3, atol=1e-5,
    )
    assert int(jnp.argmax(res1.pose_scores)) == int(jnp.argmax(res0.pose_scores))
