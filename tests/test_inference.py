"""Closed-loop pose inference: with ideal (analytic) queries and keys the
pipeline must recover the GT pose well under 0.1 * diameter (ADD)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics, similarity
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import inference
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer

S = 96  # higher res so /3 downsample leaves enough pixels


class PrecomputedQueries:
    """CNN stand-in: 'params' is the precomputed (S, S, 13) query map."""

    def apply(self, qmap, image_batch):
        return qmap[None]


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(n_views=3, image_size=S)
    field = synthetic.AnalyticField()
    # baked "CAD-scale" surface arrays; dense enough that correspondence
    # quantization stays ~1px (pose accuracy is key-density-limited)
    pts, ok = synthetic.analytic_surface_points(20000, jax.random.PRNGKey(7))
    pts = pts[np.asarray(ok)]
    scale = scene.diameter / 1.8
    verts_scaled = np.asarray(pts) * scale
    feats = np.asarray(synthetic.analytic_features(pts))
    return scene, field, verts_scaled, feats, scale


def make_query_map(scene, view):
    """Ideal query map: analytic features of the per-pixel surface hit."""
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)[view]
    z = np.abs(np.asarray(scene.t_bop)[:, 2])
    min_d, max_d = float(z.min() - 2), float(z.max() + 2)

    def ffn(pts, dirs, mode):
        return synthetic.analytic_field(pts, dirs, mode)

    images, weights, bundle = renderer.render_grid_chunked(
        ffn, cam, S, 96, min_d, max_d, mode="feature", threshold_mode=True, threshold=0.5,
        chunk=S * S,
    )
    pos = raymarch.surface_points(bundle.origins, bundle.directions, bundle.lengths, weights)
    q = synthetic.analytic_features(pos).reshape(S, S, 12)
    sil = np.asarray(scene.sils[view])
    hit = (np.asarray(weights.sum(-1)) > 0).reshape(S, S)
    valid = (sil > 0.5) & hit
    qmap = np.concatenate([np.asarray(q), (valid[..., None] * 10.0 - 5.0)], axis=-1)
    return jnp.asarray(qmap, jnp.float32), valid


def test_correspondence_argmax_streaming(rng):
    q = jnp.asarray(rng.normal(size=(50, 12)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1000, 12)), jnp.float32)
    idx, conf = similarity.correspondence_argmax(q, k, chunk=128)
    logits = np.asarray(q) @ np.asarray(k).T
    np.testing.assert_array_equal(np.asarray(idx), logits.argmax(-1))
    ls = logits.max(-1) - (np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1))
    np.testing.assert_allclose(np.asarray(conf), ls, atol=1e-4)


def test_confidence_threshold_keeps_frac(rng):
    conf = jnp.asarray(rng.normal(size=(1000,)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=1000) > 0.3)
    keep = similarity.confidence_threshold(conf, valid, 0.8)
    frac = float(keep.sum() / valid.sum())
    assert 0.75 < frac <= 0.85


def test_pose_recovery_per_image(setup):
    scene, field, verts_scaled, feats, scale = setup
    cnn = PrecomputedQueries()
    correct = 0
    for view in range(3):
        qmap, valid = make_query_map(scene, view)
        # CAD-scale GT pose: (R, t*scale); camera K in index-centered coords
        K_inf = jnp.asarray(scene.K[view]).at[0:2, 2].add(-0.5)
        est = inference.estimate_pose_single(
            cnn, qmap,
            jnp.asarray(scene.images[view]),
            jnp.asarray(scene.sils[view]),
            K_inf,
            jnp.asarray(verts_scaled, jnp.float32),
            jnp.asarray(feats, jnp.float32),
            jax.random.PRNGKey(view),
            down_sample=3, n_hyp=256,
        )
        assert bool(est.success)
        R_gt = jnp.asarray(scene.R_bop[view])
        t_gt = jnp.asarray(scene.t_bop[view]) * scale
        add = float(metrics.add_metric(jnp.asarray(verts_scaled, jnp.float32), R_gt, t_gt, est.R, est.t))
        diam_cad = scene.diameter * scale
        if add < 0.1 * diam_cad:
            correct += 1
    assert correct >= 2, correct


def test_full_frame_surfemb_crop_inference(setup):
    """Full-image inference path (reference inference.py:196-233): embed the
    view into a larger raw frame, SurfEmb-crop it with camMat = Ms @ K, and
    recover the pose from the crop."""
    scene, field, verts_scaled, feats, scale = setup
    view = 0
    H, W, ox, oy = 128, 160, 40, 20
    frame = np.zeros((H, W, 3), np.float32)
    frame[oy : oy + S, ox : ox + S] = np.asarray(scene.images[view])
    mask = np.zeros((H, W), np.float32)
    mask[oy : oy + S, ox : ox + S] = np.asarray(scene.sils[view])
    # translating the image by (ox, oy) shifts the principal point the same
    K_frame = np.asarray(scene.K[view]).copy()
    K_frame[0, 2] += ox
    K_frame[1, 2] += oy

    crop, crop_mask, camMat = inference.surfemb_crop(frame, mask, K_frame, crop_res=S, pad=1.2)

    # geometric check: rendering the object with camMat as intrinsics must
    # reproduce the crop's silhouette (this is THE parity risk of Ms @ K)
    cam2 = cam_lib.camera_from_bop(
        jnp.asarray(scene.R_bop[view]), jnp.asarray(scene.t_bop[view]), camMat, S
    )
    z = np.abs(np.asarray(scene.t_bop)[:, 2])
    images2, weights2, bundle2 = renderer.render_grid_chunked(
        lambda p, d, m: synthetic.analytic_field(p, d, m),
        cam2, S, 96, float(z.min() - 2), float(z.max() + 2),
        mode="feature", threshold_mode=True, threshold=0.5, chunk=S * S,
    )
    sil_render = (np.asarray(weights2.sum(-1)) > 0).reshape(S, S)
    inter = (sil_render & (np.asarray(crop_mask) > 0.5)).sum()
    union = (sil_render | (np.asarray(crop_mask) > 0.5)).sum()
    assert inter / union > 0.8, inter / union

    # pose recovery from the crop with ideal queries rendered at camMat
    pos = raymarch.surface_points(bundle2.origins, bundle2.directions, bundle2.lengths, weights2)
    q = np.asarray(synthetic.analytic_features(pos)).reshape(S, S, 12)
    qmap = jnp.asarray(
        np.concatenate([q, (sil_render[..., None] * 10.0 - 5.0)], axis=-1), jnp.float32
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import InferenceConfig

    est = inference.estimate_pose_full_frame(
        PrecomputedQueries(), qmap, frame, mask, K_frame,
        jnp.asarray(verts_scaled, jnp.float32), jnp.asarray(feats, jnp.float32),
        jax.random.PRNGKey(0),
        cfg=InferenceConfig(crop_res=S, ransac_iters=256),
        normalize=lambda x: x,
    )
    R_gt = jnp.asarray(scene.R_bop[view])
    t_gt = jnp.asarray(scene.t_bop[view]) * scale
    add = float(metrics.add_metric(jnp.asarray(verts_scaled, jnp.float32), R_gt, t_gt, est.R, est.t))
    assert add < 0.15 * scene.diameter * scale, add


def test_run_sequence_shapes(setup):
    scene, field, verts_scaled, feats, scale = setup
    cnn = PrecomputedQueries()
    qmap, _ = make_query_map(scene, 0)
    Ks = np.asarray(scene.K[:1]) - np.array([[0, 0, 0.5], [0, 0, 0.5], [0, 0, 0]])[None] * np.array([1.0])
    Rs, ts = inference.run_sequence(
        cnn, qmap, np.asarray(scene.images[:1]), np.asarray(scene.sils[:1]), Ks,
        verts_scaled, feats,
    )
    assert Rs.shape == (1, 3, 3) and ts.shape == (1, 3)
