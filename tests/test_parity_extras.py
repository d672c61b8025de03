"""Small parity components: in-batch InfoNCE, NOCS map, depth render."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.cameras import RayBundle
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment, pose_trainer


def test_info_nce_in_batch(rng):
    # unit-norm keys (the structure InfoNCE training produces): matched
    # q=k pairs must beat mismatched ones
    k = rng.normal(size=(2, 16, 8))
    k = 5 * k / np.linalg.norm(k, axis=-1, keepdims=True)
    k = jnp.asarray(k, jnp.float32)
    loss_matched = float(pose_trainer.info_nce_in_batch(k, k, jax.random.PRNGKey(0)))
    q_wrong = jnp.roll(k, 1, axis=1)
    loss_wrong = float(pose_trainer.info_nce_in_batch(q_wrong, k, jax.random.PRNGKey(0)))
    assert loss_matched < loss_wrong
    # the positive key is in the in-batch negative set -> floor at log(2)/1000
    assert loss_matched < 2e-3


def test_nocs_map_writes_hits():
    xys = jnp.asarray([[1 - 2 * 10.5 / 32, 1 - 2 * 20.5 / 32]])  # pixel (10, 20) at res 32
    pos = jnp.asarray([[0.1, 0.2, 0.3]])
    valid = jnp.asarray([True])
    m = augment.nocs_map(xys, pos, valid, res=32)
    ys, xs = np.nonzero(np.asarray(m).sum(-1))
    assert len(ys) == 1
    # pixel coordinates within 1 of expected
    assert abs(xs[0] - 10) <= 1 and abs(ys[0] - 20) <= 1
    np.testing.assert_allclose(np.asarray(m[ys[0], xs[0]]), [0.1, 0.2, 0.3], atol=1e-6)


def test_render_depth_picks_surface():
    lengths = jnp.linspace(2.0, 4.0, 8)[None]
    weights = jnp.zeros((1, 8)).at[0, 5].set(1.0)
    bundle = RayBundle(jnp.zeros((1, 3)), jnp.zeros((1, 3)), lengths, jnp.zeros((1, 2)))
    d = renderer.render_depth(bundle, weights)
    np.testing.assert_allclose(float(d[0]), float(lengths[0, 5]), atol=1e-6)


def _toy_field(pts, dirs, mode):
    """Analytic blob field: density peaks at the origin, constant color."""
    d2 = jnp.sum(pts**2, axis=-1, keepdims=True)
    dens = jnp.exp(-4.0 * d2)
    col = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.8]), pts.shape[:-1] + (3,))
    return dens, col


def test_freeze_fine_bundle_reuse_matches_coarse_fine():
    """rayFreeze parity (pren.py:127-129, 200-243): the frozen bundle is the
    importance-resampled fine bundle of the FIRST call; re-feeding it to
    render_bundle gives identical renders on every later call."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib

    R = jnp.eye(3)[None]
    t = jnp.asarray([[0.0, 0.0, 3.0]])
    S = 16
    K = jnp.asarray([[[2.0 * S, 0.0, S / 2], [0.0, 2.0 * S, S / 2], [0.0, 0.0, 1.0]]])
    cam = cam_lib.camera_from_bop(R, t, K, S)
    key = jax.random.PRNGKey(0)

    frozen = renderer.freeze_fine_bundle(
        _toy_field, cam, key, n_rays=32, n_pts_coarse=8, n_pts_fine=16,
        min_depth=2.0, max_depth=4.0,
    )
    # same rays/keys as the unfrozen coarse+fine path -> same fine render
    _, fine_img, xys = renderer.render_coarse_fine(
        _toy_field, _toy_field, cam, key, n_rays=32, n_pts_coarse=8,
        n_pts_fine=16, min_depth=2.0, max_depth=4.0,
    )
    img1, _ = renderer.render_bundle(_toy_field, frozen, mode="color")
    np.testing.assert_allclose(np.asarray(img1), np.asarray(fine_img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(frozen.xys), np.asarray(xys), atol=1e-6)
    # "later calls": the frozen bundle is plain data -- rendering it again
    # (as the reference's self.frozenRays reuse does) is bit-identical
    img2, _ = renderer.render_bundle(_toy_field, frozen, mode="color")
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert frozen.lengths.shape[-1] == 8 + 16  # add_input_samples concat


def test_adds_metric_nn_targets_surface_cloud(rng):
    """ADDS parity with the reference (inference.py:118-120): the query
    cloud is the CAD verts under GT pose, the NN TARGET is the baked
    surface cloud under the estimated pose."""
    from scipy.spatial.transform import Rotation

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics

    verts = rng.normal(size=(64, 3)).astype(np.float32)
    surface = rng.normal(size=(200, 3)).astype(np.float32)
    R_gt = Rotation.from_euler("xyz", [10, 20, 30], degrees=True).as_matrix().astype(np.float32)
    t_gt = np.asarray([0.1, -0.2, 0.3], np.float32)
    R_est = Rotation.from_euler("xyz", [12, 19, 33], degrees=True).as_matrix().astype(np.float32)
    t_est = np.asarray([0.12, -0.18, 0.31], np.float32)

    got = float(metrics.adds_metric(
        jnp.asarray(verts), jnp.asarray(R_gt), jnp.asarray(t_gt),
        jnp.asarray(R_est), jnp.asarray(t_est), surface_points=jnp.asarray(surface),
    ))
    # reference semantics, brute force: query verts.dot(gtR.T)+gtT against
    # target surface.dot(R.T)+T
    a = verts @ R_gt.T + t_gt
    b = surface @ R_est.T + t_est
    want = np.linalg.norm(a[:, None] - b[None], axis=-1).min(axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # default (no surface cloud): verts double as the target
    got_sym = float(metrics.adds_metric(
        jnp.asarray(verts), jnp.asarray(R_gt), jnp.asarray(t_gt),
        jnp.asarray(R_est), jnp.asarray(t_est),
    ))
    b2 = verts @ R_est.T + t_est
    want_sym = np.linalg.norm(a[:, None] - b2[None], axis=-1).min(axis=1).mean()
    np.testing.assert_allclose(got_sym, want_sym, rtol=1e-5)


def test_image_grid_tiles_and_validates():
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.utils import viz

    imgs = [np.full((4, 5, 4), v, np.float32) for v in (0.1, 0.2, 0.3, 0.4)]
    g = viz.image_grid(imgs, rows=2, cols=2)
    assert g.shape == (8, 10, 3)
    np.testing.assert_allclose(g[0, 0], 0.1)
    np.testing.assert_allclose(g[4, 5], 0.4)
    # alpha-channel mode (reference rgb=False plots im[..., 3])
    ga = viz.image_grid(imgs, rows=2, cols=2, rgb=False)
    np.testing.assert_allclose(ga[0, 0], 0.1)
    # default layout: one column, N rows
    gd = viz.image_grid(imgs[:2])
    assert gd.shape == (8, 5, 3)
    # gutter when fill=False
    gg = viz.image_grid(imgs, rows=2, cols=2, fill=False)
    assert gg.shape == (8 + 2, 10 + 2, 3)
    np.testing.assert_allclose(gg[4, 0], 1.0)  # white gutter row
    # rows/cols must come together, as the reference raises
    try:
        viz.image_grid(imgs, rows=2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_kernel_safe_field_falls_back_at_large_view_banks(monkeypatch):
    """Round-4 libtpu fault guard: the fault is specific to the SPLIT
    fwd/bwd kernels, so the flax fallback applies only when the split path
    would run (multi-chunk steps or FUSED_LOSS_KERNEL=0) AND the view bank
    exceeds the limit; single-chunk steps take the fused bundle-loss
    kernel, which is fault-free at any bank size.  An explicit
    fused_kernel=True is always left alone."""
    import jax.numpy as jnp

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        FieldConfig,
        NerfTrainConfig,
        RenderConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields as f
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer as nt

    # pretend the kernel would auto-enable (CPU backend disables it otherwise)
    monkeypatch.setattr(nt.field_kernel, "enabled",
                        lambda cfg: getattr(cfg, "fused_kernel", None) is not False)
    auto = f.NerfField(FieldConfig(act_dtype="bfloat16"))
    small = jnp.zeros((4, 32, 32, 3), jnp.float32)
    big_shape = type("B", (), {"shape": (1280, 224, 224, 3), "dtype": jnp.float32})()
    # reference schedule: 3 cams x 400 rays = single chunk -> fused path
    rc, tc = RenderConfig(), NerfTrainConfig()
    # large-ray-batch schedule: multi-chunk -> split kernels -> guarded
    rc_big = RenderConfig(n_rays_per_image=8192)

    assert nt._kernel_safe_field(auto, rc, tc, small, small) is auto
    # single-chunk + huge bank: fused-loss kernel handles it, no fallback
    assert nt._kernel_safe_field(auto, rc, tc, big_shape) is auto
    # multi-chunk + huge bank: split kernels would fault -> flax fallback
    guarded = nt._kernel_safe_field(auto, rc_big, tc, big_shape)
    assert guarded is not auto and guarded.cfg.fused_kernel is False
    # fused-loss disabled by env + huge bank: same fallback
    monkeypatch.setenv("FUSED_LOSS_KERNEL", "0")
    guarded2 = nt._kernel_safe_field(auto, rc, tc, big_shape)
    assert guarded2 is not auto and guarded2.cfg.fused_kernel is False
    monkeypatch.delenv("FUSED_LOSS_KERNEL")

    forced = f.NerfField(FieldConfig(act_dtype="bfloat16", fused_kernel=True))
    assert nt._kernel_safe_field(forced, rc_big, tc, big_shape) is forced
