"""Augmentation self-consistency: the image warp and the xys transform
must agree — a silent mismatch here destroys descriptor training."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import denormalize_image
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.grid_sample import sample_images_at_mc_locs
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment

S = 64

NO_JITTER = augment.AugmentConfig(
    p_background=0.0, p_occlude=0.0, p_line_erode=0.0, p_color_jitter=0.0, p_border=0.0,
    p_blur=0.0, p_iso_noise=0.0, min_mask_sum=10.0,
)


def test_warp_affine_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(S, S, 3)), jnp.float32)
    out = augment.warp_affine_ndc(img, jnp.eye(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(out)[2:-2, 2:-2], np.asarray(img)[2:-2, 2:-2], atol=1e-4)


def test_warp_affine_moves_content():
    img = jnp.zeros((S, S, 3)).at[40, 10, 0].set(1.0)
    # pixel (x=10, y=40) center -> ndc u = (1-2*10.5/S, 1-2*40.5/S)
    u = jnp.asarray([1 - 2 * 10.5 / S, 1 - 2 * 40.5 / S])
    A = 0.8 * jnp.asarray([[np.cos(0.5), -np.sin(0.5)], [np.sin(0.5), np.cos(0.5)]])
    t = jnp.asarray([0.1, -0.05])
    out = augment.warp_affine_ndc(img, A, t)
    u2 = A @ u + t
    px = float((1 - u2[0]) * S / 2)
    py = float((1 - u2[1]) * S / 2)
    yy, xx = np.unravel_index(np.asarray(out[..., 0]).argmax(), (S, S))
    assert abs(xx + 0.5 - px) < 1.5 and abs(yy + 0.5 - py) < 1.5, (xx, yy, px, py)


def test_augment_xys_alignment():
    scene = synthetic.make_scene(n_views=1, image_size=S)
    rgb = scene.images[0]
    mask = scene.sils[0]
    key = jax.random.PRNGKey(3)
    out = augment.augment_view(key, rgb, mask, NO_JITTER)
    # pick NDC locations of mask pixels in the ORIGINAL image
    ys, xs = np.where(np.asarray(mask) > 0.5)
    keep = (ys > 4) & (ys < S - 4) & (xs > 4) & (xs < S - 4)
    ys, xs = ys[keep][::7], xs[keep][::7]
    xys = jnp.asarray(
        np.stack([1 - 2 * (xs + 0.5) / S, 1 - 2 * (ys + 0.5) / S], axis=-1), jnp.float32
    )
    orig_vals = sample_images_at_mc_locs(rgb[None], xys[None])[0]
    new_xys = augment.transform_xys(xys, out.A, out.t)
    aug_rgb = denormalize_image(out.rgb)
    in_bounds = np.asarray((jnp.abs(new_xys) < 0.97).all(-1))
    aug_vals = sample_images_at_mc_locs(aug_rgb[None], new_xys[None])[0]
    err = np.abs(np.asarray(aug_vals) - np.asarray(orig_vals))[in_bounds]
    # bilinear warp + nearest sampling -> small error for most points
    assert np.median(err) < 0.12, np.median(err)


def test_augment_mask_alignment():
    scene = synthetic.make_scene(n_views=1, image_size=S)
    mask = scene.sils[0]
    out = augment.augment_view(jax.random.PRNGKey(5), scene.images[0], mask, NO_JITTER)
    # transformed mask bbox scales roughly by |A| (scale factor)
    scale = float(jnp.linalg.norm(out.A[:, 0]))
    area0 = float(mask.sum())
    area1 = float(out.mask_full.sum())
    # allow clipping loss at borders
    assert area1 > 0.5 * area0 * scale**2
    assert area1 < 1.5 * area0 * scale**2


def test_augment_batch_shapes():
    scene = synthetic.make_scene(n_views=4, image_size=S)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    out = augment.augment_batch(keys, scene.images, scene.sils, augment.AugmentConfig(min_mask_sum=10.0))
    assert out.rgb.shape == (4, S, S, 3)
    assert out.mask_full.shape == (4, S, S)
    assert out.A.shape == (4, 2, 2) and out.t.shape == (4, 2)
    # occlusion can only remove mask pixels
    assert float((out.mask_crop <= out.mask_full + 1e-6).mean()) > 0.999


def test_select_ray_samples_in_bounds():
    xys = jnp.asarray(np.random.default_rng(0).uniform(-1.5, 1.5, size=(500, 2)), jnp.float32)
    valid = jnp.ones((500,), bool)
    idx = augment.select_ray_samples(jax.random.PRNGKey(0), xys, valid, 128)
    chosen = np.asarray(xys)[np.asarray(idx)]
    assert (np.abs(chosen) < 1.0).all()


def test_gaussian_blur3_smooths_and_preserves_mean():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(S, S, 3)), jnp.float32)
    out = augment.gaussian_blur3(img, jnp.asarray(0.8))
    # blur reduces high-frequency energy but preserves the mean
    assert float(jnp.std(out)) < float(jnp.std(img))
    np.testing.assert_allclose(float(out.mean()), float(img.mean()), atol=2e-3)
    # sigma -> 0 degenerates to identity (kernel size 1, augment.py:248)
    ident = augment.gaussian_blur3(img, jnp.asarray(1e-4))
    np.testing.assert_allclose(np.asarray(ident), np.asarray(img), atol=1e-5)


def test_iso_noise_perturbs_in_range():
    img = jnp.full((S, S, 3), 0.5)
    out = augment.iso_noise(jax.random.PRNGKey(0), img)
    d = np.abs(np.asarray(out) - 0.5)
    assert d.max() > 1e-3          # noise actually applied
    assert d.mean() < 0.2          # but bounded sensor-scale noise
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_augment_photometric_gates():
    """p_blur / p_iso_noise = 0 must reproduce the pre-photometric image."""
    scene = synthetic.make_scene(n_views=1, image_size=S)
    key = jax.random.PRNGKey(7)
    base = augment.augment_view(key, scene.images[0], scene.sils[0], NO_JITTER)
    with_photo = augment.augment_view(
        key, scene.images[0], scene.sils[0],
        NO_JITTER._replace(p_blur=1.0, p_iso_noise=1.0),
    )
    # same geometric transform (photo passes do not touch A/t or masks)
    np.testing.assert_allclose(np.asarray(base.A), np.asarray(with_photo.A))
    np.testing.assert_allclose(
        np.asarray(base.mask_full), np.asarray(with_photo.mask_full)
    )
    # but the rgb differs (blur+noise applied)
    assert float(jnp.abs(base.rgb - with_photo.rgb).max()) > 1e-3


def test_warp_all_matches_separate_warps():
    """warp_all_ndc (one packed gather) == three warp_affine_ndc calls."""
    import jax

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug

    key = jax.random.PRNGKey(0)
    S = 31
    rgb = jax.random.uniform(key, (S, S, 3))
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (S, S)) > 0.5).astype(jnp.float32)
    occ = (jax.random.uniform(jax.random.PRNGKey(2), (S, S)) > 0.3).astype(jnp.float32)
    for seed in range(4):
        k = jax.random.PRNGKey(10 + seed)
        theta = float(jax.random.uniform(k)) * 6.28
        c, s = np.cos(theta), np.sin(theta)
        A = (0.5 + seed * 0.4) * jnp.asarray([[c, -s], [s, c]])
        t = jnp.asarray([0.3 * (seed - 1.5), -0.2 * seed])
        rgb_w, mf_w, mc_w = aug.warp_all_ndc(rgb, mask, occ, A, t)
        rgb_ref = aug.warp_affine_ndc(rgb, A, t)
        mf_ref = aug.warp_affine_ndc(mask, A, t, nearest=True)
        mc_ref = aug.warp_affine_ndc(occ, A, t, nearest=True)
        np.testing.assert_allclose(np.asarray(rgb_w), np.asarray(rgb_ref), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mf_w), np.asarray(mf_ref))
        np.testing.assert_array_equal(np.asarray(mc_w), np.asarray(mc_ref))
