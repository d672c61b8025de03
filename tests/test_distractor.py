"""Distractor-paste augmentation (tless_aug parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment


def test_distractor_occludes_mask():
    scene = synthetic.make_scene(n_views=2, image_size=48)
    cfg = augment.AugmentConfig(
        p_background=0.0, p_occlude=0.0, p_line_erode=0.0, p_color_jitter=0.0,
        p_border=0.0, p_distractor=1.0, min_mask_sum=10.0,
    )
    # distractor = the other view
    out = augment.augment_view(
        jax.random.PRNGKey(0), scene.images[0], scene.sils[0], cfg,
        distractor=(scene.images[1], scene.sils[1]),
    )
    # distractor can only remove mask pixels
    assert float((out.mask_crop <= out.mask_full + 1e-6).mean()) > 0.999
    # without a distractor the same key yields a (weakly) larger mask
    out0 = augment.augment_view(
        jax.random.PRNGKey(0), scene.images[0], scene.sils[0],
        cfg._replace(p_distractor=0.0),
        distractor=(scene.images[1], scene.sils[1]),
    )
    assert float(out.mask_crop.sum()) <= float(out0.mask_crop.sum()) + 1e-3


def test_distractor_none_is_noop():
    scene = synthetic.make_scene(n_views=1, image_size=48)
    cfg = augment.AugmentConfig(p_distractor=1.0, min_mask_sum=10.0)
    out = augment.augment_view(jax.random.PRNGKey(1), scene.images[0], scene.sils[0], cfg)
    assert out.rgb.shape == (48, 48, 3)


def test_distractor_bank_loader(tmp_path):
    """load_distractor_bank recovers masks as the non-black region of
    background-masked crops (the BOP loader's crop convention)."""
    from PIL import Image

    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = (200, 60, 30)
    Image.fromarray(img).save(tmp_path / "crop0.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / "crop1.png")
    rgbs, masks = augment.load_distractor_bank(str(tmp_path), 32)
    assert rgbs.shape == (2, 32, 32, 3) and masks.shape == (2, 32, 32)
    assert masks[0].sum() > 100 and masks[0][0, 0] == 0
    assert masks[1].sum() == 0  # all-black crop -> empty mask


def test_background_bank_composites_bank_image():
    """With bg_bank + p_background=1, outside-mask pixels come from the
    bank image, not smooth noise (COCO-paste parity, augment.py:297-314)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import normalize_image

    scene = synthetic.make_scene(n_views=1, image_size=48)
    # constant-color bank so bank pixels are recognizable post-normalization
    bank = jnp.full((3, 48, 48, 3), 0.25)
    cfg = augment.AugmentConfig(
        p_background=1.0, p_occlude=0.0, p_line_erode=0.0, p_color_jitter=0.0,
        p_border=0.0, p_blur=0.0, p_iso_noise=0.0, min_mask_sum=10.0,
    )
    out = augment.augment_view(
        jax.random.PRNGKey(0), scene.images[0], scene.sils[0], cfg, bg_bank=bank
    )
    expected = np.asarray(normalize_image(jnp.full((1, 1, 3), 0.25)))[0, 0]
    bg_px = np.asarray(out.rgb)[np.asarray(out.mask_crop) < 0.5]
    assert bg_px.shape[0] > 100
    np.testing.assert_allclose(bg_px, np.broadcast_to(expected, bg_px.shape), atol=1e-5)


import pytest


def test_distractor_bank_without_pastes_rejected():
    """A bank + p_distractor=0 would silently never be used — train_pose
    must reject it instead."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        FieldConfig, PoseTrainConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import pose_trainer

    rng = np.random.default_rng(0)
    size = 16
    bank = pose_trainer.RayBank(
        pos_vec=jnp.zeros((2, 4, 3)), xys=jnp.zeros((2, 4, 2)),
        back_vec=jnp.zeros((2, 1, 3)), back_xys=jnp.zeros((2, 1, 2)),
        valid=jnp.ones((2, 4), bool), back_valid=jnp.ones((2, 1), bool),
    )
    field = fields.NerfField(FieldConfig(n_harmonic_functions=2, n_hidden=8))
    nerf_params = fields.init_field(field, jax.random.PRNGKey(0))
    d_bank = (np.zeros((1, size, size, 3), np.float32), np.zeros((1, size, size), np.float32))
    with pytest.raises(ValueError, match="p_distractor"):
        pose_trainer.train_pose(
            field, nerf_params,
            np.zeros((2, size, size, 3), np.float32), np.ones((2, size, size), np.float32),
            bank, np.zeros((8, 3), np.float32),
            cfg=PoseTrainConfig(batch_size=2, sample_size=2, warmup_steps=1),
            aug_cfg=augment.AugmentConfig(crop_res=size, p_distractor=0.0),
            n_steps=1, mesh=None, distractor_bank=d_bank,
        )


@pytest.mark.slow
def test_train_pose_with_distractors_and_bank():
    """The content-augmentation knobs run through the public trainer."""
    import jax.numpy as jnp

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        FieldConfig, PoseTrainConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import pose_trainer

    size, n_views = 32, 4
    scene = synthetic.make_scene(n_views=n_views, image_size=size, n_pts_per_ray=16)
    rng = np.random.default_rng(0)
    bank = pose_trainer.RayBank(
        pos_vec=jnp.asarray(rng.normal(size=(n_views, 32, 3)) * 0.3, jnp.float32),
        xys=jnp.asarray(rng.uniform(-0.8, 0.8, size=(n_views, 32, 2)), jnp.float32),
        back_vec=jnp.zeros((n_views, 1, 3)),
        back_xys=jnp.zeros((n_views, 1, 2)),
        valid=jnp.ones((n_views, 32), bool),
        back_valid=jnp.ones((n_views, 1), bool),
    )
    neg = rng.normal(size=(64, 3)).astype(np.float32) * 0.3
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    nerf_params = fields.init_field(field, jax.random.PRNGKey(0))
    cnn = ResNetUNet(widths=(8, 16, 16, 16), stage_sizes=(1, 1, 1, 1))
    aug_cfg = augment.AugmentConfig(crop_res=size, min_mask_sum=10.0, p_distractor=0.5)
    bg_bank = rng.uniform(size=(4, size, size, 3)).astype(np.float32)
    _, _, losses = pose_trainer.train_pose(
        field, nerf_params, scene.images, scene.sils, bank, neg,
        cfg=PoseTrainConfig(batch_size=4, sample_size=16, warmup_steps=2),
        aug_cfg=aug_cfg, n_steps=2, cnn=cnn, bg_bank=bg_bank, mesh=None,
    )
    assert np.isfinite(losses).all()
    # other-object distractor bank routes through the same public trainer
    d_rgb = rng.uniform(size=(3, size, size, 3)).astype(np.float32)
    d_mask = (rng.uniform(size=(3, size, size)) > 0.6).astype(np.float32)
    _, _, losses2 = pose_trainer.train_pose(
        field, nerf_params, scene.images, scene.sils, bank, neg,
        cfg=PoseTrainConfig(batch_size=4, sample_size=16, warmup_steps=2),
        aug_cfg=aug_cfg, n_steps=2, cnn=cnn, mesh=None,
        distractor_bank=(d_rgb, d_mask),
    )
    assert np.isfinite(losses2).all()
