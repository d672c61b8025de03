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
