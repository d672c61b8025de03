"""The jit factories must be trace-cached across calls: rebuilding them
per training call re-traces multi-step scans every invocation (~8 s of
host time per phase on a 1-CPU box; EXPERIMENTS.md "tracing tax")."""

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    FieldConfig,
    InferenceConfig,
    NerfTrainConfig,
    PoseTrainConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import inference
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import (
    augment as aug_lib,
    nerf_trainer,
    pose_trainer,
)


def test_nerf_factories_are_cached():
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    rc = {}
    tc = NerfTrainConfig(warmup_steps=2)
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import RenderConfig

    r = RenderConfig(n_rays_per_image=8, n_pts_coarse=4, n_pts_fine=4)
    a = nerf_trainer._multi_step_cached(field, r, tc, 1.0, 2.0, None)
    b = nerf_trainer._multi_step_cached(field, r, tc, 1.0, 2.0, None)
    assert a is b
    fa = nerf_trainer._fused_multi_cached(field, r, tc, 1.0, 2.0, None)
    fb = nerf_trainer._fused_multi_cached(field, r, tc, 1.0, 2.0, None)
    assert fa is fb
    assert nerf_trainer._opt_init_fn(tc) is nerf_trainer._opt_init_fn(tc)
    assert fields._init_fn(field) is fields._init_fn(field)


def test_pose_factories_are_cached():
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    cnn = ResNetUNet(widths=(8, 8, 8, 8), stage_sizes=(1, 1, 1, 1))
    cfg = PoseTrainConfig(warmup_steps=2, sample_size=8)
    aug_cfg = aug_lib.AugmentConfig(crop_res=16, min_mask_sum=1.0)
    a = pose_trainer._pose_multi_cached(field, cnn, cfg, aug_cfg, None)
    b = pose_trainer._pose_multi_cached(field, cnn, cfg, aug_cfg, None)
    assert a is b
    assert pose_trainer._cnn_init_fn(cnn, 16) is pose_trainer._cnn_init_fn(cnn, 16)
    assert pose_trainer._pose_opt_init_fn(cfg) is pose_trainer._pose_opt_init_fn(cfg)


def test_inference_and_grid_caches():
    cnn = ResNetUNet(widths=(8, 8, 8, 8), stage_sizes=(1, 1, 1, 1))
    cfg = InferenceConfig(down_sample=2, ransac_iters=4)
    assert (inference._batch_estimator_cached(cnn, cfg, None)
            is inference._batch_estimator_cached(cnn, cfg, None))
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    assert renderer._density_grid_fn(field, 8, 512) is renderer._density_grid_fn(field, 8, 512)
    # and the cached grid matches the closure path
    params = fields.init_field(field, jax.random.PRNGKey(0))
    g1 = renderer.density_grid_cached(field, params, grid_res=8, chunk=512)
    g2 = renderer.density_grid(
        lambda pts: field.apply(params, pts, method=field.density), grid_res=8, chunk=512
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
