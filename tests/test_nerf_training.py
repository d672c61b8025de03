"""End-to-end slice #1: NeRF fits the synthetic scene (SURVEY.md §7 step 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-field training at quality scale: ~2 min of CPU per fixture build
pytestmark = pytest.mark.slow

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    FieldConfig,
    NerfTrainConfig,
    RenderConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer

SMALL_FIELD = FieldConfig(n_harmonic_functions=8, n_hidden=48, siren=True)
SMALL_RENDER = RenderConfig(n_rays_per_image=192, n_pts_coarse=32, n_pts_fine=48)


@pytest.fixture(scope="module")
def trained():
    scene = synthetic.make_scene(n_views=10, image_size=48)
    field = fields.NerfField(SMALL_FIELD)
    cfg = NerfTrainConfig(batch_size=2)
    state, losses = nerf_trainer.train_nerf(
        scene.images,
        scene.sils,
        scene.R_bop,
        scene.t_bop,
        scene.K,
        field,
        render_cfg=SMALL_RENDER,
        train_cfg=cfg,
        n_steps=250,
        depth_margin=1.5,
    )
    return scene, field, state, losses


def test_loss_decreases(trained):
    scene, field, state, losses = trained
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.5, (first, last)


def test_rendered_silhouette_iou(trained):
    scene, field, state, losses = trained
    S = scene.images.shape[1]
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)[0]
    min_d, max_d = nerf_trainer.depth_bounds(scene.t_bop, 1.5)

    def fine_fn(pts, dirs, mode):
        return field.apply(state.params_fine, pts, dirs, mode)

    images, weights, bundle = renderer.render_grid_chunked(
        fine_fn, cam, S, 48, min_d, max_d, mode="color", threshold_mode=False, chunk=S * S
    )
    sil_pred = np.asarray(images[:, -1].reshape(S, S)) > 0.5
    sil_gt = np.asarray(scene.sils[0]) > 0.5
    inter = (sil_pred & sil_gt).sum()
    union = (sil_pred | sil_gt).sum()
    assert inter / union > 0.6, inter / union


def test_point_cloud_on_surface(trained):
    scene, field, state, losses = trained
    verts, tris = nerf_trainer.extract_point_cloud(field, state.params_fine, threshold=0.3, grid_res=48)
    assert verts.shape[0] > 100
    # geometric distance of extracted verts to the analytic blob surface
    d = np.linalg.norm(
        verts[:, None, :] - np.asarray(synthetic._CENTERS)[None], axis=-1
    ) - np.asarray(synthetic._RADII)[None]
    sdf = np.abs(d.min(-1))
    assert np.median(sdf) < 0.12, np.median(sdf)

