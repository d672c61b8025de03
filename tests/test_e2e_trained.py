"""Integration: the stages consume each other's TRAINED artifacts.

(The analytic-field closed loops in other test files verify per-stage
correctness; here a real trained NeRF drives correspondence precompute and
the negative-key build, checking the trained-model plumbing end to end.
Full-schedule quality runs are the TPU bench's job.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# trains NeRF + descriptors for real: ~4.5 min on CPU
pytestmark = pytest.mark.slow

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    CorsConfig,
    FieldConfig,
    NerfTrainConfig,
    PoseTrainConfig,
    RenderConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, generate_cors
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer, pose_trainer

S = 48


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e"))
    scene = synthetic.make_scene(n_views=8, image_size=S)
    field = fields.NerfField(FieldConfig(n_harmonic_functions=8, n_hidden=48))
    state, losses = nerf_trainer.train_nerf(
        scene.images, scene.sils, scene.R_bop, scene.t_bop, scene.K, field,
        render_cfg=RenderConfig(n_rays_per_image=192, n_pts_coarse=32, n_pts_fine=48),
        train_cfg=NerfTrainConfig(batch_size=2),
        n_steps=260, depth_margin=1.5,
    )
    return out, scene, field, state


def test_trained_cors_chain(trained_setup):
    out, scene, field, state = trained_setup
    cfg = CorsConfig(
        render_size=S, grid_pts_per_ray=64, density_threshold=0.2,
        mesh_filter_dist=0.15, outlier_nb_points=4, outlier_radius=0.2,
        n_subsurface=200, normals_k=48,
    )
    cors = generate_cors.generate_cors(
        field, state.params_fine, scene.R_bop, scene.t_bop, scene.K, scene.sils,
        out, 1, cfg, grid_res=48, depth_margin=1.5,
    )
    a1 = artifacts.load_array(cors, "a1.npy")
    assert a1.shape[0] > 100
    # per-view hits exist and sit near the extracted cloud
    n_views_with_hits = 0
    for i in range(8):
        xys, pos_vec, bxys, bvec = artifacts.load_view_rays(cors, S, i)
        if pos_vec.shape[0] > 30:
            n_views_with_hits += 1
    assert n_views_with_hits >= 6

    # negVec build from the trained field
    neg = pose_trainer.build_negatives(
        field, state.params_fine, scene.R_bop, scene.t_bop, scene.K, scene.sils,
        a1, PoseTrainConfig(n_neg=2000, neg_mesh_dist=0.15), image_size=S,
        rays_per_image=48, n_loops=2, threshold=0.2,
    )
    assert neg.shape[0] > 200
    # negatives lie near the trained surface cloud
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.pointcloud import nn_query

    d, _ = nn_query(jnp.asarray(neg, jnp.float32), jnp.asarray(a1, jnp.float32))
    assert float(jnp.median(d)) < 0.15

    # ray bank loads with enough valid rays for descriptor training
    bank = pose_trainer.load_ray_bank(cors, S, 8)
    assert int(bank.valid.sum()) > 300
