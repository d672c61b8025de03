"""Descriptor (SurfEmb) training slice: InfoNCE math + a short real run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    CorsConfig,
    FieldConfig,
    PoseTrainConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, generate_cors
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import pose_trainer

S = 48


def test_info_nce_matches_manual():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 5, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 5, 4)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(2, 7, 4)), jnp.float32)
    out = float(pose_trainer.info_nce_with_neg(q, k, kn, scale=1e-3))
    # manual
    qn, kn_, knn = np.asarray(q), np.asarray(k), np.asarray(kn)
    sim_pos = (qn * kn_).sum(-1)[..., None]
    sim_neg = qn @ knn.transpose(0, 2, 1)
    lgts = np.concatenate([sim_pos, sim_neg], -1)
    logz = np.log(np.exp(lgts).sum(-1))
    ce = (logz - lgts[..., 0]).mean() / 1000
    np.testing.assert_allclose(out, ce, rtol=1e-4)


def test_info_nce_perfect_match_low():
    """Well-separated positives must give (near-)zero loss."""
    q = jnp.eye(4)[None] * 10
    k = q
    kn = -jnp.ones((1, 8, 4)) * 10
    loss = float(pose_trainer.info_nce_with_neg(q, k, kn))
    assert loss < 1e-4


@pytest.fixture(scope="module")
def cors_setup(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pose_exp"))
    scene = synthetic.make_scene(n_views=6, image_size=S)
    afield = synthetic.AnalyticField()
    cfg = CorsConfig(
        render_size=S, grid_pts_per_ray=96, density_threshold=0.5,
        outlier_nb_points=5, outlier_radius=0.15, n_subsurface=200, normals_k=48,
    )
    cors = generate_cors.generate_cors(
        afield, None, scene.R_bop, scene.t_bop, scene.K, scene.sils, out, 1, cfg, grid_res=48
    )
    return scene, cors


def test_ray_bank_loading(cors_setup):
    scene, cors = cors_setup
    bank = pose_trainer.load_ray_bank(cors, S, 6)
    assert bank.pos_vec.shape[0] == 6
    assert bank.valid.any()
    # valid entries have nonzero positions
    v = np.asarray(bank.valid[0])
    assert np.abs(np.asarray(bank.pos_vec[0])[v]).max() > 0


def test_ray_bank_bucketed_shape(cors_setup):
    """Pad targets round up to the bucket so the downstream train-step
    program shape is stable across runs (compile-cache reuse)."""
    scene, cors = cors_setup
    bank = pose_trainer.load_ray_bank(cors, S, 6, bucket=64)
    assert bank.pos_vec.shape[1] % 64 == 0
    assert bank.back_vec.shape[1] % 64 == 0
    # explicit max_rays still wins over the bucket
    bank2 = pose_trainer.load_ray_bank(cors, S, 6, max_rays=100, bucket=64)
    assert bank2.pos_vec.shape[1] == 100


@pytest.mark.slow
def test_pose_training_loss_decreases(cors_setup):
    scene, cors = cors_setup
    bank = pose_trainer.load_ray_bank(cors, S, 6)
    a1 = artifacts.load_array(cors, "a1.npy")
    neg = a1[np.random.default_rng(0).permutation(a1.shape[0])[:500]]

    field = fields.NerfField(FieldConfig(n_harmonic_functions=6, n_hidden=32))
    nerf_params = fields.init_field(field, jax.random.PRNGKey(0))

    cnn = ResNetUNet(widths=(16, 24, 32, 32), decoder_width=16)
    cfg = PoseTrainConfig(
        batch_size=2, sample_size=96, warmup_steps=10, lr_cnn=2e-3, lr_mlp=5e-4
    )
    state, cnn, losses = pose_trainer.train_pose(
        field, nerf_params, scene.images, scene.sils, bank, neg,
        cfg=cfg, n_steps=120, cnn=cnn,
    )
    first = np.mean(losses[:8])
    last = np.mean(losses[-8:])
    assert last < first * 0.8, (first, last)
    # NeRF feature head moved, trunk untouched
    p0 = nerf_params["params"]
    p1 = state.nerf_params["params"]
    trunk_same = np.allclose(
        np.asarray(p0["trunk1"]["kernel"]), np.asarray(p1["trunk1"]["kernel"])
    )
    feat_moved = not np.allclose(
        np.asarray(jax.tree.leaves(p0["feature_layer"])[0]),
        np.asarray(jax.tree.leaves(p1["feature_layer"])[0]),
    )
    assert trunk_same and feat_moved


def test_unet_bf16_groupnorm_matches_fp32():
    """norm_dtype=bfloat16 keeps fp32 group statistics (flax promotes) —
    outputs must match the fp32-GN net to bf16 tolerance with IDENTICAL
    param structure (checkpoint compatible)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet

    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), np.float32))
    m32 = ResNetUNet(widths=(8, 16, 16, 16), stage_sizes=(1, 1, 1, 1))
    m16 = ResNetUNet(widths=(8, 16, 16, 16), stage_sizes=(1, 1, 1, 1),
                     norm_dtype=jnp.bfloat16)
    p = m32.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m16.init(jax.random.PRNGKey(0), x))
    y32 = m32.apply(p, x)
    y16 = m16.apply(p, x)  # same params: only the GN IO dtype differs
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               atol=5e-2, rtol=5e-2)


def test_info_nce_temperature():
    """temp divides the logits before the softmax; temp=1 is parity."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 5, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 5, 4)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(2, 7, 4)), jnp.float32)
    base = float(pose_trainer.info_nce_with_neg(q, k, kn))
    same = float(pose_trainer.info_nce_with_neg(q, k, kn, temp=1.0))
    scaled = float(pose_trainer.info_nce_with_neg(q, k, kn, temp=2.0))
    manual = float(pose_trainer.info_nce_with_neg(q / 2.0, k, kn))
    assert base == same
    np.testing.assert_allclose(scaled, manual, rtol=1e-5)


@pytest.mark.slow
def test_pose_regularizer_knobs_run(cors_setup):
    """pos_noise / infonce_temp / head_weight_decay train steps execute and
    produce finite, knob-dependent losses (round-5 overfitting levers)."""
    scene, cors = cors_setup
    bank = pose_trainer.load_ray_bank(cors, S, 6)
    a1 = artifacts.load_array(cors, "a1.npy")
    neg = a1[np.random.default_rng(0).permutation(a1.shape[0])[:200]]
    field = fields.NerfField(FieldConfig(n_harmonic_functions=6, n_hidden=32))
    nerf_params = fields.init_field(field, jax.random.PRNGKey(0))
    cnn = ResNetUNet(widths=(16, 24, 32, 32), decoder_width=16)

    def run(**kw):
        cfg = PoseTrainConfig(batch_size=2, sample_size=64, warmup_steps=4, **kw)
        state, _, losses = pose_trainer.train_pose(
            field, nerf_params, scene.images, scene.sils, bank, neg,
            cfg=cfg, n_steps=6, cnn=cnn, steps_per_call=3,
        )
        assert np.all(np.isfinite(losses))
        return state, losses

    _, base = run()
    _, noisy = run(pos_noise=0.02)
    assert base != noisy  # positive keys actually jittered
    _, temped = run(infonce_temp=4.0)
    assert base != temped
    st_wd, _ = run(head_weight_decay=1e-2)
    # weight decay applies to the feature head (still finite + trains)
    assert np.all(np.isfinite(np.asarray(
        jax.tree.leaves(st_wd.nerf_params["params"]["feature_layer"])[0])))
