"""Orbax checkpoint round-trip + data-parallel training-step sharding."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    FieldConfig,
    NerfTrainConfig,
    RenderConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint, nerf_trainer


def test_checkpoint_roundtrip(tmp_path):
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    params = fields.init_field(field, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, params, step=42)
    assert checkpoint.exists(path)
    like = fields.init_field(field, jax.random.PRNGKey(1))
    loaded, step = checkpoint.load(path, like)
    assert step == 42
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # overwrite-save works (the reference overwrites 'latest' every 100 it)
    checkpoint.save(path, loaded, step=43)
    _, step2 = checkpoint.load(path, like)
    assert step2 == 43


@pytest.mark.slow
def test_data_parallel_train_step():
    """Batch sharded over the 8-device CPU mesh; params stay replicated and
    match the single-device result (gradient psum is exact)."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should force 8 virtual CPU devices"
    mesh = mesh_lib.make_mesh(8)
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    cfg = NerfTrainConfig(batch_size=8)
    rcfg = RenderConfig(n_rays_per_image=32, n_pts_coarse=8, n_pts_fine=8)
    scene = synthetic.make_scene(n_views=8, image_size=16, n_pts_per_ray=16)
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, 16)

    state, tx = nerf_trainer.init_state(field, cfg, jax.random.PRNGKey(0))
    step = nerf_trainer.make_train_step(field, tx, rcfg, cfg, 2.5, 5.5)
    key = jax.random.PRNGKey(1)

    # single-device (replicated) result
    st1, loss1, _ = step(state, cam, scene.images, scene.sils, key)

    # sharded batch
    shard = mesh_lib.batch_sharded(mesh)
    repl = mesh_lib.replicated(mesh)
    state_r = jax.device_put(state, repl)
    cam_s = cam_lib.Camera(
        jax.device_put(cam.R, shard), jax.device_put(cam.T, shard),
        jax.device_put(cam.focal, shard), jax.device_put(cam.principal, shard),
        cam.image_size,
    )
    st2, loss2, _ = step(
        state_r, cam_s, jax.device_put(scene.images, shard), jax.device_put(scene.sils, shard), key
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    # params after one step match
    p1 = jax.tree.leaves(st1.params_fine)
    p2 = jax.tree.leaves(st2.params_fine)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # updated params remain fully replicated
    for leaf in jax.tree.leaves(st2.params_fine):
        assert leaf.sharding.is_fully_replicated


def test_sharded_chamfer_matches_replicated(rng):
    """Point-cloud kernels under the mesh: query points sharded over the
    'data' axis, reference cloud replicated — XLA inserts the collectives
    (SURVEY.md §2c sharded-NN design)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc

    mesh = mesh_lib.make_mesh(8)
    a = jnp.asarray(rng.normal(size=(4096, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4096, 3)), jnp.float32)
    ref = float(pc.chamfer_distance(a, b, chunk=1024))
    a_s = jax.device_put(a, mesh_lib.batch_sharded(mesh))
    b_s = jax.device_put(b, mesh_lib.replicated(mesh))
    out = float(pc.chamfer_distance(a_s, b_s, chunk=1024))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_sharded_ransac_scoring(rng):
    """RANSAC with correspondences sharded over the mesh still matches."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import rotvec_to_matrix
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pnp

    mesh = mesh_lib.make_mesh(8)
    K = jnp.asarray([[300.0, 0, 112], [0, 300, 112], [0, 0, 1]])
    R = rotvec_to_matrix(jnp.asarray([0.2, -0.1, 0.3]))
    t = jnp.asarray([0.05, -0.08, 0.9])
    pts = jnp.asarray(rng.uniform(-0.2, 0.2, size=(512, 3)), jnp.float32)
    xc = pts @ R.T + t
    p2d = xc[:, :2] * jnp.asarray([300.0, 300.0]) / xc[:, 2:3] + 112.0
    res_r = pnp.ransac_pnp(pts, p2d, K, jax.random.PRNGKey(0), n_hyp=64)
    pts_s = jax.device_put(pts, mesh_lib.batch_sharded(mesh))
    p2d_s = jax.device_put(p2d, mesh_lib.batch_sharded(mesh))
    res_s = pnp.ransac_pnp(pts_s, p2d_s, jax.device_put(K, mesh_lib.replicated(mesh)), jax.random.PRNGKey(0), n_hyp=64)
    np.testing.assert_allclose(np.asarray(res_s.R), np.asarray(res_r.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_s.t), np.asarray(res_r.t), atol=1e-4)


@pytest.mark.slow
def test_train_nerf_resume(tmp_path):
    """--cont semantics: training continues from saved params
    (trainNerfFine.py:165-172)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import RenderConfig

    scene = synthetic.make_scene(n_views=4, image_size=24, n_pts_per_ray=16)
    field = fields.NerfField(FieldConfig(n_harmonic_functions=4, n_hidden=16))
    rcfg = RenderConfig(n_rays_per_image=32, n_pts_coarse=8, n_pts_fine=8)
    cfg = NerfTrainConfig(batch_size=2, warmup_steps=5)
    st1, l1 = nerf_trainer.train_nerf(
        scene.images, scene.sils, scene.R_bop, scene.t_bop, scene.K, field,
        rcfg, cfg, n_steps=20, depth_margin=1.5,
    )
    # resume from st1 params: first losses of run 2 ~ last losses of run 1
    st2, l2 = nerf_trainer.train_nerf(
        scene.images, scene.sils, scene.R_bop, scene.t_bop, scene.K, field,
        rcfg, cfg, n_steps=10, depth_margin=1.5,
        init_params=(st1.params_coarse, st1.params_fine),
    )
    assert np.mean(l2[:5]) < np.mean(l1[:5])  # better than cold start
