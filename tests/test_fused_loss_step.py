"""The fully fused train step (field_kernel.bundle_loss_grads wired into
make_train_step) against the flax/split-kernel paths, interpret mode.

The kernel-level parity tests live in test_field_kernel.py; these check the
TRAINER wiring: ray generation, RNG streams, loss normalization and the
optimizer update are shared between the paths, so per-step losses and
updated params must agree to bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
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
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer

RENDER = RenderConfig(n_rays_per_image=32, n_pts_coarse=8, n_pts_fine=16)
TRAIN = NerfTrainConfig(batch_size=2, warmup_steps=4)


def _setup(fused_kernel, mesh=None, seed=0):
    cfg = FieldConfig(
        n_harmonic_functions=6, n_hidden=32, act_dtype="bfloat16",
        fused_kernel=fused_kernel,
    )
    field = fields.NerfField(cfg)
    tx = nerf_trainer.make_optimizer(TRAIN)
    state, _ = nerf_trainer.init_state(field, TRAIN, jax.random.PRNGKey(seed))
    step = nerf_trainer.make_train_step(
        field, tx, RENDER, TRAIN, 1.0, 5.0, mesh=mesh
    )
    return field, state, step


def _scene_batch():
    scene = synthetic.make_scene(n_views=4, image_size=16, n_pts_per_ray=8)
    cam = cam_lib.camera_from_bop(
        jnp.asarray(scene.R_bop[:2]), jnp.asarray(scene.t_bop[:2]),
        jnp.asarray(scene.K[:2]), 16,
    )
    return cam, jnp.asarray(scene.images[:2]), jnp.asarray(scene.sils[:2])


def _run(state, step, n=3, seed=7):
    cam, images, sils = _scene_batch()
    losses, key = [], jax.random.PRNGKey(seed)
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, loss, aux = step(state, cam, images, sils, sub)
        losses.append(float(loss))
    return state, losses


def test_fused_loss_step_matches_flax_step():
    _, state_k, step_k = _setup(fused_kernel=True)
    _, state_f, step_f = _setup(fused_kernel=False)
    st_k, losses_k = _run(state_k, step_k)
    st_f, losses_f = _run(state_f, step_f)
    np.testing.assert_allclose(losses_k, losses_f, rtol=5e-2, atol=5e-2)
    for a, b in zip(jax.tree.leaves(st_k.params_fine),
                    jax.tree.leaves(st_f.params_fine)):
        # first Adam updates are sign(grad)-scaled; bf16 grad noise can
        # flip near-zero elements, bounded by the warmed-up lr
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_fused_loss_step_matches_split_kernel_step(monkeypatch):
    _, state_a, step_a = _setup(fused_kernel=True)
    monkeypatch.setenv("FUSED_LOSS_KERNEL", "0")
    _, state_b, step_b = _setup(fused_kernel=True)
    monkeypatch.delenv("FUSED_LOSS_KERNEL")
    st_a, losses_a = _run(state_a, step_a)
    st_b, losses_b = _run(state_b, step_b)
    # same kernel math; only the composite's eps and the loss/grad
    # assembly differ (closed form in-kernel vs XLA cumprod)
    np.testing.assert_allclose(losses_a, losses_b, rtol=2e-2, atol=2e-2)
    for a, b in zip(jax.tree.leaves(st_a.params_fine),
                    jax.tree.leaves(st_b.params_fine)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs the CPU mesh")
def test_fused_loss_step_sharded_matches_single():
    mesh = mesh_lib.make_mesh()
    _, state_m, step_m = _setup(fused_kernel=True, mesh=mesh)
    _, state_s, step_s = _setup(fused_kernel=True, mesh=None)
    st_m, losses_m = _run(state_m, step_m)
    st_s, losses_s = _run(state_s, step_s)
    np.testing.assert_allclose(losses_m, losses_s, rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(st_m.params_fine),
                    jax.tree.leaves(st_s.params_fine)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    assert all(x.sharding.is_fully_replicated
               for x in jax.tree.leaves(st_m.params_fine))


def test_bundle_loss_single_ray_and_big_P(monkeypatch):
    """rt is floored at 2 (Mosaic can't lower (1, P) per-ray reductions):
    a single-ray call and a P > tile call must both pad, not shrink rt."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch

    cfg = FieldConfig(n_harmonic_functions=6, n_hidden=32,
                      act_dtype="bfloat16", fused_kernel=True)
    field = fields.NerfField(cfg)
    params = fields.init_field(field, jax.random.PRNGKey(0))
    for R, P in ((1, 9), (3, field_kernel._TILE_PTS * 2)):
        k = jax.random.PRNGKey(R)
        pts = jax.random.normal(k, (R, P, 3)) * 0.5
        dirs = jax.random.normal(k, (R, 3))
        col = jax.random.uniform(k, (R, 3))
        sil = jnp.ones((R, 1))
        valid = jnp.ones((R, 1))
        g, (ce, se), w = field_kernel.bundle_loss_grads(
            params, pts, dirs, col, sil, valid, cfg, huber_scaling=0.1,
            scale=1.0, want_weights=True, interpret=True)
        assert w.shape == (R, P)
        dens, rgb = field.apply(params, pts, dirs, "color")
        img, w_f = raymarch.composite(dens[..., 0], rgb)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_f),
                                   atol=2e-2, rtol=2e-2)
        assert np.isfinite(float(ce)) and np.isfinite(float(se))
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
