"""Decompose the descriptor-training step cost (bench: ~78 ms/step at
bs=16, 224^2): augmentation vs CNN fwd+bwd vs keys/InfoNCE.

Variants (each scanned K iters in one program, fetch-synced, two iter
counts differenced):
  full      — the production make_pose_train_step loss (fwd+bwd+Adam-less)
  aug-only  — vmapped augment_view alone (gather-warp heavy)
  cnn-only  — ResNetUNet fwd+bwd on the (16, 224, 224, 3) batch
  keys-only — SIREN key evals + InfoNCE on selected samples

Usage: python experiments/pose_step_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    FieldConfig,
    PoseTrainConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data.scene_cache import (
    load_scene_cached,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import pose_trainer

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
B, S = 16, 224
ITERS = 40


def timed(grad_fn, params, args, iters):
    @functools.partial(jax.jit, static_argnames="n")
    def many(p, args, n):
        def body(carry, _):
            p, k = carry
            g = grad_fn(p, *args, k)
            p = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
            return (p, jax.random.fold_in(k, 1)), None

        (p, _), _ = jax.lax.scan(body, (p, jax.random.PRNGKey(0)), None, length=n)
        return jax.tree.reduce(lambda a, b: a + b.sum(), p, jnp.zeros(()))

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(params, args, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, grad_fn, params, args):
    hi = timed(grad_fn, params, args, ITERS)
    lo = timed(grad_fn, params, args, ITERS // 5)
    per = (hi - lo) / (ITERS - ITERS // 5)
    print(f"{name:10s}: {1e3 * per:6.1f} ms/iter  ({hi:.2f}s/{ITERS}, {lo:.2f}s/{ITERS // 5})")


def main():
    scene = load_scene_cached(0, B, S, cache_dir=_CACHE)
    images = jnp.asarray(scene.images)
    sils = jnp.asarray(scene.sils)
    cfg = PoseTrainConfig()
    aug_cfg = aug_lib.AugmentConfig()
    field = fields.NerfField(FieldConfig(act_dtype="bfloat16"))
    nerf_params = fields.init_field(field, jax.random.PRNGKey(0))
    cnn = ResNetUNet(norm_dtype=jnp.bfloat16 if os.environ.get("POSE_GN_BF16") else jnp.float32)
    cnn_params = jax.jit(cnn.init)(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))
    rng = np.random.default_rng(0)
    pos_vec = jnp.asarray(rng.normal(size=(B, 512, 3)) * 0.3, jnp.float32)
    xys = jnp.asarray(rng.uniform(-0.8, 0.8, size=(B, 512, 2)), jnp.float32)
    valid = jnp.ones((B, 512), bool)
    neg_pts = jnp.asarray(rng.normal(size=(80000, 3)) * 0.3, jnp.float32)

    # --- full step loss (reuse the production loss_fn via the step factory)
    tx = pose_trainer.make_pose_optimizer(cfg)
    step_fn = pose_trainer.make_pose_train_step(field, cnn, tx, cfg, aug_cfg)
    # grad of the production loss without the optimizer update: rebuild it
    def full_grad(params, images, sils, pos_vec, xys, valid, neg_pts, key):
        # reach the inner loss through the step: run value_and_grad directly
        def loss(params):
            nerf_p, cnn_p = params
            k_aug, k_sel, k_noise = jax.random.split(key, 3)
            aug = jax.vmap(aug_lib.augment_view, in_axes=(0, 0, 0, None, None, None))(
                jax.random.split(k_aug, B), images, sils, aug_cfg, None, None)
            new_xys = jax.vmap(aug_lib.transform_xys)(xys, aug.A, aug.t)
            sel = jax.vmap(aug_lib.select_ray_samples, in_axes=(0, 0, 0, None))(
                jax.random.split(k_sel, B), new_xys, valid, cfg.sample_size)
            sel_xys = jnp.take_along_axis(new_xys, sel[..., None], axis=1)
            sel_pos = jnp.take_along_axis(pos_vec, sel[..., None], axis=1)
            feat_full = cnn.apply(cnn_p, aug.rgb)
            from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.grid_sample import (
                grid_sample,
            )
            queries = grid_sample(feat_full[..., :12], -sel_xys, mode="nearest")
            keys = field.apply(nerf_p, sel_pos, method=field.features)
            k_pick, k_jit = jax.random.split(k_noise)
            neg_idx = jax.random.randint(k_pick, (B, cfg.sample_size), 0, neg_pts.shape[0])
            neg = neg_pts[neg_idx] + jax.random.normal(k_jit, (B, cfg.sample_size, 3)) * cfg.key_noise
            neg_keys = field.apply(nerf_p, neg, method=field.features)
            nce = pose_trainer.info_nce_with_neg(queries, keys, neg_keys, cfg.infonce_scale)
            import optax
            bce = optax.sigmoid_binary_cross_entropy(feat_full[..., -1], aug.mask_full).mean()
            return nce + bce * cfg.mask_loss_scale
        return jax.grad(loss)(params)

    report("full", full_grad, (nerf_params, cnn_params),
           (images, sils, pos_vec, xys, valid, neg_pts))

    # --- augmentation only, FORWARD cost (the real step never backprops
    # through the warps: images are constants); p only feeds the RNG path
    def aug_grad(params, images, sils, key):
        aug = jax.vmap(aug_lib.augment_view, in_axes=(0, 0, 0, None, None, None))(
            jax.random.split(key, B), images, sils, aug_cfg, None, None)
        return params + aug.rgb.sum() * 1e-9  # scalar "grad" carrying a data dep

    report("aug-fwd", aug_grad, jnp.zeros(()), (images, sils))

    # --- CNN only
    def cnn_grad(params, images, key):
        def loss(p):
            return cnn.apply(p, images).sum() / B
        return jax.grad(loss)(params)

    report("cnn-only", cnn_grad, cnn_params, (images,))

    # --- keys + InfoNCE only
    q_fake = jnp.asarray(rng.normal(size=(B, min(cfg.sample_size, 512), 12)), jnp.float32)
    def keys_grad(params, pos, key):
        def loss(p):
            sel_pos = pos[:, : min(cfg.sample_size, 512)]
            keys = field.apply(p, sel_pos, method=field.features)
            k_pick, k_jit = jax.random.split(key)
            neg_idx = jax.random.randint(k_pick, (B, cfg.sample_size), 0, neg_pts.shape[0])
            neg = neg_pts[neg_idx] + jax.random.normal(k_jit, (B, cfg.sample_size, 3)) * cfg.key_noise
            neg_keys = field.apply(p, neg, method=field.features)
            return pose_trainer.info_nce_with_neg(q_fake, keys, neg_keys, cfg.infonce_scale)
        return jax.grad(loss)(params)

    report("keys-only", keys_grad, nerf_params, (pos_vec,))


if __name__ == "__main__":
    main()
