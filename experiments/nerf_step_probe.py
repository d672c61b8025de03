"""Bisect the fused NeRF train-step cost on TPU (round 3).

The bench's long pole is the fused two-half NeRF phase (~52 s / 800 steps
= ~65 ms/step for 2 halves x 3 cams x 400 rays).  This probe times 50-step
scans of ablated variants of the SAME step to locate the hot spot:

  full        the production fused step (bench configuration)
  nosort      importance_resample without the final jnp.sort (wrong
              numerics; times the 2400x384 per-ray sort)
  fine64      n_pts_fine 64 instead of 256 (times the fine MLP eval)
  nofine      coarse pass only (upper bound on everything non-fine)

Each variant runs twice (relay variance); report the min.  Usage:
  python experiments/nerf_step_probe.py
"""

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
    NerfTrainConfig,
    RenderConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer

H, N_VIEWS, S, STEPS = 2, 8, 224, 50


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    images = rng.random((H, N_VIEWS, S, S, 3), np.float32)
    sils = (rng.random((H, N_VIEWS, S, S)) > 0.5).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (H, N_VIEWS, 1, 1))
    t = np.zeros((H, N_VIEWS, 3), np.float32)
    t[..., 2] = 10.0
    K = np.tile(
        np.array([[2 * S, 0, S / 2], [0, 2 * S, S / 2], [0, 0, 1]], np.float32),
        (H, N_VIEWS, 1, 1),
    )
    return images, sils, R, t, K


def time_variant(name, render_cfg, n_steps=STEPS, repeats=2):
    field = fields.NerfField(FieldConfig(act_dtype="bfloat16"))
    data = make_data()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        states, losses = nerf_trainer.train_nerf_fused(
            *data, field, render_cfg=render_cfg,
            train_cfg=NerfTrainConfig(warmup_steps=20),
            n_steps=n_steps, steps_per_call=n_steps, mesh=None,
        )
        jax.block_until_ready(states[0].params_fine)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print(f"{name:8s}: {best:7.2f} s for {n_steps} steps "
          f"({1e3 * best / n_steps:6.1f} ms/step)  loss={losses[:, -1].round(3).tolist()}")
    return best


def main():
    base = RenderConfig(n_rays_per_image=400)

    # warm the compile caches with an untimed tiny call
    time_variant("warmup", base, n_steps=2, repeats=1)

    time_variant("full", base)

    orig = raymarch.importance_resample

    def no_sort(lengths, weights, n_samples, key, det=False, add_input_samples=True):
        z_mid = 0.5 * (lengths[..., 1:] + lengths[..., :-1])
        z_new = raymarch.sample_pdf(
            z_mid, jax.lax.stop_gradient(weights[..., 1:-1]), n_samples, key, det=det
        )
        return jnp.concatenate([lengths, z_new], axis=-1) if add_input_samples else z_new

    raymarch.importance_resample = no_sort
    try:
        time_variant("nosort", base)
    finally:
        raymarch.importance_resample = orig

    time_variant("fine64", RenderConfig(n_rays_per_image=400, n_pts_fine=64))
    time_variant("rays100", RenderConfig(n_rays_per_image=100))


if __name__ == "__main__":
    main()
