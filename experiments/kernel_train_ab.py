"""A/B the fused NeRF train phase: Pallas field kernel vs flax field.

Runs train_nerf_fused on the cached real scenes at the bench schedule's
shape (800x400 rays) for a shortened step count, both with and without
the fused kernel, comparing wall time and final losses.

Usage: [STEPS=200] python experiments/kernel_train_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
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
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data.scene_cache import (
    load_scene_cached,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
STEPS = int(os.environ.get("STEPS", "200"))


def run(use_kernel: bool, stacked):
    field = fields.NerfField(FieldConfig(act_dtype="bfloat16",
                                         fused_kernel=use_kernel))
    t0 = time.perf_counter()
    states, losses = nerf_trainer.train_nerf_fused(
        *stacked, field, render_cfg=RenderConfig(n_rays_per_image=400),
        train_cfg=NerfTrainConfig(warmup_steps=30),
        n_steps=STEPS, steps_per_call=50,
    )
    dt = time.perf_counter() - t0
    return dt, losses


def main():
    halves = [load_scene_cached(uh, 8, 224, cache_dir=_CACHE) for uh in (0, 1)]
    stacked = tuple(
        np.stack([np.asarray(getattr(s, f)) for s in halves])
        for f in ("images", "sils", "R_bop", "t_bop", "K")
    )
    for name, flag in (("flax  ", False), ("kernel", True)):
        times = []
        for rep in range(2):
            dt, losses = run(flag, stacked)
            times.append(dt)
        print(f"{name}: {min(times):7.2f} s best of {[round(t, 1) for t in times]} "
              f"for {STEPS} steps  final losses "
              f"{np.asarray(losses)[:, -1].round(4).tolist()}")


if __name__ == "__main__":
    main()
