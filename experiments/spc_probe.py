"""Does raising steps_per_call cut the fused NeRF phase's host round-trips?

The bench's fused NeRF phase (800 steps, steps_per_call=50) makes 16
device calls; each call pays relay dispatch + a loss-vector device->host
transfer (~40-90 ms each through the axon relay).  This times the SAME
800-step training at spc in {50, 200} on the cached bench scenes,
best-of-2 per setting (relay variance).

Usage: python experiments/spc_probe.py
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
STEPS = int(os.environ.get("SPC_STEPS", 800))


def main():
    halves = [load_scene_cached(uh, 8, 224, cache_dir=_CACHE) for uh in (0, 1)]
    stacked = tuple(
        np.stack([np.asarray(getattr(s, f)) for s in halves])
        for f in ("images", "sils", "R_bop", "t_bop", "K")
    )
    act = os.environ.get("ACT_DTYPE", "float32")
    field = fields.NerfField(FieldConfig(act_dtype=act))
    cfg = NerfTrainConfig(warmup_steps=min(300, max(STEPS // 3, 1)))
    print(f"act_dtype={act}")

    spcs = (50,) if os.environ.get("SPC_ONLY50") else (50, 200, 100)
    for spc in spcs:
        best = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            states, loss = nerf_trainer.train_nerf_fused(
                *stacked, field, render_cfg=RenderConfig(n_rays_per_image=400),
                train_cfg=cfg, n_steps=STEPS, steps_per_call=spc,
            )
            jax.block_until_ready(states[0].params_fine)
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"spc={spc:4d} rep={rep}: {dt:7.2f} s  "
                  f"final={loss[:, -10:].mean(1).round(2).tolist()}", flush=True)
        print(f"spc={spc:4d} BEST: {best:7.2f} s", flush=True)


if __name__ == "__main__":
    main()
