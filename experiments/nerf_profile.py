"""Capture a device trace of the fused NeRF multi-step and print the
op-level time breakdown (no TensorBoard UI needed —
tensorboard_plugin_profile's converter turns the xplane into JSON).

Usage: python experiments/nerf_profile.py [trace_dir]
"""

import glob
import json
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


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerf_trace"
    halves = [load_scene_cached(uh, 8, 224, cache_dir=_CACHE) for uh in (0, 1)]
    stacked = tuple(
        np.stack([np.asarray(getattr(s, f)) for s in halves])
        for f in ("images", "sils", "R_bop", "t_bop", "K")
    )
    act = os.environ.get("ACT_DTYPE", "float32")
    field = fields.NerfField(FieldConfig(act_dtype=act))
    cfg = NerfTrainConfig(warmup_steps=30)

    # warm (compile outside the trace)
    nerf_trainer.train_nerf_fused(
        *stacked, field, render_cfg=RenderConfig(n_rays_per_image=400),
        train_cfg=cfg, n_steps=50, steps_per_call=50,
    )

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        states, _ = nerf_trainer.train_nerf_fused(
            *stacked, field, render_cfg=RenderConfig(n_rays_per_image=400),
            train_cfg=cfg, n_steps=100, steps_per_call=50,
        )
        jax.block_until_ready(states[0].params_fine)
    print(f"traced 100 steps in {time.perf_counter() - t0:.2f} s")

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("op_profile", "overview_page"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
            out = os.path.join(trace_dir, f"{tool}.json")
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            print("wrote", out)
        except Exception as e:
            print(f"{tool} failed: {e}")


if __name__ == "__main__":
    main()
