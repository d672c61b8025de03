"""Time generate_cors END-TO-END exactly as the bench's cors phase runs it
(CORS_TIMING=1 stage prints), on an init field with a low threshold so
marching tetrahedra sees a bench-comparable vertex load.

Usage: CORS_TIMING=1 python experiments/cors_e2e_probe.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import CorsConfig, FieldConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import generate_cors

S, GRID, V = 224, 128, 8


def main():
    # AnalyticField: realistic surface/vertex counts without training.
    # Device compute differs from the trained-field kernel path (timed in
    # cors_probe.py); what this probe isolates is the HOST/IO/fetch
    # structure of the phase, which is field-independent.
    field = synthetic.AnalyticField()
    scene = synthetic.make_scene(n_views=V, image_size=S)
    cfg = CorsConfig(density_threshold=0.2)
    out = "/tmp/cors_e2e_probe"

    for it in ("cold", "warm1", "warm2"):
        shutil.rmtree(out, ignore_errors=True)
        params = None
        t0 = time.perf_counter()
        generate_cors.generate_cors(
            field, params, scene.R_bop, scene.t_bop, scene.K, scene.sils,
            out, 1, cfg, grid_res=GRID, image_size=S,
        )
        print(f"{it}: generate_cors total {time.perf_counter() - t0:.2f} s")


if __name__ == "__main__":
    main()
