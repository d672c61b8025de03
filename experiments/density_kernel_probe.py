"""Fused density kernel + cors-phase probes (round 4).

Measures, fetch-synced warm best-of-N (relay lottery — see
EXPERIMENTS.md "block_until_ready is a NO-OP"):

1. density eval at the 128^3 grid load: fused Pallas kernel vs flax
   (renderer.density_grid path, nerf.py:676-687),
2. density eval at the cors front-pass load (50k rays x 256 pts),
3. the full generate_cors wall time on the bench scene (8 views), which
   also captures the dropped feature-head eval (the reference renders
   mode='feature' at generateCors.py:300 but only uses the weights).

Run on TPU: python experiments/density_kernel_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timed(fn, n=8):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(n):
        t = time.perf_counter()
        out = fn()
        # device->host fetch is the only sync through the relay
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t)
    return best


def main():
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        CorsConfig, FieldConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import generate_cors
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data.scene_cache import (
        load_scene_cached,
    )

    cfg = FieldConfig(act_dtype="bfloat16")
    field = fields.NerfField(cfg)
    params = fields.init_field(field, jax.random.PRNGKey(0))
    print(f"backend={jax.default_backend()} kernel_enabled={field_kernel.enabled(cfg)}",
          flush=True)

    # 1. grid load
    grid_pts = jax.random.normal(jax.random.PRNGKey(1), (2_097_152, 3)) * 0.6

    @jax.jit
    def grid_flax(p):
        return field.apply(p, grid_pts, method=field.density)

    @jax.jit
    def grid_kernel(p):
        return field_kernel.field_density(p, grid_pts, cfg)

    t_f = timed(lambda: grid_flax(params))
    t_k = timed(lambda: grid_kernel(params))
    print(f"grid 2.1M pts: flax {t_f*1e3:.1f} ms  kernel {t_k*1e3:.1f} ms "
          f"({t_f/t_k:.2f}x)", flush=True)
    d_f = np.asarray(grid_flax(params))
    d_k = np.asarray(grid_kernel(params))
    print(f"  max |diff| = {np.abs(d_f - d_k).max():.2e}", flush=True)

    # 2. cors front-pass load: 49152 rays x 256 pts
    ray_pts = jax.random.normal(jax.random.PRNGKey(2), (49152, 256, 3)) * 0.6

    @jax.jit
    def rays_flax(p):
        return field.apply(p, ray_pts, method=field.density)

    @jax.jit
    def rays_kernel(p):
        return field_kernel.field_density(p, ray_pts, cfg)

    t_f = timed(lambda: rays_flax(params))
    t_k = timed(lambda: rays_kernel(params))
    print(f"rays 12.6M pts: flax {t_f*1e3:.1f} ms  kernel {t_k*1e3:.1f} ms "
          f"({t_f/t_k:.2f}x)", flush=True)

    # 3. end-to-end generate_cors on the bench scene
    scene = load_scene_cached(0, 8, 224, cache_dir=os.path.join(_REPO, ".bench_cache"))
    import tempfile
    out = tempfile.mkdtemp(prefix="dkprobe_")
    t0 = time.perf_counter()
    generate_cors.generate_cors(
        field, params, scene.R_bop, scene.t_bop, scene.K, scene.sils,
        out, 1, CorsConfig(density_threshold=0.004), grid_res=128, image_size=224,
    )
    print(f"generate_cors 8 views: {time.perf_counter() - t0:.2f} s (cold)",
          flush=True)


if __name__ == "__main__":
    main()
