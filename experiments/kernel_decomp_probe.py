"""Decompose the fused field kernel's runtime on the real TPU.

Times the stored-residual kernel at the production train-step load
(2 halves x 1200 rays, fine P=320 / coarse P=64) in two modes:

* fwd-only (the pallas forward alone, loss-summed, no grad)
* fwd+bwd (jax.grad through the custom VJP — what the train step pays)

Run it under the probe-only env knobs to isolate the VPU transcendental
share (numerics are intentionally wrong under these; timing-only):

    python experiments/kernel_decomp_probe.py                      # exact
    FIELD_KERNEL_PROBE_SINCOS=poly python experiments/kernel_decomp_probe.py
    FIELD_KERNEL_PROBE_SOFTPLUS=relu python experiments/kernel_decomp_probe.py
    FIELD_KERNEL_PROBE_SINCOS=poly FIELD_KERNEL_PROBE_SOFTPLUS=relu \
        python experiments/kernel_decomp_probe.py

exact(fwd+bwd) - poly(fwd+bwd) ~= the sin/cos share, etc.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel

H, RAYS = 2, 1200
ITERS = 50


def timed(fn, *args, iters=ITERS):
    jfn = jax.jit(functools.partial(fn, n=iters), static_argnames="n")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    # subtract a 10-iter run to cancel dispatch/fetch overhead
    jfn10 = jax.jit(functools.partial(fn, n=10), static_argnames="n")
    t10 = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jfn10(*args))
        t10 = min(t10, time.perf_counter() - t0)
    return (best - t10) / (iters - 10)


def main():
    cfg = FieldConfig(act_dtype="bfloat16")
    field = fields.NerfField(cfg)
    params0 = fields.init_field(field, jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[fields.init_field(field, jax.random.PRNGKey(h)) for h in range(H)],
    )
    key = jax.random.PRNGKey(0)

    print(f"sincos={field_kernel._PROBE_SINCOS} softplus={field_kernel._PROBE_SOFTPLUS} "
          f"tile={field_kernel._TILE_PTS}")

    for name, P in (("fine", 320), ("coarse", 64)):
        pts = jax.random.uniform(key, (H, RAYS, P, 3), minval=-1.0, maxval=1.0)
        dirs = jax.random.normal(key, (H, RAYS, 3))

        def loss(p, pts, dirs):
            def one(ph, pth, dh):
                dens, rgb = field_kernel.field_color(ph, pth, dh, cfg)
                return dens.astype(jnp.float32).sum() + rgb.astype(jnp.float32).sum()
            return jax.vmap(one)(p, pts, dirs).sum()

        def fwd_many(p, pts, dirs, n):
            def body(c, _):
                return c + loss(p, pts, dirs), None
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        def fb_many(p, pts, dirs, n):
            def body(p, _):
                g = jax.grad(loss)(p, pts, dirs)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), None
            p, _ = jax.lax.scan(body, p, None, length=n)
            return jax.tree.reduce(lambda a, b: a + b.sum(), p, jnp.zeros(()))

        t_f = timed(fwd_many, params, pts, dirs)
        t_fb = timed(fb_many, params, pts, dirs)
        print(f"{name:6s} P={P:3d}  fwd {t_f*1e3:6.2f} ms  fwd+bwd {t_fb*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
