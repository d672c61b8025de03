"""Time field_kernel.bundle_loss_grads at the production train-step load.

Per step the trainer launches it twice per half: coarse (P=64) and fine
(P=320).  This probe times each in a 50-iter scan (params perturbed per
iter so nothing hoists), fetch-synced, 10-iter run differenced out.

    FIELD_KERNEL_TILE=2048 python experiments/loss_kernel_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel

H, RAYS = 2, 1200
ITERS = 50


def timed(fn, *args, iters=ITERS):
    jfn = jax.jit(functools.partial(fn, n=iters), static_argnames="n")
    jfn10 = jax.jit(functools.partial(fn, n=10), static_argnames="n")
    best = best10 = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jfn10(*args))
        best10 = min(best10, time.perf_counter() - t0)
    return (best - best10) / (iters - 10)


def main():
    # PROBE_EMBED=grouped measures the round-5 double-angle ladder
    # (EXPERIMENTS.md "Grouped double-angle harmonic embedding")
    cfg = FieldConfig(act_dtype="bfloat16",
                      embed_method=os.environ.get("PROBE_EMBED", "direct"))
    field = fields.NerfField(cfg)
    params = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[fields.init_field(field, jax.random.PRNGKey(h)) for h in range(H)],
    )
    key = jax.random.PRNGKey(0)
    print(f"tile={field_kernel._TILE_PTS} embed={cfg.embed_method}")

    for name, P, want_w in (("fine", 320, False), ("coarse", 64, True)):
        pts = jax.random.uniform(key, (H, RAYS, P, 3), minval=-1.0, maxval=1.0)
        dirs = jax.random.normal(key, (H, RAYS, 3))
        col = jax.random.uniform(key, (H, RAYS, 3))
        sil = jnp.ones((H, RAYS, 1))
        valid = jnp.ones((H, RAYS, 1))

        def grads_sum(p, pts, dirs, col, sil, valid):
            def one(ph, pth, dh, ch, sh, vh):
                g, (ce, se), w = field_kernel.bundle_loss_grads(
                    ph, pth, dh, ch, sh, vh, cfg, huber_scaling=0.1,
                    scale=500.0 / RAYS, want_weights=want_w)
                return jax.tree.reduce(lambda a, b: a + b.sum(), g,
                                       ce + se + (w.sum() if want_w else 0.0))
            return jax.vmap(one)(p, pts, dirs, col, sil, valid).sum()

        def many(p, pts, dirs, col, sil, valid, n):
            def body(c, _):
                # fold the carry into params so the op can't hoist
                p2 = jax.tree.map(lambda a: a + 0.0 * c, p)
                return c + grads_sum(p2, pts, dirs, col, sil, valid), None
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out

        t = timed(many, params, pts, dirs, col, sil, valid)
        print(f"{name:6s} P={P:3d} want_w={int(want_w)}  {t*1e3:6.2f} ms/iter")


if __name__ == "__main__":
    main()
