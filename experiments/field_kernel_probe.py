"""Fused Pallas field kernel vs flax field on the real TPU.

Checks numerics (fwd values + grads vs the flax path at the production
config) and times fwd+bwd at the exact train-step point load
(2 halves x 1200 rays x {384, 64} pts), fetch-synced with two iteration
counts differenced.

Usage: python experiments/field_kernel_probe.py
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

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel

H, RAYS = 2, 1200
ITERS = 50


def timed(fn, params, pts, dirs, iters):
    @functools.partial(jax.jit, static_argnames="n")
    def many(p, pts, dirs, n):
        def body(p, _):
            g = jax.grad(fn)(p, pts, dirs)
            return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), None

        p, _ = jax.lax.scan(body, p, None, length=n)
        return jax.tree.reduce(lambda a, b: a + b.sum(), p, jnp.zeros(()))

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(params, pts, dirs, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = FieldConfig(act_dtype="bfloat16")
    field = fields.NerfField(cfg)
    params = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[fields.init_field(field, jax.random.PRNGKey(h)) for h in range(H)],
    )
    key = jax.random.PRNGKey(0)

    # --- numerics on TPU (small shape)
    p0 = jax.tree.map(lambda x: x[0], params)
    pts_s = jax.random.normal(key, (8, 16, 3)) * 0.5
    dirs_s = jax.random.normal(key, (8, 3))
    dk, rk = jax.jit(
        lambda p, x, d: field_kernel.field_color(p, x, d, cfg, interpret=False)
    )(p0, pts_s, dirs_s)
    df, rf = jax.jit(lambda p, x, d: field.apply(p, x, d, "color"))(p0, pts_s, dirs_s)
    dk, rk, df, rf = map(np.asarray, (dk, rk, df, rf))
    print(f"fwd max |d dens| = {np.abs(dk - df).max():.2e}  "
          f"|d rgb| = {np.abs(rk - rf).max():.2e}")
    assert np.abs(dk - df).max() < 3e-2 and np.abs(rk - rf).max() < 3e-2

    def loss_k(p, x, d):
        dens, rgb = field_kernel.field_color(p, x, d, cfg, interpret=False)
        return (dens.sum() + (rgb * jnp.cos(rgb)).sum()) / x.shape[0]

    def loss_f(p, x, d):
        dens, rgb = field.apply(p, x, d, "color")
        return (dens.sum() + (rgb * jnp.cos(rgb)).sum()) / x.shape[0]

    gk = jax.jit(jax.grad(loss_k))(p0, pts_s, dirs_s)
    gf = jax.jit(jax.grad(loss_f))(p0, pts_s, dirs_s)
    worst = 0.0
    for (path, lk), (_, lf) in zip(
        jax.tree_util.tree_leaves_with_path(gk),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        s = max(float(np.abs(np.asarray(lf)).max()), 1e-3)
        rel = float(np.abs(np.asarray(lk, np.float32) - np.asarray(lf, np.float32)).max() / s)
        worst = max(worst, rel)
    print(f"grad worst rel diff vs flax: {worst:.3e}")
    assert worst < 5e-2

    # --- perf at the step load, vmapped over halves like the trainer
    for name, P in (("fine  P=320", 320), ("coarse P=64", 64), ("combined P=384", 384)):
        pts = jax.random.normal(key, (H, RAYS, P, 3)) * 0.5
        dirs = jax.random.normal(key, (H, RAYS, 3))

        def vk(p, x, d):
            return jax.vmap(loss_k)(p, x, d).sum()

        def vf(p, x, d):
            return jax.vmap(loss_f)(p, x, d).sum()

        variants = (("kernel", vk),) if os.environ.get("PROBE_SKIP_FLAX") else (
            ("kernel", vk), ("flax  ", vf))
        for tag, fn in variants:
            hi = timed(fn, params, pts, dirs, ITERS)
            lo = timed(fn, params, pts, dirs, ITERS // 5)
            per = (hi - lo) / (ITERS - ITERS // 5)
            print(f"{name} {tag}: {1e3 * per:6.1f} ms/iter  "
                  f"({hi:.2f}s/{ITERS}, {lo:.2f}s/{ITERS // 5})")


if __name__ == "__main__":
    main()
