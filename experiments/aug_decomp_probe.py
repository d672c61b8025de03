"""Decompose augment_view's 37 ms/step forward cost into sub-ops.

Each variant runs the sub-op vmapped over the (16, 224, 224) batch,
scanned in one program, fetch-synced, two iter counts differenced.

Usage: python experiments/aug_decomp_probe.py
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

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data.scene_cache import (
    load_scene_cached,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug_lib

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
B, S = 16, 224
ITERS = 40


def timed(fn, args, iters):
    @functools.partial(jax.jit, static_argnames="n")
    def many(args, n):
        def body(carry, _):
            acc, k = carry
            out = fn(k, *args)
            return (acc + out, jax.random.fold_in(k, 1)), None

        (acc, _), _ = jax.lax.scan(body, (jnp.zeros(()), jax.random.PRNGKey(0)), None, length=n)
        return acc

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(args, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, fn, args):
    hi = timed(fn, args, ITERS)
    lo = timed(fn, args, ITERS // 5)
    per = (hi - lo) / (ITERS - ITERS // 5)
    print(f"{name:12s}: {1e3 * per:6.1f} ms/iter")


def main():
    scene = load_scene_cached(0, B, S, cache_dir=_CACHE)
    images = jnp.asarray(scene.images)
    sils = jnp.asarray(scene.sils)

    def rand_At(k):
        theta = jax.random.uniform(k) * 2 * jnp.pi
        c, s = jnp.cos(theta), jnp.sin(theta)
        return 0.9 * jnp.asarray([[c, -s], [s, c]]), jnp.asarray([0.05, -0.03])

    def warps3(k, images, sils):
        def one(k, rgb, mask):
            A, t = rand_At(k)
            a = aug_lib.warp_affine_ndc(rgb, A, t)
            b = aug_lib.warp_affine_ndc(mask, A, t, nearest=True)
            c = aug_lib.warp_affine_ndc(mask, A, t, nearest=True)
            return a.sum() + b.sum() + c.sum()
        return jax.vmap(one)(jax.random.split(k, B), images, sils).sum() * 1e-9

    def warp1(k, images, sils):
        def one(k, rgb, mask):
            A, t = rand_At(k)
            return aug_lib.warp_affine_ndc(rgb, A, t).sum()
        return jax.vmap(one)(jax.random.split(k, B), images, sils).sum() * 1e-9

    def noise_bg(k, images, sils):
        def one(k, rgb, mask):
            return aug_lib._smooth_noise(k, S).sum()
        return jax.vmap(one)(jax.random.split(k, B), images, sils).sum() * 1e-9

    def blur_iso(k, images, sils):
        def one(k, rgb, mask):
            sig = jax.random.uniform(k, minval=0.3, maxval=1.0)
            out = aug_lib.gaussian_blur3(rgb, sig)
            return aug_lib.iso_noise(k, out).sum()
        return jax.vmap(one)(jax.random.split(k, B), images, sils).sum() * 1e-9

    def border(k, images, sils):
        def one(k, rgb, mask):
            dil = jax.lax.reduce_window(mask, -jnp.inf, jax.lax.max, (9, 9), (1, 1), "SAME")
            return (rgb * (dil > 0.5)[..., None]).sum()
        return jax.vmap(one)(jax.random.split(k, B), images, sils).sum() * 1e-9

    def occl(k, images, sils):
        def one(k, rgb, mask):
            x0, y0, w, h = aug_lib._mask_bbox(mask)
            m1 = aug_lib._occlude(k, mask, x0, y0, w, h)
            m2 = aug_lib._line_erode(k, m1, x0, y0, w, h)
            return m2.sum()
        return jax.vmap(one)(jax.random.split(k, B), images, sils).sum() * 1e-9

    report("warps-x3", warps3, (images, sils))
    report("warp-x1", warp1, (images, sils))
    report("noise-bg", noise_bg, (images, sils))
    report("blur+iso", blur_iso, (images, sils))
    report("border-dil", border, (images, sils))
    report("occl+erode", occl, (images, sils))


if __name__ == "__main__":
    main()
