"""What is the fused NeRF step's cost BEYOND the field kernel?

Step ~34.8 ms at the bench schedule; isolated field kernel fwd+bwd is
~21 ms (coarse 3.5 + fine 17.5).  This times the other pieces at the
exact step shapes (2 halves x 1200 rays), each scanned in one program,
fetch-synced, iteration counts differenced:

  rays+gt    — monte_carlo_rays + grid_sample of GT colors/sils
  composite  — EA compositing fwd+bwd (coarse 64 + fine 384 pts)
  resample   — importance_resample (sample_pdf + concat + SORT)
  adam       — optimizer update on both halves' (coarse, fine) params

Usage: python experiments/nerf_residual_probe.py
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

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    FieldConfig,
    NerfTrainConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.grid_sample import (
    sample_images_at_mc_locs,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer

H, RAYS, PC, PF = (int(os.environ.get(k, d)) for k, d in
    (("PR_H", 2), ("PR_RAYS", 1200), ("PR_PC", 64), ("PR_PF", 320)))
ITERS = int(os.environ.get("PR_ITERS", 40))


def timed(fn, args, iters):
    @functools.partial(jax.jit, static_argnames="n")
    def many(args, n):
        def body(carry, it):
            acc, k = carry
            out = fn(jax.random.fold_in(k, it), *args)
            return (acc + out, k), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros(()), jax.random.PRNGKey(0)), jnp.arange(n))
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
    print(f"{name:10s}: {1e3 * per:6.1f} ms/iter  ({hi:.2f}s/{ITERS})")


def main():
    key = jax.random.PRNGKey(0)
    S = 224
    R = jnp.broadcast_to(jnp.eye(3), (H, 3, 3) + ())  # fake cams per half
    Rb = jnp.broadcast_to(jnp.eye(3), (H, 3, 3, 3))
    tb = jnp.zeros((H, 3, 3)).at[..., 2].set(10.0)
    Kb = jnp.broadcast_to(
        jnp.asarray([[2.0 * S, 0, S / 2], [0, 2.0 * S, S / 2], [0, 0, 1.0]]),
        (H, 3, 3, 3))
    images = jax.random.uniform(key, (H, 3, S, S, 3))
    sils = (jax.random.uniform(key, (H, 3, S, S)) > 0.5).astype(jnp.float32)

    def rays_gt(k, Rb, tb, Kb, images, sils):
        def one(k, Rb, tb, Kb, images, sils):
            cam = cam_lib.camera_from_bop(Rb, tb, Kb, S)
            b = cam_lib.monte_carlo_rays(cam, 400, PC, 8.0, 12.0, k)
            sil_at = sample_images_at_mc_locs(sils[..., None], b.xys)
            col_at = sample_images_at_mc_locs(images, b.xys)
            return b.origins.sum() + b.lengths.sum() + sil_at.sum() + col_at.sum()
        return jax.vmap(one)(jax.random.split(k, H), Rb, tb, Kb, images, sils).sum() * 1e-9

    report("rays+gt", rays_gt, (Rb, tb, Kb, images, sils))

    dens_c = jax.random.uniform(key, (H, RAYS, PC)) * 0.1
    rgb_c = jax.random.uniform(key, (H, RAYS, PC, 3))
    dens_f = jax.random.uniform(key, (H, RAYS, PF + PC)) * 0.1
    rgb_f = jax.random.uniform(key, (H, RAYS, PF + PC, 3))

    def comp(k, dens_c, rgb_c, dens_f, rgb_f):
        def one(args):
            dc, rc, df, rf = args
            def loss(dc, rc, df, rf):
                img_c, w_c = raymarch.composite(dc, rc)
                img_f, _ = raymarch.composite(df, rf)
                return img_c.sum() + img_f.sum() + w_c.sum()
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(dc, rc, df, rf)
            return sum(x.sum() for x in g)
        return jax.vmap(lambda *a: one(a))(dens_c + 0e-9, rgb_c, dens_f, rgb_f).sum() * 1e-9

    report("composite", comp, (dens_c, rgb_c, dens_f, rgb_f))

    lengths = jnp.sort(jax.random.uniform(key, (H, RAYS, PC)) * 4 + 8, axis=-1)
    w = jax.random.uniform(key, (H, RAYS, PC))

    def resample(k, lengths, w):
        def one(k, l, w):
            z = raymarch.importance_resample(l, w, PF, k, det=False,
                                             add_input_samples=True)
            return z.sum()
        return jax.vmap(one)(jax.random.split(k, H), lengths, w).sum() * 1e-9

    report("resample", resample, (lengths, w))

    field = fields.NerfField(FieldConfig(act_dtype="bfloat16"))
    tx = nerf_trainer.make_optimizer(NerfTrainConfig(warmup_steps=30))
    sts = []
    for h in range(H):
        st, _ = nerf_trainer.init_state(field, NerfTrainConfig(warmup_steps=30),
                                        jax.random.PRNGKey(h))
        sts.append(st)
    state = jax.tree.map(lambda *x: jnp.stack(x), *sts)

    def adam(k, state):
        def one(st):
            params = (st.params_coarse, st.params_fine)
            grads = jax.tree.map(lambda x: x * 1e-9, params)
            upd, new_opt = tx.update(grads, st.opt_state, params)
            pc, pf = jax.tree.map(lambda a, b: a + b, params, upd)
            return jax.tree.reduce(lambda a, b: a + b.sum(), (pc, pf), jnp.zeros(()))
        return jax.vmap(one)(state).sum() * 1e-9

    report("adam", adam, (state,))


if __name__ == "__main__":
    main()
