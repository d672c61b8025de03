"""How much of the fused NeRF step is the field MLP itself?

Times an isolated fwd+bwd of the field at EXACTLY the step's point load
(2 halves x 1200 rays x (64 coarse + 320 fine) pts, mode='color'), scanned
50x in one program — directly comparable to the measured ~60 ms/step of
the full train step.  The remainder is sampling/compositing/resample/
optimizer/bookkeeping.

Usage: [ACT_DTYPE=bfloat16] python experiments/mlp_share_probe.py
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

H, RAYS, PC, PF = 2, 1200, 64, 320
ITERS = 50

# NOTE: jax.block_until_ready is a NO-OP on the axon relay platform (measured:
# returns in ~4 ms while the device is still 100+ s from done).  The only real
# sync is a device->host fetch, so every timing below fetches the scalar
# result; per-iter cost comes from differencing two ITERS counts to cancel the
# fetch/dispatch constant.


def main():
    act = os.environ.get("ACT_DTYPE", "bfloat16")
    field = fields.NerfField(FieldConfig(act_dtype=act))
    params = [fields.init_field(field, jax.random.PRNGKey(h)) for h in range(H)]
    params = jax.tree.map(lambda *x: jnp.stack(x), *params)
    key = jax.random.PRNGKey(0)

    def one_eval(p, pts, dirs, k):
        def loss(p):
            dens, rgb = field.apply(p, pts, dirs, "color")
            return (dens.sum() + rgb.sum()) / pts.shape[0]

        return jax.value_and_grad(loss)(p)

    for name, n_pts in (("coarse+fine", PC + PF), ("coarse-only", PC)):
        pts = jax.random.normal(key, (H, RAYS, n_pts, 3)) * 0.5
        dirs = jax.random.normal(key, (H, RAYS, 3))

        @functools.partial(jax.jit, static_argnames="iters")
        def many(p, pts, dirs, k, iters):
            # params update each iteration -> the loop body cannot be
            # hoisted as loop-invariant by XLA
            def body(p, _):
                v, g = jax.vmap(one_eval, in_axes=(0, 0, 0, None))(p, pts, dirs, k)
                p = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
                return p, None

            p, _ = jax.lax.scan(body, p, None, length=iters)
            return jax.tree.reduce(lambda a, b: a + b.sum(), p, jnp.zeros(()))

        def timed(iters):
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                # fetch = the only real sync through the relay
                float(many(params, pts, dirs, key, iters))
                best = min(best, time.perf_counter() - t0)
            return best

        t_hi, t_lo = timed(ITERS), timed(ITERS // 5)
        per_iter = (t_hi - t_lo) / (ITERS - ITERS // 5)
        print(f"{name:12s} ({H}x{RAYS}x{n_pts} pts): {t_hi:6.2f} s / {ITERS} it, "
              f"{t_lo:6.2f} s / {ITERS // 5} it -> {1e3 * per_iter:6.1f} ms/iter")


if __name__ == "__main__":
    main()
