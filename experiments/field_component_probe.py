"""Decompose the isolated field-MLP cost (mlp_share_probe: 41.5 ms/iter at
2x1200x384 pts) into embedding / matmul / activation shares.

Variants timed at the exact step point-load, fwd+bwd wrt params (pts carry
no grad in the real step — lengths are stop_gradient'd):

  full        — the production NerfField 'color' eval (reference parity)
  relu        — same but softplus_beta -> relu (isolates fp32 softplus cost)
  no-embed    — MLP fed a precomputed embedding (isolates sin/cos cost)
  matmul-only — bf16 dense chain alone, relu, no embed, no density/sigmoid

Timing: fetch-synced (block_until_ready is a no-op on the axon relay) with
two iteration counts differenced to cancel the dispatch/fetch constant.

Usage: python experiments/field_component_probe.py
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

H, RAYS, PTS = 2, 1200, 384
ITERS = 40


def timed_scan(loss_of_params, params, iters, extras=()):
    # extras are passed as ARGUMENTS (a closed-over jnp array would be baked
    # into the compile payload as a constant — the relay 413s past ~100 MB)
    @functools.partial(jax.jit, static_argnames="n")
    def many(p, extras, n):
        def body(p, _):
            g = jax.grad(loss_of_params)(p, *extras)
            return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), None

        p, _ = jax.lax.scan(body, p, None, length=n)
        return jax.tree.reduce(lambda a, b: a + b.sum(), p, jnp.zeros(()))

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(params, extras, iters))  # fetch = the only real sync on axon
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, loss_of_params, params, extras=()):
    hi = timed_scan(loss_of_params, params, ITERS, extras)
    lo = timed_scan(loss_of_params, params, ITERS // 5, extras)
    per = (hi - lo) / (ITERS - ITERS // 5)
    print(f"{name:12s}: {hi:6.2f}s/{ITERS} it, {lo:6.2f}s/{ITERS // 5} it "
          f"-> {1e3 * per:6.1f} ms/iter")
    return per


def main():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (H, RAYS, PTS, 3)) * 0.5
    dirs = jax.random.normal(key, (H, RAYS, 3))

    def make_field(act_fn_patch=None):
        f = fields.NerfField(FieldConfig(act_dtype="bfloat16"))
        return f

    field = make_field()
    params = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[fields.init_field(field, jax.random.PRNGKey(h)) for h in range(H)],
    )

    # 1. full production eval (= mlp_share_probe baseline)
    def loss_full(p):
        def one(p, pts, dirs):
            dens, rgb = field.apply(p, pts, dirs, "color")
            return dens.sum() + rgb.sum()

        return jax.vmap(one)(p, pts, dirs).sum() / (H * RAYS * PTS)

    if os.environ.get("SKIP_FULL") != "1":
        report("full", loss_full, params)

    # 2. softplus -> relu (same shapes/dtypes, cheap activation)
    orig_softplus = fields.softplus_beta
    fields.softplus_beta = lambda x, beta=10.0: jax.nn.relu(x)
    try:
        report("relu", loss_full, params)
    finally:
        fields.softplus_beta = orig_softplus

    # 3. embedding precomputed outside the loop (isolates sin/cos)
    emb_pts = fields.harmonic_embedding(pts, 60, 0.1).astype(jnp.bfloat16)
    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    emb_dir = fields.harmonic_embedding(d, 60, 0.1).astype(jnp.bfloat16)

    def mlp_from_embed(p, e_pts, e_dir):
        """Replays NerfField.color/density from precomputed embeddings using
        the same param tree (bf16 matmuls, fp32 softplus/heads)."""
        pr = p["params"]

        def dense(name, x):
            w = pr[name]["kernel"].astype(jnp.bfloat16)
            b = pr[name]["bias"].astype(jnp.bfloat16)
            return x @ w + b

        act = lambda x: fields.softplus_beta(x.astype(jnp.float32), 10.0).astype(jnp.bfloat16)
        h = act(dense("trunk1", e_pts))
        h = act(dense("trunk2", h))
        raw = fields.softplus_beta(
            h.astype(jnp.float32) @ pr["density_layer"]["kernel"]
            + pr["density_layer"]["bias"], 10.0)
        dens = 1.0 - jnp.exp(-raw)
        de = jnp.broadcast_to(e_dir[:, None, :], h.shape[:-1] + e_dir.shape[-1:])
        x = jnp.concatenate([h, de], axis=-1)
        x = act(dense("color1", x))
        rgb = jax.nn.sigmoid(dense("color2", x).astype(jnp.float32))
        return dens.sum() + rgb.sum()

    def loss_no_embed(p, emb_pts, emb_dir):
        return jax.vmap(mlp_from_embed)(p, emb_pts, emb_dir).sum() / (H * RAYS * PTS)

    report("no-embed", loss_no_embed, params, (emb_pts, emb_dir))

    # 4. pure bf16 matmul chain (relu, no density/sigmoid heads)
    def matmuls_only(p, e_pts, e_dir):
        pr = p["params"]

        def dense(name, x):
            return x @ pr[name]["kernel"].astype(jnp.bfloat16)

        h = jax.nn.relu(dense("trunk1", e_pts))
        h = jax.nn.relu(dense("trunk2", h))
        de = jnp.broadcast_to(e_dir[:, None, :], h.shape[:-1] + e_dir.shape[-1:])
        x = jax.nn.relu(dense("color1", jnp.concatenate([h, de], axis=-1)))
        return dense("color2", x).astype(jnp.float32).sum()

    def loss_matmul(p, emb_pts, emb_dir):
        return jax.vmap(matmuls_only)(p, emb_pts, emb_dir).sum() / (H * RAYS * PTS)

    report("matmul-only", loss_matmul, params, (emb_pts, emb_dir))


if __name__ == "__main__":
    main()
