"""Neural radiance field with a SurfEmb feature head, in flax.

Re-design of the reference's ``NeuralRadianceFieldFeat`` (nerf.py:148-767)
and the missing ``dep/siren.py`` SIREN MLP (nerf.py:104,201-202):

* ``HarmonicEmbedding``: sin/cos embedding, 60 freqs, omega0 = 0.1
  (nerf.py:106-144) -> 360-dim for xyz.
* trunk: 2 x Linear(256) + Softplus(beta=10) (nerf.py:172-177).
* density head: Linear(256 -> 1) + Softplus(beta=10), bias -1.5, mapped
  to opacity via ``1 - exp(-raw)`` (nerf.py:206-228).
* color head: Linear(256+360 -> 256) + Softplus, Linear(256 -> 3), sigmoid,
  conditioned on the harmonic embedding of the normalized view direction
  (nerf.py:182-189, 230-268).
* feature head: SIREN(3 -> 256 x 2 -> 12) evaluated directly on xyz
  (nerf.py:191-202, 388-392), or a Softplus MLP on the harmonic embedding
  when ``siren=False``.

Unlike the reference there is no ray chunking (`batched_forward`,
nerf.py:458-521): on TPU the whole ray batch is one fused XLA computation;
memory tiling is handled by ``jax.lax.map`` in the callers when grids are
large (surface extraction).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig


def _ladder_len(n_harmonic: int) -> int:
    """Rungs per group for method='grouped': the largest L <= 6 dividing H
    (L=6 at the reference H=60 -> G=10 groups; tiny test fields fall back
    to whatever divides)."""
    for L in (6, 5, 4, 3, 2):
        if n_harmonic % L == 0:
            return L
    return 1


def harmonic_embedding(
    x: jnp.ndarray, n_harmonic: int = 60, omega0: float = 0.1, method: str = "direct"
) -> jnp.ndarray:
    """(..., D) -> (..., D * n_harmonic * 2), ordering [sin(d0*f...), sin(d1*f...), ..., cos...]

    matching nerf.py:135-144 (x[..., None] * freqs flattened over the last
    two dims, then sin block followed by cos block).

    method='recurrence' evaluates 2 transcendentals per input dim and gets
    the octave ladder from the double-angle identities (kept for study: on
    v5e the 59-step sequential chain is latency-bound and measured slower
    than one fused vectorized sin over the full 360-wide tensor).
    """
    if method == "direct":
        freqs = omega0 * (2.0 ** jnp.arange(n_harmonic, dtype=x.dtype))
        ang = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if method == "grouped":
        # Grouped double-angle ladder: transcendentals ONLY at G group-base
        # frequencies omega0*2^(g*L), then L-1 exact doublings per group
        # (sin 2a = 2 sin a cos a; cos 2a = 1 - 2 sin^2 a).  6x fewer
        # sin/cos than 'direct' — they are the VPU pole of the fused train
        # kernel (EXPERIMENTS.md round-4 decomposition: ~4 ms/step).
        # Numerics: ladder columns agree with 'direct' to ~64 ulp at low
        # frequencies (error doubles per rung, 2^(L-1) worst case — short
        # enough to skip renormalization); at high frequencies BOTH methods
        # are fp32-rounding pseudo-noise (the angle's ulp exceeds 2*pi past
        # ~2^24), just different noise — the reference's own torch sin
        # differs from XLA's there identically (nerf.py:107,135-144).
        # ops/field_kernel.py implements the SAME ladder so the kernels and
        # this path stay numerically consistent end-to-end.
        L = _ladder_len(n_harmonic)
        G = n_harmonic // L
        base = omega0 * (2.0 ** (L * jnp.arange(G, dtype=x.dtype)))
        a = x[..., None] * base                       # (..., D, G)
        s, c = jnp.sin(a), jnp.cos(a)
        sins, coss = [s], [c]
        for _ in range(L - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * (s * s)
            sins.append(s)
            coss.append(c)
        # stack rungs minor: (..., D, G, L) -> (..., D*H) with f = g*L + l,
        # the reference's d-major f-within ordering
        sin_blk = jnp.stack(sins, axis=-1).reshape(*x.shape[:-1], -1)
        cos_blk = jnp.stack(coss, axis=-1).reshape(*x.shape[:-1], -1)
        return jnp.concatenate([sin_blk, cos_blk], axis=-1)
    a = omega0 * x
    s, c = jnp.sin(a), jnp.cos(a)
    sins, coss = [s], [c]
    for _ in range(n_harmonic - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        # first-order renormalization of s^2+c^2 -> 1: without it rounding
        # drift compounds double-exponentially over the octave ladder
        inv = 1.5 - 0.5 * (s * s + c * c)
        s = s * inv
        c = c * inv
        sins.append(s)
        coss.append(c)
    sin_blk = jnp.stack(sins, axis=-1).reshape(*x.shape[:-1], -1)
    cos_blk = jnp.stack(coss, axis=-1).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([sin_blk, cos_blk], axis=-1)


def softplus_beta(x: jnp.ndarray, beta: float = 10.0) -> jnp.ndarray:
    """torch.nn.Softplus(beta): log(1 + exp(beta x)) / beta, overflow-safe."""
    return jax.nn.softplus(x * beta) / beta


def _sym_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SirenLayer(nn.Module):
    """One SIREN layer: sin(omega * (W x + b)) with the SIREN init scheme."""

    features: int
    omega: float = 30.0
    is_first: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        bound = (1.0 / in_dim) if self.is_first else (math.sqrt(6.0 / in_dim) / self.omega)
        h = nn.Dense(
            self.features, kernel_init=_sym_uniform(bound), bias_init=_sym_uniform(bound)
        )(x)
        return jnp.sin(self.omega * h)


class Siren(nn.Module):
    """SIREN MLP (in=3, hidden=256 x hidden_layers, out) — the missing
    ``dep/siren.py`` (nerf.py:201-202).  Final layer is linear."""

    hidden_features: int = 256
    hidden_layers: int = 2
    out_features: int = 12

    @nn.compact
    def __call__(self, x):
        h = SirenLayer(self.hidden_features, is_first=True)(x)
        for _ in range(self.hidden_layers):
            h = SirenLayer(self.hidden_features)(h)
        bound = math.sqrt(6.0 / self.hidden_features) / 30.0
        return nn.Dense(
            self.out_features, kernel_init=_sym_uniform(bound), bias_init=_sym_uniform(bound)
        )(h)


class DirSplitDense(nn.Module):
    """The color head's input layer: Dense over ``concat([h, d_emb])``
    evaluated as two matmuls, with the view-direction contribution
    computed once per ray and broadcast over the ray's samples.

    Owns the EXACT param tree of ``nn.Dense(features)`` on the concat
    (kernel ``(n_hidden + emb_dim, features)``, bias ``(features,)``) so
    existing checkpoints load unchanged; only the contraction order
    differs: ``concat([h, d]) @ W == h @ W[:nh] + d @ W[nh:]``.  The
    reference broadcasts the ray's direction embedding to every sample
    before the concat (nerf.py:236-246), which makes the direction part
    an ``(R*P, 360) @ (360, F)`` matmul — at P=384 samples/ray that is
    ~30% of the field's forward FLOPs recomputing a per-ray quantity
    P times.  Here the d-part is ``(R, 360) @ (360, F)``.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, d_emb):
        nh = h.shape[-1]
        in_dim = nh + d_emb.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        k = kernel.astype(self.dtype)
        hpart = h.astype(self.dtype) @ k[:nh]
        dpart = d_emb.astype(self.dtype) @ k[nh:] + bias.astype(self.dtype)
        # h may carry an extra per-ray-sample dim; broadcast the per-ray
        # direction contribution over it (nerf.py:236-246 semantics)
        while dpart.ndim < hpart.ndim:
            dpart = dpart[..., None, :]
        return hpart + dpart


class NerfField(nn.Module):
    """Radiance field; pure function of points (and view dirs for color)."""

    cfg: FieldConfig = FieldConfig()

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        self.trunk1 = nn.Dense(c.n_hidden, dtype=dt)
        self.trunk2 = nn.Dense(c.n_hidden, dtype=dt)
        # density head stays fp32: it is tiny and precision-sensitive
        self.density_layer = nn.Dense(1, bias_init=nn.initializers.constant(c.density_bias))
        # same param tree as nn.Dense on the 616-wide concat, but the
        # per-ray direction contribution is computed once per ray
        self.color1 = DirSplitDense(c.n_hidden, dtype=dt)
        self.color2 = nn.Dense(3, dtype=dt)
        if c.siren:
            self.feature_layer = Siren(c.n_hidden, 2, c.feature_dim)
        else:
            self.feat1 = nn.Dense(c.n_hidden, dtype=dt)
            self.feat2 = nn.Dense(c.feature_dim, dtype=dt)

    def _act(self, x):
        """Nonlinearity in fp32, stored in cfg.act_dtype (the tensors kept
        for backprop are the HBM cost at ~1M point-evals per step)."""
        y = softplus_beta(x.astype(jnp.float32), self.cfg.softplus_beta)
        return y.astype(jnp.dtype(self.cfg.act_dtype))

    def embed(self, pts):
        e = harmonic_embedding(pts, self.cfg.n_harmonic_functions, self.cfg.omega0,
                               method=self.cfg.embed_method)
        return e.astype(jnp.dtype(self.cfg.act_dtype))

    def trunk(self, embeds):
        # matmuls in bf16, nonlinearity in fp32, storage in act_dtype
        h = self._act(self.trunk1(embeds))
        return self._act(self.trunk2(h))

    def density_from_trunk(self, h):
        # density head + opacity map stay fp32 (tiny, precision-sensitive)
        raw = softplus_beta(self.density_layer(h.astype(jnp.float32)), self.cfg.softplus_beta)
        return 1.0 - jnp.exp(-raw)

    def density(self, pts):
        """Opacity in [0, 1) per point (nerf.py:220-228)."""
        return self.density_from_trunk(self.trunk(self.embed(pts)))

    def color(self, pts, view_dirs):
        """RGB per point, conditioned on view direction (nerf.py:230-268).

        ``view_dirs``: (..., 3) broadcastable against pts' leading dims.
        """
        embeds = self.embed(pts)
        h = self.trunk(embeds)
        d = view_dirs / jnp.maximum(jnp.linalg.norm(view_dirs, axis=-1, keepdims=True), 1e-12)
        d_emb = self.embed(d)
        # view dirs are per-ray; points may have an extra per-ray-point dim —
        # DirSplitDense broadcasts the per-ray contribution over it
        x = self._act(self.color1(h, d_emb))
        return jax.nn.sigmoid(self.color2(x).astype(jnp.float32))

    def features(self, pts):
        """12-d descriptor keys per point (nerf.py:314-339, 404-415)."""
        if self.cfg.siren:
            return self.feature_layer(pts)
        h = softplus_beta(self.feat1(self.embed(pts)).astype(jnp.float32), self.cfg.softplus_beta)
        return jax.nn.sigmoid(self.feat2(h).astype(jnp.float32))

    def __call__(self, pts, view_dirs=None, mode: str = "color"):
        """Densities (..., 1) and per-point channels.

        mode 'color' -> rgb, 'feature' -> 12-d keys, 'both' -> 15-d concat
        (nerf.py:388-398).
        """
        embeds = self.embed(pts)
        h = self.trunk(embeds)
        dens = self.density_from_trunk(h)
        if mode == "feature":
            feats = self.features(pts)
        elif mode == "color":
            feats = self.color(pts, view_dirs)
        else:
            feats = jnp.concatenate([self.color(pts, view_dirs), self.features(pts)], axis=-1)
        return dens, feats

    def density_and_features(self, pts):
        """Density + feature head without view dirs (forwardWithPoints,
        nerf.py:750-767)."""
        h = self.trunk(self.embed(pts))
        return self.density_from_trunk(h), self.features(pts)

    def custom_forward(self, pts):
        """``batched_customForward`` semantics (nerf.py:404-457): feature
        head output with a zero opacity channel appended."""
        f = self.features(pts)
        return jnp.concatenate([f, jnp.zeros_like(f[..., :1])], axis=-1)


import functools as _functools


@_functools.lru_cache(maxsize=16)
def _init_fn(field: NerfField):
    # cached per field: a fresh jax.jit object per call would re-trace on
    # every invocation (seconds of host time on a 1-CPU box)
    pts = jnp.zeros((1, 1, 3))
    dirs = jnp.zeros((1, 3))
    return jax.jit(lambda k: field.init(k, pts, dirs, "both"))


@_functools.lru_cache(maxsize=16)
def _features_fn(field: NerfField):
    return jax.jit(lambda p, pts: field.apply(p, pts, method=field.features))


def eval_features(field: NerfField, params, pts):
    """Feature-head keys for points — ONE cached compiled program (an
    eager ``field.apply`` dispatches every SIREN layer op separately
    through the relay at ~40-90 ms each)."""
    return _features_fn(field)(params, pts)


def init_field(field: NerfField, key: jax.Array):
    """Initialize ALL heads (mode='both' touches color+feature layers).

    jitted: eager flax init dispatches one relay round-trip per layer op
    (~40-90 ms each); one compiled program hits the persistent cache."""
    return _init_fn(field)(key)


# Explicit module partition for freeze_spec: every top-level NerfField
# module must appear in exactly one of these sets, so a renamed/added layer
# fails loudly instead of silently training or freezing the wrong head.
FEATURE_HEAD_MODULES = frozenset({"feature_layer", "feat1", "feat2"})
NON_FEATURE_MODULES = frozenset({"trunk1", "trunk2", "density_layer", "color1", "color2"})


def freeze_spec(train_feature_head: bool):
    """optax.multi_transform-style label tree selector.

    NeRF training freezes the feature head (trainNerfFine.py:174-186);
    descriptor training trains only the feature head (trainPose.py:160-165).

    Membership is decided by the explicit module sets above — an unknown
    top-level module name raises instead of guessing by prefix.
    """

    def label_fn(params):
        def walk(path, leaf):
            top = str(path[0]) if path else ""
            if top in FEATURE_HEAD_MODULES:
                is_feat = True
            elif top in NON_FEATURE_MODULES:
                is_feat = False
            else:
                raise ValueError(
                    f"freeze_spec: unknown NerfField module {top!r} — update "
                    "FEATURE_HEAD_MODULES/NON_FEATURE_MODULES in models/fields.py "
                    "when renaming or adding field layers"
                )
            if train_feature_head:
                return "train" if is_feat else "freeze"
            return "freeze" if is_feat else "train"

        import flax

        flat = flax.traverse_util.flatten_dict(params)
        labels = {k: walk(k, v) for k, v in flat.items()}
        return flax.traverse_util.unflatten_dict(labels)

    return label_fn
