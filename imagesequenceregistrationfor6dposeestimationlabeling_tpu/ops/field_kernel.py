"""Fused Pallas TPU kernel for the NeRF field's color-mode fwd+bwd.

The field MLP is ~70% of the fused NeRF train step (EXPERIMENTS.md
"field MLP share"); at the step's point load XLA spends ~37 ms/iter of
which ~15 ms is the harmonic embedding's sin/cos and several ms are HBM
round-trips for the wide intermediates (the (N, 360) embedding alone is
~0.7 GB/step).  This kernel evaluates embed -> trunk -> density head ->
color head in ONE pass per ray tile with every intermediate in VMEM:

* the harmonic embedding (nerf.py:106-144) never touches HBM — angles
  come from exact elementwise broadcasts (see _angles) and sin/cos feed
  the trunk matmuls directly from registers,
* the trunk/color matmuls (nerf.py:172-189) run in bf16 on the MXU with
  fp32 accumulation; the ``concat([sin, cos]) @ W`` contraction is split
  into two matmuls so no lane-dim concat is ever materialized,
* the view-direction contribution of the color head is computed ONCE
  PER RAY and broadcast over the ray's samples (see
  models/fields.py:DirSplitDense — same algebra, (R, 180) instead of
  (R*P, 360)),
* the backward pass is a second Pallas kernel over the same tiles that
  accumulates all parameter gradients across the sequential grid in fp32
  VMEM scratch-outputs; softplus'/sigmoid' are recovered from the STORED
  post-activations (softplus_beta(x) = h  =>  sigmoid(beta*x) =
  1 - exp(-beta*h)), so no pre-activations are stored,
* points and view directions carry NO gradient (ray lengths are
  stop_gradient'd in the train step, trainNerfFine.py:294-296 detach
  semantics) — the custom VJP returns zeros for them and the wrapper
  stop_gradients both inputs so the zeros are never consumed.

Residuals stored for backward (all bf16): the sin/cos embedding blocks
plus the three hidden post-activations h1/h2/c1.  (A recompute-backward
variant that rebuilt h1/h2/c1 from es/ec measured strictly WORSE on v5e
— 23.5 vs 21.0 ms for the pair, EXPERIMENTS.md round 4 — and was removed
in round 5; this split pair is now only the multi-chunk/remat fallback
behind the fused bundle-loss kernel below.)

KNOWN FAULT (round-4 bisection, EXPERIMENTS.md "Fused-kernel libtpu
fault"): this split fwd/bwd pair inside a >=10-step scan with a
>=~300 MB view bank resident crashes the TPU worker (libtpu/Mosaic
allocation-layout interaction; numerics at small banks are exact).  The
fused bundle-loss kernel does NOT fault at any bank size.  Mitigation:
train/nerf_trainer._kernel_safe_field falls back to the flax field path
when a multi-chunk step would run this pair against a large bank.

Numerics match ``NerfField.apply(..., mode='color')`` with
``compute_dtype=bfloat16`` to bf16 tolerance; gradients are emitted in
fp32 (slightly MORE precise than the flax path, whose grads pass through
a bf16 cast).  Parity + gradient tests: tests/test_field_kernel.py.

The fastest path supersedes the split fwd/bwd pair entirely:
``bundle_loss_grads`` (bottom of this module) fuses field fwd + EA
composite + huber loss + the full backward into ONE launch per bundle —
the kernel's only outputs are the 13 parameter grads, a loss accumulator
and (for the coarse bundle) the EA weights the importance sampler needs.
The (N, 360) embeddings and (N, 256) hiddens never exist off-chip at all
(HLO temp memory for the train step: 2173 MB split -> 201 MB fused;
step 42.8 -> 30.7 ms/step in the same relay window).  Wired into
train/nerf_trainer.py for single-chunk steps; FUSED_LOSS_KERNEL=0
restores the split kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# target points per grid step (R_tile = _TILE_PTS // P); env override for
# tile-size experiments (experiments/field_kernel_probe.py sweep)
_TILE_PTS = int(_os.environ.get("FIELD_KERNEL_TILE", "1024"))
_TILE_ENV = "FIELD_KERNEL_TILE" in _os.environ


def _tile_pts(P: int) -> int:
    """Per-pass tile target: the loss-kernel sweep (EXPERIMENTS.md) measured
    the fine pass (P=320) faster at 2048 (13.57 vs 13.96 ms) but the coarse
    pass (P=64) faster at 1024 (2.81 vs 3.03) — deep rays amortize the
    per-tile weight DMA over more work, shallow rays just pay more VMEM
    pressure.  An explicit FIELD_KERNEL_TILE overrides both (sweeps)."""
    if _TILE_ENV:
        return _TILE_PTS
    return 2048 if P >= 256 else _TILE_PTS

# Mosaic's scoped-VMEM budget: the compiler default (~16 MiB) is what
# capped the tile sweep at 1024 (2048 needs 24.25 MiB, EXPERIMENTS.md) —
# v5e has 128 MiB of VMEM, so raise the cap and leave headroom for
# double-buffered block DMA.  Env override for sweeps.
_VMEM_LIMIT = int(_os.environ.get("FIELD_KERNEL_VMEM_MB", "96")) * 2**20


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM_LIMIT,
    )


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def enabled(cfg) -> bool:
    """Use the fused kernel for training?

    Auto (``fused_kernel=None``): only on a real TPU AND only when the
    field is configured for the kernel's numerics — bf16 matmuls and bf16
    activation storage are hardcoded in the kernel, so auto-enabling it
    for an fp32-configured field would silently override the
    compute_dtype/act_dtype knobs.  ``fused_kernel=True`` forces it
    regardless (the caller owns the precision trade)."""
    flag = getattr(cfg, "fused_kernel", None)
    if flag is None:
        return (
            jax.default_backend() == "tpu"
            and getattr(cfg, "compute_dtype", None) == "bfloat16"
            and getattr(cfg, "act_dtype", None) == "bfloat16"
        )
    return bool(flag)


def _freq_matrix(n_harmonic: int, omega0: float) -> np.ndarray:
    """(3, 3*n_harmonic) f32 with F[d, d*n+f] = omega0 * 2^f — so
    ``pts @ F`` reproduces nerf.py:135-144's d-major angle layout."""
    freqs = omega0 * (2.0 ** np.arange(n_harmonic, dtype=np.float32))
    F = np.zeros((3, 3 * n_harmonic), np.float32)
    for d in range(3):
        F[d, d * n_harmonic : (d + 1) * n_harmonic] = freqs
    return F


def _angles(x, fm):
    """(N, 3) x (3, 3H) -> (N, 3H) harmonic angles, EXACTLY.

    fm has exactly one nonzero per column, so this is an elementwise
    broadcast-multiply-add in full f32.  A jnp.dot here would go through
    the MXU at default precision (bf16-level, measured rel err 4.7e-3) —
    at freq 0.1*2^59 that is an absolute angle error of ~1e14 and the
    high-frequency sin/cos become unrelated to the flax path's.
    """
    return (x[:, 0:1] * fm[0:1, :] + x[:, 1:2] * fm[1:2, :]
            + x[:, 2:3] * fm[2:3, :])


# -------------------------------------- grouped double-angle embedding
# FieldConfig.embed_method="grouped": sin/cos only at G = H/L group-base
# frequencies, then L-1 double-angle rungs per group — the transcendentals
# are the kernel's VPU pole (~4 ms/step of the 16.8 ms pair,
# EXPERIMENTS.md round-4 decomposition).  The kernel emits rungs
# RUNG-MAJOR (column l*3G + d*G + g) and the wrappers permute the
# trunk/color weight ROWS to match (a matmul is invariant under a joint
# column/row permutation) — no in-kernel relayout.  Numerically identical
# to models/fields.py harmonic_embedding(method="grouped") up to
# transcendental-implementation ulps amplified <= 2^(L-1) (~1e-4, inside
# the kernel's bf16 tolerance).


def _ladder_of(cfg) -> int:
    """Static rung count for a field config: 0 = direct embedding."""
    if getattr(cfg, "embed_method", "direct") != "grouped":
        return 0
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields

    return fields._ladder_len(int(cfg.n_harmonic_functions))


def _freq_matrix_g(n_harmonic: int, omega0: float, ladder: int) -> np.ndarray:
    """(3, 3G) base-frequency matrix, F[d, d*G+g] = omega0 * 2^(g*ladder) —
    the same exact power-of-two products as _freq_matrix's columns
    f = g*ladder."""
    G = n_harmonic // ladder
    freqs = omega0 * (2.0 ** (ladder * np.arange(G, dtype=np.float32)))
    F = np.zeros((3, 3 * G), np.float32)
    for d in range(3):
        F[d, d * G : (d + 1) * G] = freqs
    return F


def _ladder_perm(n_harmonic: int, ladder: int) -> np.ndarray:
    """Row permutation mapping the kernel's rung-major embedding layout to
    the flax d-major f-within weight rows: perm[l*3G + d*G + g] =
    d*H + g*L + l, applied to each 3H-row half (sin / cos) separately."""
    G = n_harmonic // ladder
    perm = np.empty(3 * n_harmonic, np.int64)
    for l in range(ladder):
        for d in range(3):
            for g in range(G):
                perm[l * 3 * G + d * G + g] = d * n_harmonic + g * ladder + l
    return perm


def _embed(x, fm, ladder: int):
    """(sin, cos) embedding blocks (N, 3H) f32 for points (N, 3).

    ladder=0: direct (fm = full (3, 3H) frequency matrix, flax layout).
    ladder=L: grouped ladder (fm = (3, 3G) base matrix, rung-major
    output; drift <= 2^(L-1) ulp per rung chain — short enough to skip
    renormalization)."""
    ang = _angles(x, fm)
    s, c = _sincos(ang)
    if ladder <= 1:
        return s, c
    sins, coss = [s], [c]
    for _ in range(ladder - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * (s * s)
        sins.append(s)
        coss.append(c)
    return jnp.concatenate(sins, -1), jnp.concatenate(coss, -1)


# ---- probe-only knobs (experiments/kernel_decomp_probe.py): replace the
# transcendentals with cheap stand-ins of the same shape/dtype to measure
# their share of the kernel's runtime.  NOT valid numerics — never set in
# production; both default off and the test suite runs with them unset.
_PROBE_SINCOS = _os.environ.get("FIELD_KERNEL_PROBE_SINCOS", "exact")
_PROBE_SOFTPLUS = _os.environ.get("FIELD_KERNEL_PROBE_SOFTPLUS", "exact")


def _sincos(ang):
    if _PROBE_SINCOS == "poly":  # probe-only: 2 mults + trunc, no sin/cos
        t = ang - jnp.round(ang * (1.0 / (2.0 * np.pi))) * (2.0 * np.pi)
        return t * (1.0 - 0.1 * t * t), 1.0 - 0.4 * t * t
    return jnp.sin(ang), jnp.cos(ang)


def _softplus_b(x, beta):
    if _PROBE_SOFTPLUS == "relu":  # probe-only: no exp/log1p
        return jnp.maximum(x, 0.0)
    # explicit stable softplus: jax.nn.softplus carries a custom_jvp
    # (logaddexp) whose closed_call trips jax 0.9.0's cached MLIR
    # lowering when the kernel body is vmapped
    y = x * beta
    return (jnp.maximum(y, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(y)))) / beta


def _sig_from_act(h, beta):
    """sigmoid(beta*x) recovered from h = softplus_beta(x)."""
    return 1.0 - jnp.exp(-beta * h)


# ------------------------------------------------------------- forward


def _fwd_kernel(pts_ref, dirs_ref, fmat_ref, w1s_ref, w1c_ref, b1_ref,
                w2_ref, b2_ref, wd_ref, bd_ref, wc1h_ref, wc1ds_ref,
                wc1dc_ref, bc1_ref, wc2_ref, bc2_ref,
                dens_ref, rgb_ref, h1_ref, h2_ref, c1_ref, es_ref, ec_ref,
                *, beta, ladder=0):
    Rt, P, _ = pts_ref.shape
    N = Rt * P
    bf = jnp.bfloat16
    f32 = jnp.float32

    x = pts_ref[:].reshape(N, 3)
    _s, _c = _embed(x, fmat_ref[:], ladder)                         # (N, 3H)
    es = _s.astype(bf)
    ec = _c.astype(bf)
    es_ref[:] = es.reshape(Rt, P, -1)
    ec_ref[:] = ec.reshape(Rt, P, -1)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    h1 = _softplus_b(mm(es, w1s_ref[:].astype(bf)) + mm(ec, w1c_ref[:].astype(bf))
                     + b1_ref[:], beta)
    h1b = h1.astype(bf)
    h1_ref[:] = h1b.reshape(Rt, P, -1)

    h2 = _softplus_b(mm(h1b, w2_ref[:].astype(bf)) + b2_ref[:], beta)
    h2b = h2.astype(bf)
    h2_ref[:] = h2b.reshape(Rt, P, -1)

    # density head stays fp32 (models/fields.py density_from_trunk)
    raw = _softplus_b(jnp.dot(h2, wd_ref[:], preferred_element_type=f32)
                      + bd_ref[:], beta)
    dens_ref[:] = (1.0 - jnp.exp(-raw)).reshape(Rt, P, 1)

    # per-ray view-direction contribution (DirSplitDense algebra);
    # dirs arrive PRE-NORMALIZED: the normalization must happen in XLA
    # with the exact flax expression — an ulp-level divide difference
    # (Mosaic's reciprocal-based divide) is amplified by the top
    # harmonic frequency (0.1*2^59) into a completely different phase
    _ds, _dc = _embed(dirs_ref[:].reshape(Rt, 3), fmat_ref[:], ladder)
    dsb = _ds.astype(bf)
    dcb = _dc.astype(bf)
    dpart = (mm(dsb, wc1ds_ref[:].astype(bf)) + mm(dcb, wc1dc_ref[:].astype(bf))
             + bc1_ref[:])                                          # (Rt, C)
    c1 = _softplus_b(mm(h2b, wc1h_ref[:].astype(bf)).reshape(Rt, P, -1)
                     + dpart[:, None, :], beta)                     # (Rt, P, C)
    c1b = c1.astype(bf)
    c1_ref[:] = c1b
    rgb = jax.nn.sigmoid(mm(c1b.reshape(N, -1), wc2_ref[:].astype(bf))
                         + bc2_ref[:])
    rgb_ref[:] = rgb.reshape(Rt, P, 3)


# ------------------------------------------------- density-only forward


def _dens_kernel(pts_ref, fmat_ref, w1s_ref, w1c_ref, b1_ref, w2_ref,
                 b2_ref, wd_ref, bd_ref, dens_ref, *, beta, ladder=0):
    """embed -> trunk -> density head for a flat tile of points.

    The inference-time density evaluator: no residuals, no color head —
    the only HBM traffic is the (T, 3) points in and (T, 1) densities
    out.  Serves the fwd-only hot paths (correspondence precompute's
    front/back passes, the 128^3 surface grid, MC surface-hit sampling:
    generateCors.py:300-332, nerf.py:640-703, trainPose.py:319-334)."""
    bf = jnp.bfloat16
    f32 = jnp.float32

    _s, _c = _embed(pts_ref[:], fmat_ref[:], ladder)
    es = _s.astype(bf)
    ec = _c.astype(bf)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    h1 = _softplus_b(mm(es, w1s_ref[:].astype(bf)) + mm(ec, w1c_ref[:].astype(bf))
                     + b1_ref[:], beta)
    h2 = _softplus_b(mm(h1.astype(bf), w2_ref[:].astype(bf)) + b2_ref[:], beta)
    raw = _softplus_b(jnp.dot(h2, wd_ref[:], preferred_element_type=f32)
                      + bd_ref[:], beta)
    dens_ref[:] = 1.0 - jnp.exp(-raw)


@functools.lru_cache(maxsize=None)
def _make_dens_op(beta: float, n_harmonic: int, omega0: float, interpret: bool,
                  ladder: int = 0):
    fmat = (_freq_matrix_g(n_harmonic, omega0, ladder) if ladder
            else _freq_matrix(n_harmonic, omega0))
    tile = int(_os.environ.get("FIELD_DENSITY_TILE", "4096"))

    def run(weights, flat_pts):
        w1s, w1c, b1, w2, b2, wd, bd = weights
        n = flat_pts.shape[0]
        t = min(tile, max(n, 8))
        pad = (-n) % t
        if pad:
            flat_pts = jnp.pad(flat_pts, ((0, pad), (0, 0)))
        full = lambda i: (0, 0)
        dens = pl.pallas_call(
            functools.partial(_dens_kernel, beta=beta, ladder=ladder),
            grid=((n + pad) // t,),
            in_specs=[
                pl.BlockSpec((t, 3), lambda i: (i, 0)),
                pl.BlockSpec(fmat.shape, full),
                pl.BlockSpec(w1s.shape, full), pl.BlockSpec(w1c.shape, full),
                pl.BlockSpec(b1.shape, full),
                pl.BlockSpec(w2.shape, full), pl.BlockSpec(b2.shape, full),
                pl.BlockSpec(wd.shape, full), pl.BlockSpec(bd.shape, full),
            ],
            out_specs=pl.BlockSpec((t, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n + pad, 1), jnp.float32),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(flat_pts, jnp.asarray(fmat), w1s, w1c, b1, w2, b2, wd, bd)
        return dens[:n]

    return run


def field_density(params, pts, cfg, interpret: bool | None = None):
    """Fused-kernel equivalent of ``field.apply(params, pts,
    method=field.density)``: densities (..., 1) fp32 for points of any
    leading shape.  Forward-only (the callers never differentiate through
    density-grid/correspondence evals) — differentiating through it
    raises, by design."""
    pr = params["params"]
    H = cfg.n_harmonic_functions
    ladder = _ladder_of(cfg)
    w1 = pr["trunk1"]["kernel"]
    w1s, w1c = w1[: 3 * H], w1[3 * H :]
    if ladder:
        perm = _ladder_perm(H, ladder)
        w1s, w1c = w1s[perm], w1c[perm]
    weights = (
        w1s, w1c, pr["trunk1"]["bias"][None, :],
        pr["trunk2"]["kernel"], pr["trunk2"]["bias"][None, :],
        pr["density_layer"]["kernel"], pr["density_layer"]["bias"][None, :],
    )
    if interpret is None:
        interpret = _interpret_default()
    run = _make_dens_op(float(cfg.softplus_beta), int(H), float(cfg.omega0),
                        bool(interpret), ladder)
    lead = pts.shape[:-1]
    flat = jax.lax.stop_gradient(pts).reshape(-1, 3)
    return run(weights, flat).reshape(*lead, 1)


def density_eval_fn(field, params, interpret: bool | None = None):
    """``pts -> densities (..., 1)``, fused on TPU when the field is
    configured for the kernel (see ``enabled``), flax otherwise.

    NOTE: the fused path is a Pallas custom call — XLA's auto-SPMD cannot
    partition it, so callers running under sharding constraints on a
    >1-device mesh must pass the flax path (or shard_map it themselves,
    as make_train_step does for the color kernel)."""
    cfg = getattr(field, "cfg", None)  # analytic test fields carry no cfg
    if cfg is None or not enabled(cfg):
        return lambda pts: field.apply(params, pts, method=field.density)
    return lambda pts: field_density(params, pts, cfg, interpret)


# ------------------------------------------------------------ backward


def _du_from_dens(dens, gdens, beta):
    """Chain rule dens -> density-head pre-activation u, from the STORED
    post-values: dens = 1 - exp(-softplus_b(u))  =>
    d dens/du = (1-dens) * sigmoid(beta*u) = (1-dens)*(1-(1-dens)^beta)."""
    one_m = 1.0 - dens
    return gdens * one_m * (1.0 - jnp.exp(beta * jnp.log1p(-dens)))


def _grad_math(Rt, P, dirs_flat, fmat, w2_ref, wd_ref, wc1h_ref, wc2_ref,
               h1b, h2b, c1b, es, ec, rgb, du, grgb,
               dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref,
               dbd_ref, dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref,
               dwc2_ref, dbc2_ref, beta, ladder=0):
    """Shared per-tile gradient accumulation.

    Values (h1b/h2b/c1b/es/ec bf16 (N, ·); rgb/du/grgb f32) are
    tile-local; ``du`` is the cotangent already pulled back to the density
    head's pre-activation (see _du_from_dens / the fused loss kernel's
    in-register composite backward).  The 13 grad refs are fp32 VMEM
    scratch-outputs accumulated across the sequential grid."""
    bf = jnp.bfloat16
    f32 = jnp.float32

    def c_pt(a, b):  # contract over the point axis: (N,A),(N,B)->(A,B)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def c_feat(a, b):  # (N,A),(B,A)->(N,B): a @ b^T without materializing
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # color output layer
    dc2p = grgb * rgb * (1.0 - rgb)                                # (N, 3) f32
    dc2pb = dc2p.astype(bf)
    dwc2_ref[:] += c_pt(c1b, dc2pb)
    dbc2_ref[:] += jnp.sum(dc2p, 0, keepdims=True)
    dc1 = c_feat(dc2pb, wc2_ref[:].astype(bf))                     # (N, C)
    dc1p = dc1 * _sig_from_act(c1b.astype(f32), beta)
    dc1pb = dc1p.astype(bf)
    dwc1h_ref[:] += c_pt(h2b, dc1pb)
    dbc1_ref[:] += jnp.sum(dc1p, 0, keepdims=True)

    # per-ray direction-part gradients (recompute the tiny dir embedding)
    ddpart = jnp.sum(dc1p.reshape(Rt, P, -1), 1)                   # (Rt, C)
    _ds, _dc = _embed(dirs_flat, fmat, ladder)           # pre-normalized
    dwc1ds_ref[:] += c_pt(_ds.astype(bf), ddpart.astype(bf))
    dwc1dc_ref[:] += c_pt(_dc.astype(bf), ddpart.astype(bf))

    dh2 = c_feat(dc1pb, wc1h_ref[:].astype(bf))                    # (N, C)

    # density head (fp32); du (N, 1) is the pre-activation cotangent
    dwd_ref[:] += c_pt(h2b.astype(f32), du)
    dbd_ref[:] += jnp.sum(du, 0, keepdims=True)
    dh2 = dh2 + jax.lax.dot_general(du, wd_ref[:], (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)

    # trunk
    dh2p = dh2 * _sig_from_act(h2b.astype(f32), beta)
    dh2pb = dh2p.astype(bf)
    dw2_ref[:] += c_pt(h1b, dh2pb)
    db2_ref[:] += jnp.sum(dh2p, 0, keepdims=True)
    dh1 = c_feat(dh2pb, w2_ref[:].astype(bf))                      # @ W2^T
    dh1p = dh1 * _sig_from_act(h1b.astype(f32), beta)
    dh1pb = dh1p.astype(bf)
    dw1s_ref[:] += c_pt(es, dh1pb)
    dw1c_ref[:] += c_pt(ec, dh1pb)
    db1_ref[:] += jnp.sum(dh1p, 0, keepdims=True)


def _bwd_kernel(pts_ref, dirs_ref, fmat_ref, w2_ref, wd_ref, wc1h_ref,
                wc2_ref, h1_ref, h2_ref, c1_ref, es_ref, ec_ref,
                dens_ref, rgb_ref, gdens_ref, grgb_ref,
                dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref,
                dbd_ref, dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref,
                dwc2_ref, dbc2_ref,
                *, beta, ladder=0):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for r in (dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref,
                  dbd_ref, dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref,
                  dwc2_ref, dbc2_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    Rt, P, _ = pts_ref.shape
    N = Rt * P
    du = _du_from_dens(dens_ref[:].reshape(N, 1), gdens_ref[:].reshape(N, 1),
                       beta)
    _grad_math(
        Rt, P, dirs_ref[:].reshape(Rt, 3), fmat_ref[:],
        w2_ref, wd_ref, wc1h_ref, wc2_ref,
        h1_ref[:].reshape(N, -1), h2_ref[:].reshape(N, -1),
        c1_ref[:].reshape(N, -1), es_ref[:].reshape(N, -1),
        ec_ref[:].reshape(N, -1),
        rgb_ref[:].reshape(N, 3), du, grgb_ref[:].reshape(N, 3),
        dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref, dbd_ref,
        dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref, dwc2_ref, dbc2_ref,
        beta, ladder=ladder)


# ------------------------------------------------------------- wrapper


@functools.lru_cache(maxsize=None)
def _make_op(beta: float, n_harmonic: int, omega0: float, interpret: bool,
             ladder: int = 0):
    """Builds the custom-VJP'd op (weights..., pts, dirs) -> (dens, rgb).

    weights: w1s, w1c (3H, C) f32; b1, b2, bc1 (1, C) f32; w2, wc1h (C, C);
    wd (C, 1); bd (1, 1); wc1ds, wc1dc (3H, C); wc2 (C, 3); bc2 (1, 3).
    pts (R, P, 3) f32, dirs (R, 3) f32.  No gradient flows to pts/dirs.
    ``ladder``>0: grouped embedding — embedding-row weights arrive
    PRE-PERMUTED to the rung-major layout (see _ladder_perm); the caller's
    gather is what autodiff reverses, so grads flow back unpermuted.
    """
    fmat = (_freq_matrix_g(n_harmonic, omega0, ladder) if ladder
            else _freq_matrix(n_harmonic, omega0))

    def _grids(R, P):
        # raw _TILE_PTS on purpose: the per-pass _tile_pts(P) heuristic was
        # swept only for the fused loss op (loss_kernel_probe); this split
        # op keeps the validated fixed tile until swept itself (ADVICE r4)
        rt = max(1, _TILE_PTS // P)
        rt = min(rt, R)
        pad = (-R) % rt
        return rt, (R + pad) // rt, pad

    _grad_shapes = ("H3C", "H3C", "1C", "CC", "1C", "C1", "11",
                    "CC", "H3C", "H3C", "1C", "C3", "13")

    def _grad_specs(C, H3):
        dims = {"H3C": (H3, C), "1C": (1, C), "CC": (C, C), "C1": (C, 1),
                "11": (1, 1), "C3": (C, 3), "13": (1, 3)}
        full = lambda i: (0, 0)
        shapes = [dims[s] for s in _grad_shapes]
        return ([pl.BlockSpec(s, full) for s in shapes],
                [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes])

    def fwd_call(weights, pts, dirs):
        (w1s, w1c, b1, w2, b2, wd, bd, wc1h, wc1ds, wc1dc, bc1, wc2,
         bc2) = weights
        R, P, _ = pts.shape
        C = w2.shape[0]
        H3 = w1s.shape[0]
        rt, n_tiles, pad = _grids(R, P)
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
            dirs = jnp.pad(dirs, ((0, pad), (0, 0)))
        Rp = R + pad
        row3 = lambda i: (i, 0, 0)
        full = lambda i: (0, 0)
        # Mosaic requires the last-two block dims be (8, 128)-divisible or
        # full — a (rt, 3) dirs block with rt<8 violates that, so the
        # per-ray dirs are pre-grouped to (n_tiles, rt, 3) and blocked on
        # the leading (tile) dim instead
        dirs_g = dirs.reshape(n_tiles, rt, 3)
        act_specs = [
            pl.BlockSpec((rt, P, 1), row3),        # dens
            pl.BlockSpec((rt, P, 3), row3),        # rgb
            pl.BlockSpec((rt, P, C), row3),        # h1
            pl.BlockSpec((rt, P, C), row3),        # h2
            pl.BlockSpec((rt, P, C), row3),        # c1
            pl.BlockSpec((rt, P, H3), row3),       # es
            pl.BlockSpec((rt, P, H3), row3),       # ec
        ]
        act_shapes = [
            jax.ShapeDtypeStruct((Rp, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, P, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((Rp, P, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((Rp, P, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((Rp, P, H3), jnp.bfloat16),
            jax.ShapeDtypeStruct((Rp, P, H3), jnp.bfloat16),
        ]
        outs = pl.pallas_call(
            functools.partial(_fwd_kernel, beta=beta, ladder=ladder),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((rt, P, 3), row3),        # pts
                pl.BlockSpec((1, rt, 3), row3),        # dirs (grouped)
                pl.BlockSpec(fmat.shape, full),        # fmat
                pl.BlockSpec(w1s.shape, full), pl.BlockSpec(w1c.shape, full),
                pl.BlockSpec(b1.shape, full),
                pl.BlockSpec(w2.shape, full), pl.BlockSpec(b2.shape, full),
                pl.BlockSpec(wd.shape, full), pl.BlockSpec(bd.shape, full),
                pl.BlockSpec(wc1h.shape, full), pl.BlockSpec(wc1ds.shape, full),
                pl.BlockSpec(wc1dc.shape, full), pl.BlockSpec(bc1.shape, full),
                pl.BlockSpec(wc2.shape, full), pl.BlockSpec(bc2.shape, full),
            ],
            out_specs=act_specs,
            out_shape=act_shapes,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(pts, dirs_g, jnp.asarray(fmat), w1s, w1c, b1, w2, b2, wd, bd,
          wc1h, wc1ds, wc1dc, bc1, wc2, bc2)
        return outs, (pts, dirs)  # padded versions

    @jax.custom_vjp
    def op(weights, pts, dirs):
        R = pts.shape[0]
        outs, _ = fwd_call(weights, pts, dirs)
        return outs[0][:R], outs[1][:R]

    def op_fwd(weights, pts, dirs):
        R = pts.shape[0]
        outs, (pts_p, dirs_p) = fwd_call(weights, pts, dirs)
        dens, rgb, h1, h2, c1, es, ec = outs
        res = (weights, pts_p, dirs_p, h1, h2, c1, es, ec, dens, rgb, R)
        return (dens[:R], rgb[:R]), res

    def _pad_cotangents(g, Rp, R):
        gdens, grgb = g
        if Rp > R:
            gdens = jnp.pad(gdens, ((0, Rp - R), (0, 0), (0, 0)))
            grgb = jnp.pad(grgb, ((0, Rp - R), (0, 0), (0, 0)))
        return gdens, grgb

    def op_bwd(res, g):
        weights, pts_p, dirs_p, h1, h2, c1, es, ec, dens, rgb, R = res
        (w1s, w1c, b1, w2, b2, wd, bd, wc1h, wc1ds, wc1dc, bc1, wc2,
         bc2) = weights
        Rp, P, _ = dens.shape
        C = w2.shape[0]
        H3 = w1s.shape[0]
        gdens, grgb = _pad_cotangents(g, Rp, R)
        rt, n_tiles, _ = _grids(Rp, P)
        row3 = lambda i: (i, 0, 0)
        full = lambda i: (0, 0)
        dirs_g = dirs_p.reshape(n_tiles, rt, 3)  # see fwd_call comment
        out_specs, out_shape = _grad_specs(C, H3)
        grads = pl.pallas_call(
            functools.partial(_bwd_kernel, beta=beta, ladder=ladder),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((rt, P, 3), row3),        # pts
                pl.BlockSpec((1, rt, 3), row3),        # dirs (grouped)
                pl.BlockSpec(fmat.shape, full),        # fmat
                pl.BlockSpec(w2.shape, full), pl.BlockSpec(wd.shape, full),
                pl.BlockSpec(wc1h.shape, full), pl.BlockSpec(wc2.shape, full),
                pl.BlockSpec((rt, P, C), row3),        # h1
                pl.BlockSpec((rt, P, C), row3),        # h2
                pl.BlockSpec((rt, P, C), row3),        # c1
                pl.BlockSpec((rt, P, H3), row3),       # es
                pl.BlockSpec((rt, P, H3), row3),       # ec
                pl.BlockSpec((rt, P, 1), row3),        # dens
                pl.BlockSpec((rt, P, 3), row3),        # rgb
                pl.BlockSpec((rt, P, 1), row3),        # gdens
                pl.BlockSpec((rt, P, 3), row3),        # grgb
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(pts_p, dirs_g, jnp.asarray(fmat), w2, wd, wc1h, wc2, h1, h2, c1,
          es, ec, dens, rgb, gdens, grgb)
        R = res[-1]
        return (tuple(grads), jnp.zeros_like(pts_p[:R]),
                jnp.zeros_like(dirs_p[:R]))

    op.defvjp(op_fwd, op_bwd)
    return op


def field_color(params, pts, dirs, cfg, interpret: bool | None = None):
    """Fused-kernel equivalent of ``field.apply(params, pts, dirs, 'color')``
    for ``NerfField`` (models/fields.py): returns (dens (R, P, 1),
    rgb (R, P, 3)), both fp32.

    Differentiable wrt ``params`` only — pts/dirs are stop_gradient'd
    (ray geometry carries no parameter dependence in the train step).
    """
    weights = _split_weights(params, cfg)
    if interpret is None:
        interpret = _interpret_default()
    op = _make_op(float(cfg.softplus_beta), int(cfg.n_harmonic_functions),
                  float(cfg.omega0), bool(interpret), _ladder_of(cfg))
    # normalize in XLA with the EXACT flax expression (models/fields.py
    # color()): in-kernel division rounds differently at ulp level, and
    # the top harmonic frequency amplifies an ulp into an O(1) phase shift
    dn = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    dens, rgb = op(weights, jax.lax.stop_gradient(pts),
                   jax.lax.stop_gradient(dn))
    return dens, rgb


# ----------------------------------------------- fused bundle-loss kernel


def _loss_kernel(pts_ref, dirs_ref, tgt_ref, fmat_ref, w1s_ref, w1c_ref,
                 b1_ref, w2_ref, b2_ref, wd_ref, bd_ref, wc1h_ref, wc1ds_ref,
                 wc1dc_ref, bc1_ref, wc2_ref, bc2_ref, *refs,
                 beta, hs, scale, want_weights, ladder=0):
    """Field fwd + EA composite + huber loss + full backward, one launch.

    Per ray tile: evaluate the field (exactly _fwd_kernel's math), composite
    to a (rgb, opacity) pixel, take the huber loss against the target, pull
    the cotangents back through composite+field IN REGISTERS and accumulate
    the 13 parameter grads across the sequential grid.  Nothing but the
    grads (and a (1, 8) loss accumulator, lanes [ce_sum, se_sum]) leaves the
    kernel — the (N, 360) embeddings and (N, 256) hiddens that the split
    fwd/bwd kernels round-trip through HBM never exist off-chip.

    Composite in closed form: dens = 1 - exp(-raw) makes absorption
    EXACTLY exp(-cumsum(raw)) and opacity 1 - exp(-sum(raw)) — the
    eps=1e-10 of raymarch.ea_weights (pren.py:164-169) is a torch guard
    against zero-cumprod gradients that the closed form doesn't need
    (differs from the flax path by <= P*eps ~ 3e-8 relative).

    Backward through composite, with a_i = raw_i, Q_i = sum_{j<i} a_j,
    w_i = (1-e^{-a_i}) e^{-Q_i}:
        dL/da_i = g_wi (A_i - w_i) - sum_{j>i} g_wj w_j + g_O e^{-S}
    (rev-cumsum for the middle term; A = e^{-Q}, S = sum a).

    Loss (train/nerf_trainer.py loss_fn): per-ray ce = mean_c huber(feat-col),
    se = huber(opacity - sil); kernel accumulates sum(v*ce), sum(v*se) and
    scales grads by ``scale`` = loss_scale / n_valid (static at trace time).
    """
    if want_weights:
        (dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref, dbd_ref,
         dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref, dwc2_ref, dbc2_ref,
         loss_ref, w_ref) = refs
    else:
        (dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref, dbd_ref,
         dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref, dwc2_ref, dbc2_ref,
         loss_ref) = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for r in (dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref,
                  dbd_ref, dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref,
                  dwc2_ref, dbc2_ref, loss_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    Rt, P, _ = pts_ref.shape
    N = Rt * P
    bf = jnp.bfloat16
    f32 = jnp.float32

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    # ---- forward (same math as _fwd_kernel; everything stays live) ----
    x = pts_ref[:].reshape(N, 3)
    _s, _c = _embed(x, fmat_ref[:], ladder)                         # (N, 3H)
    es = _s.astype(bf)
    ec = _c.astype(bf)
    h1 = _softplus_b(mm(es, w1s_ref[:].astype(bf)) + mm(ec, w1c_ref[:].astype(bf))
                     + b1_ref[:], beta)
    h1b = h1.astype(bf)
    h2 = _softplus_b(mm(h1b, w2_ref[:].astype(bf)) + b2_ref[:], beta)
    h2b = h2.astype(bf)
    raw = _softplus_b(jnp.dot(h2, wd_ref[:], preferred_element_type=f32)
                      + bd_ref[:], beta)                            # (N, 1)
    dirs_flat = dirs_ref[:].reshape(Rt, 3)
    _ds, _dc = _embed(dirs_flat, fmat_ref[:], ladder)
    dpart = (mm(_ds.astype(bf), wc1ds_ref[:].astype(bf))
             + mm(_dc.astype(bf), wc1dc_ref[:].astype(bf))
             + bc1_ref[:])                                          # (Rt, C)
    c1 = _softplus_b(mm(h2b, wc1h_ref[:].astype(bf)).reshape(Rt, P, -1)
                     + dpart[:, None, :], beta)
    c1b = c1.astype(bf).reshape(N, -1)
    rgb = jax.nn.sigmoid(mm(c1b, wc2_ref[:].astype(bf)) + bc2_ref[:])  # (N,3)

    # ---- composite + loss (per-ray, in registers) ----
    # Mosaic has no cumsum lowering; an upper-triangular 0/1 matmul is the
    # MXU-native inclusive scan ((rt, P) @ (P, P) is noise next to the
    # field matmuls).  fp32 MXU accumulation of <= P nonneg terms is exact
    # enough (the flax path's cumprod differs by its own rounding anyway).
    tri = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(f32)

    def cumsum_lanes(m):  # inclusive cumsum along the last (lane) axis
        return jnp.dot(m, tri, preferred_element_type=f32)

    rawr = raw.reshape(Rt, P)
    Q = cumsum_lanes(rawr)
    A = jnp.exp(rawr - Q)                    # exp(-exclusive prefix)
    dens = 1.0 - jnp.exp(-rawr)
    w = dens * A                             # EA weights (Rt, P)
    rgbr = rgb.reshape(Rt, P, 3)
    feat = jnp.sum(w[..., None] * rgbr, axis=1)                    # (Rt, 3)
    Stot = jnp.sum(rawr, axis=-1, keepdims=True)                   # (Rt, 1)
    eS = jnp.exp(-Stot)
    opac = 1.0 - eS

    tgt = tgt_ref[:].reshape(Rt, 8)
    col = tgt[:, 0:3]
    sil = tgt[:, 3:4]
    v = tgt[:, 4:5]
    dc = feat - col
    rc = jnp.sqrt(1.0 + dc * dc / (hs * hs))
    dsil = opac - sil
    rs = jnp.sqrt(1.0 + dsil * dsil / (hs * hs))
    ce_sum = jnp.sum((rc - 1.0) * hs * v) / 3.0
    se_sum = jnp.sum((rs - 1.0) * hs * v)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    loss_ref[:] += jnp.where(lane == 0, ce_sum,
                             jnp.where(lane == 1, se_sum, 0.0))

    if want_weights:
        w_ref[:] = w

    # ---- backward: loss -> (du, grgb), then the shared grad math ----
    gf = (scale / 3.0) * v * dc / (hs * rc)                        # (Rt, 3)
    gO = scale * v * dsil / (hs * rs)                              # (Rt, 1)
    gw = jnp.sum(gf[:, None, :] * rgbr, axis=-1)                   # (Rt, P)
    grgb = (w[..., None] * gf[:, None, :]).reshape(N, 3)
    T = gw * w
    rev_excl = jnp.sum(T, axis=-1, keepdims=True) - cumsum_lanes(T)
    g_raw = gw * (A - w) - rev_excl + gO * eS                      # (Rt, P)
    du = g_raw.reshape(N, 1) * _sig_from_act(raw, beta)

    _grad_math(
        Rt, P, dirs_flat, fmat_ref[:],
        w2_ref, wd_ref, wc1h_ref, wc2_ref,
        h1b, h2b, c1b, es, ec, rgb, du, grgb,
        dw1s_ref, dw1c_ref, db1_ref, dw2_ref, db2_ref, dwd_ref, dbd_ref,
        dwc1h_ref, dwc1ds_ref, dwc1dc_ref, dbc1_ref, dwc2_ref, dbc2_ref,
        beta, ladder=ladder)


@functools.lru_cache(maxsize=None)
def _make_loss_op(beta: float, n_harmonic: int, omega0: float,
                  interpret: bool, hs: float, scale: float,
                  want_weights: bool, ladder: int = 0):
    """(weights..., pts, dirs, tgt) -> (13 grads, loss (1, 8)[, w (R, P)]).

    Forward-only (grads ARE outputs) — never wrapped in jax.grad."""
    fmat = (_freq_matrix_g(n_harmonic, omega0, ladder) if ladder
            else _freq_matrix(n_harmonic, omega0))

    def run(weights, pts, dirs, tgt):
        (w1s, w1c, b1, w2, b2, wd, bd, wc1h, wc1ds, wc1dc, bc1, wc2,
         bc2) = weights
        R, P, _ = pts.shape
        C = w2.shape[0]
        H3 = w1s.shape[0]
        # rt >= 2: Mosaic cannot lower the per-ray (rt, P) reductions of
        # the in-kernel composite at rt == 1 ("Offset change" on a
        # (1, P) multi_reduction, probed at FIELD_KERNEL_TILE=512) — pad
        # the ray axis instead of shrinking the tile below 2
        rt = max(2, _tile_pts(P) // P)
        rt = min(rt, max(R, 2))
        pad = (-R) % rt
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
            dirs = jnp.pad(dirs, ((0, pad), (0, 0)))
            tgt = jnp.pad(tgt, ((0, pad), (0, 0)))  # valid lane pads to 0
        Rp = R + pad
        n_tiles = Rp // rt
        row3 = lambda i: (i, 0, 0)
        full = lambda i: (0, 0)
        dirs_g = dirs.reshape(n_tiles, rt, 3)   # see fwd_call comment
        tgt_g = tgt.reshape(n_tiles, rt, 8)

        dims = {"H3C": (H3, C), "1C": (1, C), "CC": (C, C), "C1": (C, 1),
                "11": (1, 1), "C3": (C, 3), "13": (1, 3)}
        gshapes = [dims[s] for s in ("H3C", "H3C", "1C", "CC", "1C", "C1",
                                     "11", "CC", "H3C", "H3C", "1C", "C3",
                                     "13")]
        out_specs = [pl.BlockSpec(s, full) for s in gshapes]
        out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in gshapes]
        out_specs.append(pl.BlockSpec((1, 8), full))               # loss
        out_shape.append(jax.ShapeDtypeStruct((1, 8), jnp.float32))
        if want_weights:
            out_specs.append(pl.BlockSpec((rt, P), lambda i: (i, 0)))
            out_shape.append(jax.ShapeDtypeStruct((Rp, P), jnp.float32))

        outs = pl.pallas_call(
            functools.partial(_loss_kernel, beta=beta, hs=hs, scale=scale,
                              want_weights=want_weights, ladder=ladder),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((rt, P, 3), row3),        # pts
                pl.BlockSpec((1, rt, 3), row3),        # dirs (grouped)
                pl.BlockSpec((1, rt, 8), row3),        # tgt (grouped)
                pl.BlockSpec(fmat.shape, full),
                pl.BlockSpec(w1s.shape, full), pl.BlockSpec(w1c.shape, full),
                pl.BlockSpec(b1.shape, full),
                pl.BlockSpec(w2.shape, full), pl.BlockSpec(b2.shape, full),
                pl.BlockSpec(wd.shape, full), pl.BlockSpec(bd.shape, full),
                pl.BlockSpec(wc1h.shape, full), pl.BlockSpec(wc1ds.shape, full),
                pl.BlockSpec(wc1dc.shape, full), pl.BlockSpec(bc1.shape, full),
                pl.BlockSpec(wc2.shape, full), pl.BlockSpec(bc2.shape, full),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )(pts, dirs_g, tgt_g, jnp.asarray(fmat), w1s, w1c, b1, w2, b2, wd,
          bd, wc1h, wc1ds, wc1dc, bc1, wc2, bc2)
        grads, loss = outs[:13], outs[13]
        wts = outs[14][:R] if want_weights else None
        return grads, loss, wts

    return run


def _split_weights(params, cfg):
    """Slice the flax param dict into the kernel's 13 weight blocks.

    With embed_method="grouped" the four embedding-row blocks (w1s, w1c,
    wc1ds, wc1dc) are gather-permuted to the kernel's rung-major layout —
    on autodiff paths (field_color) the gather's VJP un-permutes the
    grads; the explicit-grads loss op un-permutes in bundle_loss_grads."""
    pr = params["params"]
    H = cfg.n_harmonic_functions
    ladder = _ladder_of(cfg)
    w1 = pr["trunk1"]["kernel"]
    w2 = pr["trunk2"]["kernel"]
    wd = pr["density_layer"]["kernel"]
    wc1 = pr["color1"]["kernel"]
    wc2 = pr["color2"]["kernel"]
    nh = w2.shape[0]
    w1s, w1c = w1[: 3 * H], w1[3 * H :]
    wc1ds, wc1dc = wc1[nh : nh + 3 * H], wc1[nh + 3 * H :]
    if ladder:
        perm = _ladder_perm(H, ladder)
        w1s, w1c = w1s[perm], w1c[perm]
        wc1ds, wc1dc = wc1ds[perm], wc1dc[perm]
    return (
        w1s, w1c, pr["trunk1"]["bias"][None, :],
        w2, pr["trunk2"]["bias"][None, :],
        wd, pr["density_layer"]["bias"][None, :],
        wc1[:nh], wc1ds, wc1dc,
        pr["color1"]["bias"][None, :],
        wc2, pr["color2"]["bias"][None, :],
    )


def _grads_to_tree(params, grads):
    """Assemble the 13 flat grad blocks into a params-shaped pytree
    (zeros for untouched leaves, e.g. the SIREN feature head)."""
    (dw1s, dw1c, db1, dw2, db2, dwd, dbd, dwc1h, dwc1ds, dwc1dc, dbc1,
     dwc2, dbc2) = grads
    g = jax.tree.map(jnp.zeros_like, params)
    gp = dict(g["params"])
    gp["trunk1"] = {"kernel": jnp.concatenate([dw1s, dw1c], 0), "bias": db1[0]}
    gp["trunk2"] = {"kernel": dw2, "bias": db2[0]}
    gp["density_layer"] = {"kernel": dwd, "bias": dbd[0]}
    gp["color1"] = {"kernel": jnp.concatenate([dwc1h, dwc1ds, dwc1dc], 0),
                    "bias": dbc1[0]}
    gp["color2"] = {"kernel": dwc2, "bias": dbc2[0]}
    return {**g, "params": gp}


def bundle_loss_grads(params, pts, dirs, col, sil, valid, cfg, *,
                      huber_scaling: float, scale: float,
                      want_weights: bool = False,
                      interpret: bool | None = None):
    """Fused train-bundle evaluation for ``NerfField``: field fwd + EA
    composite + huber color/sil loss + backward, one Pallas launch.

    pts (R, P, 3); dirs (R, 3) un-normalized; col (R, 3); sil/valid (R, 1).
    ``scale`` is the cotangent of each ray's (ce + se) — the trainers pass
    loss_scale / n_valid_rays (static).  Returns
    (grads pytree shaped like params, (ce_sum, se_sum) f32 scalars,
    EA weights (R, P) if want_weights else None).

    Replaces eval_color -> raymarch.composite -> huber -> jax.grad for the
    single-chunk train step (train/nerf_trainer.py): grads/losses match the
    flax path to bf16 tolerance (tests/test_field_kernel.py); the composite
    is the exact eps-free closed form (see _loss_kernel docstring).
    """
    if interpret is None:
        interpret = _interpret_default()
    ladder = _ladder_of(cfg)
    run = _make_loss_op(float(cfg.softplus_beta),
                        int(cfg.n_harmonic_functions), float(cfg.omega0),
                        bool(interpret), float(huber_scaling), float(scale),
                        bool(want_weights), ladder)
    dn = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    tgt = jnp.concatenate(
        [col, sil, valid, jnp.zeros((pts.shape[0], 3), col.dtype)], axis=-1
    ).astype(jnp.float32)
    grads, loss, wts = run(
        _split_weights(params, cfg), jax.lax.stop_gradient(pts),
        jax.lax.stop_gradient(dn), jax.lax.stop_gradient(tgt))
    if ladder:
        # explicit grad outputs are in the kernel's rung-major row layout;
        # map the four embedding-row blocks back to flax rows
        inv = np.argsort(_ladder_perm(int(cfg.n_harmonic_functions), ladder))
        g = list(grads)
        g[0], g[1], g[8], g[9] = g[0][inv], g[1][inv], g[8][inv], g[9][inv]
        grads = tuple(g)
    return _grads_to_tree(params, grads), (loss[0, 0], loss[0, 1]), wts
