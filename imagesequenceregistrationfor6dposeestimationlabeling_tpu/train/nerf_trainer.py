"""NeRF training: the trainNerfFine.py driver rebuilt as one jitted step.

Reference semantics (trainNerfFine.py:214-354):
* coarse + FINE models trained jointly, Adam lr 1e-3, feature heads frozen,
* coarse pass on raw stratified MC rays (stratified=False path),
* fine pass on importance-resampled depths from detached coarse weights
  (sample_pdf with add_input_samples=True -> 64+256 sorted points),
* loss = 500*huber(color) + 500*huber(sil) for BOTH passes, GT sampled at
  the shared ray xys with nearest-neighbor grid sampling.

TPU-first differences:
* the whole step (ray gen -> field eval -> compositing -> loss -> Adam) is
  a single XLA computation; no separate no-grad coarse render (the
  reference evaluates the coarse field twice, pren.py:200-243 — we reuse
  one evaluation and stop_gradient the weights),
* the camera batch is sharded over the mesh 'data' axis; gradient psum is
  inserted by XLA,
* MLP matmuls run in bf16 on the MXU with fp32 nonlinearities/heads
  (models/fields.py); rays are processed in rematerialized scan chunks and
  many optimization steps run inside one program (make_multi_step).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
    FieldConfig,
    NerfTrainConfig,
    RenderConfig,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.grid_sample import (
    sample_images_at_mc_locs,
)
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer


class NerfTrainState(NamedTuple):
    params_coarse: dict
    params_fine: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(cfg: NerfTrainConfig):
    """Adam on everything except the (frozen) feature heads
    (trainNerfFine.py:174-186, 214)."""
    label_fn = fields.freeze_spec(train_feature_head=False)

    def label_tree(params_pair):
        return tuple({"params": label_fn(p["params"])} for p in params_pair)

    if cfg.warmup_steps > 0:
        sched = optax.linear_schedule(cfg.lr * 0.02, cfg.lr, cfg.warmup_steps)
    else:
        sched = cfg.lr
    tx = optax.multi_transform(
        {"train": optax.adam(sched), "freeze": optax.set_to_zero()}, label_tree
    )
    return tx


@functools.lru_cache(maxsize=16)
def _opt_init_fn(cfg: NerfTrainConfig):
    # cached: a fresh jax.jit(tx.init) per call re-traces every invocation
    tx = make_optimizer(cfg)
    return jax.jit(tx.init)


def init_state(
    field: fields.NerfField,
    cfg: NerfTrainConfig,
    key: jax.Array,
    init_params=None,
) -> Tuple[NerfTrainState, optax.GradientTransformation]:
    """``init_params``: optional (coarse, fine) params to resume from
    (the reference loads nerflatestFine.pth with --cont,
    trainNerfFine.py:165-172)."""
    k1, k2 = jax.random.split(key)
    if init_params is not None:
        pc, pf = init_params
    else:
        pc = fields.init_field(field, k1)
        pf = fields.init_field(field, k2)
    tx = make_optimizer(cfg)
    # jitted: eager optax init dispatches per-tensor (~40-90 ms each via relay)
    opt_state = _opt_init_fn(cfg)((pc, pf))
    return NerfTrainState(pc, pf, opt_state, jnp.zeros((), jnp.int32)), tx


# Empirical libtpu fault (EXPERIMENTS.md round 4): the SPLIT fwd/bwd Pallas
# field kernels inside a >=10-step scanned train program crash the TPU
# worker ("kernel fault") once the resident view bank grows past ~300 MB —
# 640 views @ 224^2 faults reproducibly, 256 views is fine; the flax path
# is fine at any size.  The fused bundle-loss kernel does NOT fault (no
# residual HBM stores; 1280 views x 50 steps probed clean at spc 10 and
# 50), so the fallback only applies when the split path would run
# (multi-chunk steps, or FUSED_LOSS_KERNEL=0).  Explicit fused_kernel=True
# still forces kernels regardless (the caller owns the risk).
_KERNEL_VIEWBANK_LIMIT = 256 * 1024 * 1024
_DEFAULT_RAY_CHUNK = 4096


def _kernel_safe_field(field: fields.NerfField, render_cfg, train_cfg, *banks):
    cfg = field.cfg
    if getattr(cfg, "fused_kernel", None) is not None or not field_kernel.enabled(cfg):
        return field
    total_rays = train_cfg.batch_size * render_cfg.n_rays_per_image
    if (total_rays <= _DEFAULT_RAY_CHUNK
            and os.environ.get("FUSED_LOSS_KERNEL", "1") != "0"):
        return field  # single-chunk -> fused bundle-loss kernel: fault-free
    nbytes = sum(int(np.prod(b.shape)) * jnp.dtype(b.dtype).itemsize for b in banks)
    if nbytes <= _KERNEL_VIEWBANK_LIMIT:
        return field
    print(
        f"train_nerf: view bank {nbytes / 1e6:.0f} MB > "
        f"{_KERNEL_VIEWBANK_LIMIT / 1e6:.0f} MB — using the flax field path "
        "(the split fwd/bwd Pallas kernels fault libtpu at large resident "
        "banks; EXPERIMENTS.md round 4)"
    )
    import dataclasses

    return fields.NerfField(dataclasses.replace(cfg, fused_kernel=False))


def make_train_step(
    field: fields.NerfField,
    tx: optax.GradientTransformation,
    render_cfg: RenderConfig,
    train_cfg: NerfTrainConfig,
    min_depth: float,
    max_depth: float,
    ray_chunk: int = _DEFAULT_RAY_CHUNK,
    mesh=None,
):
    """One jitted optimization step.

    Memory discipline for large ray batches (the path to the <60 s
    registration target is few steps x huge ray batches): rays are
    processed in `ray_chunk` groups under ``lax.scan`` with
    ``jax.checkpoint`` — the backward pass recomputes one chunk's
    activations at a time, so peak HBM is O(chunk) instead of O(batch)
    (a bs=16 x 2048-ray step would otherwise need ~49 GB of HLO temps).

    With ``mesh``, every ray chunk is sharded over the mesh 'data' axis
    (rays are embarrassingly parallel); params stay replicated and XLA
    inserts the gradient psum over ICI.  mesh=None compiles the exact
    single-device program.
    """
    Pc = render_cfg.n_pts_coarse
    Pf = render_cfg.n_pts_fine
    s = train_cfg.loss_scale
    hs = train_cfg.huber_scaling
    n_dev = mesh.devices.size if mesh is not None else 1
    # remat trades ~1.3x compute for O(chunk) memory; at the reference's
    # tiny ray batch (1.2k rays) the activations fit HBM outright, so the
    # recompute is pure overhead — keep remat only when a step actually
    # processes multiple chunks (large-batch path)
    total_rays = train_cfg.batch_size * render_cfg.n_rays_per_image
    remat = total_rays > ray_chunk
    # fused Pallas field eval (embed->trunk->heads in VMEM) on real TPU;
    # the flax path stays for CPU (interpret-mode pallas is slower there).
    # On a >1-device mesh XLA's auto-SPMD cannot partition the custom
    # call, so the kernel runs under shard_map: each device evaluates its
    # ray shard, params replicated, grad-psum inserted by the AD transpose.
    use_kernel = field_kernel.enabled(field.cfg)
    # single-chunk steps go through the FULLY fused bundle kernel (field
    # fwd + composite + huber + backward in one Pallas launch,
    # field_kernel.bundle_loss_grads): the split fwd/bwd kernels round-trip
    # ~4 GB/step of residuals through HBM that the fused form keeps in
    # VMEM.  Multi-chunk (large-ray-batch) steps keep the remat scan path.
    # FUSED_LOSS_KERNEL=0 is the escape hatch back to the split kernels.
    use_fused_loss = (
        use_kernel
        and total_rays <= ray_chunk
        and os.environ.get("FUSED_LOSS_KERNEL", "1") != "0"
    )

    def eval_color(params, pts, dirs):
        if not use_kernel:
            return field.apply(params, pts, dirs, "color")
        if mesh is None or n_dev == 1:
            return field_kernel.field_color(params, pts, dirs, field.cfg)
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            lambda p, x, d: field_kernel.field_color(p, x, d, field.cfg),
            mesh=mesh,
            in_specs=(P(), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
            out_specs=(P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
            check_vma=False,  # pallas out_shapes carry no vma info
        )
        return fn(params, pts, dirs)

    def loss_fn(params_pair, cam: cam_lib.Camera, images, sils, key):
        pc, pf = params_pair
        k_rays, k_pdf = jax.random.split(key)
        bundle = cam_lib.monte_carlo_rays(
            cam, render_cfg.n_rays_per_image, Pc, min_depth, max_depth, k_rays
        )
        sil_at = sample_images_at_mc_locs(sils[..., None], bundle.xys)
        col_at = sample_images_at_mc_locs(images, bundle.xys)

        # flatten rays over (batch, rays) and pad to chunk multiple;
        # chunks must divide evenly over the mesh for the 'data' sharding
        n = bundle.origins.shape[0] * bundle.origins.shape[1]
        chunk = min(ray_chunk, mesh_lib.pad_to_multiple(n, n_dev))
        chunk = max(chunk - chunk % n_dev, n_dev)

        def flat(x, d):
            x = x.reshape(n, d)
            pad = (-n) % chunk
            return x if pad == 0 else jnp.pad(x, ((0, pad), (0, 0)))

        o = flat(bundle.origins, 3)
        d = flat(bundle.directions, 3)
        l = flat(bundle.lengths, Pc)
        col = flat(col_at, 3)
        sil = flat(sil_at, 1)
        valid = flat(jnp.ones((n, 1)), 1)
        n_chunks = o.shape[0] // chunk
        keys = jax.random.split(k_pdf, n_chunks)

        def chunk_body(pc, pf, o, d, l, col, sil, valid, kk):
            pts = o[:, None, :] + d[:, None, :] * l[:, :, None]
            dens_c, rgb_c = eval_color(pc, pts, d)
            img_c, w_c = raymarch.composite(dens_c[..., 0], rgb_c)
            z_f = raymarch.importance_resample(
                l, jax.lax.stop_gradient(w_c), Pf, kk, det=False,
                add_input_samples=render_cfg.add_input_samples,
            )
            pts_f = o[:, None, :] + d[:, None, :] * z_f[:, :, None]
            dens_f, rgb_f = eval_color(pf, pts_f, d)
            img_f, _ = raymarch.composite(dens_f[..., 0], rgb_f)

            def err(img):
                ce = raymarch.huber(img[..., :-1], col, hs).mean(-1)
                se = raymarch.huber(img[..., -1:], sil, hs).mean(-1)
                return ce, se

            ce_c, se_c = err(img_c)
            ce_f, se_f = err(img_f)
            v = valid[:, 0]
            return jnp.stack(
                [((ce_c + ce_f) * v).sum(), ((se_c + se_f) * v).sum(), v.sum()]
            )

        body = jax.checkpoint(chunk_body) if remat else chunk_body

        def scan_fn(carry, inp):
            o_c, d_c, l_c, col_c, sil_c, val_c, kk = inp
            return carry + body(pc, pf, o_c, d_c, l_c, col_c, sil_c, val_c, kk), None

        def group(x):
            x = x.reshape(n_chunks, chunk, -1)
            # shard each chunk's ray axis over the mesh (no-op without mesh)
            return mesh_lib.constrain(x, mesh, (None, mesh_lib.DATA_AXIS))

        sums, _ = jax.lax.scan(
            scan_fn,
            jnp.zeros((3,)),
            (group(o), group(d), group(l), group(col), group(sil), group(valid), keys),
        )
        col_err = s * sums[0] / sums[2]
        sil_err = s * sums[1] / sums[2]
        loss = col_err + sil_err
        return loss, {"color": col_err, "sil": sil_err}

    def fused_value_and_grad(params_pair, cam: cam_lib.Camera, images, sils, key):
        """Single-chunk step through field_kernel.bundle_loss_grads: the
        coarse and fine bundles each run field fwd + composite + huber +
        backward in ONE Pallas launch (grads are kernel outputs — no
        jax.grad).  Semantically equivalent to value_and_grad(loss_fn) at
        n_chunks == 1 (same rays, RNG stream, loss normalization); the
        composite is the exact eps-free closed form (field_kernel
        docstring).  Tested against the flax path in test_nerf_training."""
        pc, pf = params_pair
        k_rays, k_pdf = jax.random.split(key)
        bundle = cam_lib.monte_carlo_rays(
            cam, render_cfg.n_rays_per_image, Pc, min_depth, max_depth, k_rays
        )
        sil_at = sample_images_at_mc_locs(sils[..., None], bundle.xys)
        col_at = sample_images_at_mc_locs(images, bundle.xys)
        n = bundle.origins.shape[0] * bundle.origins.shape[1]
        npad = mesh_lib.pad_to_multiple(n, n_dev)

        def flat(x, d):
            x = x.reshape(n, d)
            return x if npad == n else jnp.pad(x, ((0, npad - n), (0, 0)))

        o = flat(bundle.origins, 3)
        d = flat(bundle.directions, 3)
        l = flat(bundle.lengths, Pc)
        col = flat(col_at, 3)
        sil = flat(sil_at, 1)
        valid = flat(jnp.ones((n, 1)), 1)
        kw = dict(huber_scaling=hs, scale=s / n)
        kk = jax.random.split(k_pdf, 1)[0]  # the chunked path's stream

        def kcall(p, pts, want_w):
            if mesh is None or n_dev == 1:
                return field_kernel.bundle_loss_grads(
                    p, pts, d, col, sil, valid, field.cfg,
                    want_weights=want_w, **kw)
            from jax.sharding import PartitionSpec as P

            def body(p, pts_s, d_s, col_s, sil_s, val_s):
                g, (ce, se), w = field_kernel.bundle_loss_grads(
                    p, pts_s, d_s, col_s, sil_s, val_s, field.cfg,
                    want_weights=want_w, **kw)
                g = jax.lax.psum(g, mesh_lib.DATA_AXIS)
                ce = jax.lax.psum(ce, mesh_lib.DATA_AXIS)
                se = jax.lax.psum(se, mesh_lib.DATA_AXIS)
                return (g, (ce, se), w) if want_w else (g, (ce, se))

            dp = P(mesh_lib.DATA_AXIS)
            fn = jax.shard_map(
                body, mesh=mesh, in_specs=(P(), dp, dp, dp, dp, dp),
                out_specs=(P(), (P(), P()), dp) if want_w else (P(), (P(), P())),
                check_vma=False)
            out = fn(p, pts, d, col, sil, valid)
            return out if want_w else (*out, None)

        pts_c = o[:, None, :] + d[:, None, :] * l[:, :, None]
        gc, (ce_c, se_c), w_c = kcall(pc, pts_c, True)
        z_f = raymarch.importance_resample(
            l, w_c, Pf, kk, det=False,
            add_input_samples=render_cfg.add_input_samples,
        )
        pts_f = o[:, None, :] + d[:, None, :] * z_f[:, :, None]
        gf, (ce_f, se_f), _ = kcall(pf, pts_f, False)
        col_err = s * (ce_c + ce_f) / n
        sil_err = s * (se_c + se_f) / n
        return (col_err + sil_err, {"color": col_err, "sil": sil_err}), (gc, gf)

    @jax.jit
    def train_step(state: NerfTrainState, cam: cam_lib.Camera, images, sils, key):
        if use_fused_loss:
            (loss, aux), grads = fused_value_and_grad(
                (state.params_coarse, state.params_fine), cam, images, sils, key
            )
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                (state.params_coarse, state.params_fine), cam, images, sils, key
            )
        updates, new_opt = tx.update(grads, state.opt_state, (state.params_coarse, state.params_fine))
        pc, pf = optax.apply_updates((state.params_coarse, state.params_fine), updates)
        return NerfTrainState(pc, pf, new_opt, state.step + 1), loss, aux

    return train_step


def make_multi_step(
    field: fields.NerfField,
    tx: optax.GradientTransformation,
    render_cfg: RenderConfig,
    train_cfg: NerfTrainConfig,
    min_depth: float,
    max_depth: float,
    ray_chunk: int = _DEFAULT_RAY_CHUNK,
    mesh=None,
):
    """Scan `n_inner` optimization steps inside ONE jitted program.

    Per-program dispatch costs dwarf the per-step compute at the
    reference's tiny batch (3 cams x 400 rays); scanning K steps on-device
    amortizes dispatch to ~0 and lets XLA pipeline HBM traffic.  The whole
    view set stays resident in HBM (1280 x 200^2 rgb ~= 0.6 GB) and each
    step gathers its camera batch by index.
    """
    step_fn_inner = make_train_step(
        field, tx, render_cfg, train_cfg, min_depth, max_depth, ray_chunk, mesh=mesh
    )

    @jax.jit
    def multi_step(state: NerfTrainState, cam_all: cam_lib.Camera, images, sils, idx, key):
        """idx: (n_inner, batch) int32 view indices."""

        def body(carry, inp):
            state, key = carry
            batch_idx = inp
            key, sub = jax.random.split(key)
            cam_b = cam_lib.Camera(
                cam_all.R[batch_idx],
                cam_all.T[batch_idx],
                cam_all.focal[batch_idx],
                cam_all.principal[batch_idx],
                cam_all.image_size,
            )
            # jit-in-jit simply inlines the traced step
            state, loss, aux = step_fn_inner(state, cam_b, images[batch_idx], sils[batch_idx], sub)
            return (state, key), loss

        (state, _), losses = jax.lax.scan(body, (state, key), idx)
        return state, losses

    return multi_step


@functools.lru_cache(maxsize=16)
def _multi_step_cached(field, render_cfg, train_cfg, min_d, max_d, mesh):
    """make_multi_step memoized on its static inputs: rebuilding the jit
    per train call re-traces the whole K-step scan every invocation
    (seconds of host time per call on a 1-CPU box; EXPERIMENTS.md
    "tracing tax")."""
    tx = make_optimizer(train_cfg)
    return make_multi_step(field, tx, render_cfg, train_cfg, min_d, max_d, mesh=mesh)


@functools.lru_cache(maxsize=16)
def _fused_multi_cached(field, render_cfg, train_cfg, min_d, max_d, mesh):
    multi = _multi_step_cached(field, render_cfg, train_cfg, min_d, max_d, mesh)
    cam_axes = cam_lib.Camera(0, 0, 0, 0, None)
    return jax.jit(jax.vmap(multi, in_axes=(0, cam_axes, 0, 0, 0, 0)))


_cached_or_fresh = mesh_lib.cached_or_fresh


def depth_bounds(t_bop: np.ndarray, margin: float = 2.0):
    """min/max depths from camera distances (trainNerfFine.py:118-119)."""
    z = np.abs(np.asarray(t_bop)[:, 2])
    return float(z.min() - margin), float(z.max() + margin)


def train_nerf_fused(
    images: np.ndarray,          # (H, N, S, S, 3) stacked half-sequences
    sils: np.ndarray,            # (H, N, S, S)
    R_bop: np.ndarray,           # (H, N, 3, 3)
    t_bop: np.ndarray,           # (H, N, 3)
    K: np.ndarray,               # (H, N, 3, 3)
    field: fields.NerfField,
    render_cfg: RenderConfig = RenderConfig(),
    train_cfg: NerfTrainConfig = NerfTrainConfig(),
    n_steps: Optional[int] = None,
    seed: int = 1,
    depth_margin: float = 2.0,
    log_every: int = 0,
    steps_per_call: int = 25,
    mesh="auto",
):
    """Train H independent NeRFs (one per half-sequence) in ONE device
    program: the multi-step is vmapped over a leading half axis.

    The reference trains the halves as two fully independent invocations of
    trainNerfFine.py:221-223 — nothing couples them — so at the reference's
    tiny per-step compute (3 cams x 400 rays) the serial cost is pure
    overhead duplication.  Fusing runs both halves' ray batches through the
    same XLA program; per-step dispatch, scan setup and HBM pipeline
    bubbles are paid once and the MXU sees twice the work per launch
    (wall-clock for 2 halves ~= 1 half's).

    Per-half streams exactly match independent ``train_nerf`` runs with
    ``seed + h`` (same init RNG, batch schedule and per-step keys), so the
    fused path is drop-in equivalent — tested in test_nerf_training.

    Returns (list of per-half NerfTrainState, (H, n_steps) loss array).
    """
    if mesh == "auto":
        mesh = mesh_lib.auto_mesh()
    field = _kernel_safe_field(field, render_cfg, train_cfg, images, sils)
    H, n = images.shape[0], images.shape[1]
    S = images.shape[2]
    min_d, max_d = depth_bounds(np.asarray(t_bop).reshape(-1, 3), depth_margin)

    # per-half init + camera banks, then stack leaves (image_size is static)
    states, cams = [], []
    tx = make_optimizer(train_cfg)
    for h in range(H):
        st, _ = init_state(field, train_cfg, jax.random.PRNGKey(seed + h))
        states.append(st)
        cams.append(
            cam_lib.camera_from_bop(
                jnp.asarray(R_bop[h]), jnp.asarray(t_bop[h]), jnp.asarray(K[h]), S
            )
        )
    state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    cam_all = cam_lib.Camera(
        jnp.stack([c.R for c in cams]),
        jnp.stack([c.T for c in cams]),
        jnp.stack([c.focal for c in cams]),
        jnp.stack([c.principal for c in cams]),
        cams[0].image_size,
    )

    fused = _cached_or_fresh(
        _fused_multi_cached,
        lambda: jax.jit(jax.vmap(
            make_multi_step(field, tx, render_cfg, train_cfg, min_d, max_d, mesh=mesh),
            in_axes=(0, cam_lib.Camera(0, 0, 0, 0, None), 0, 0, 0, 0),
        )),
        field, render_cfg, train_cfg, min_d, max_d, mesh,
    )

    images = jnp.asarray(images)
    sils = jnp.asarray(sils)
    if mesh is not None:
        state = mesh_lib.replicate(state, mesh)
        cam_all = mesh_lib.replicate(cam_all, mesh)
        images = mesh_lib.replicate(images, mesh)
        sils = mesh_lib.replicate(sils, mesh)

    bs = min(train_cfg.batch_size, n)
    total = n_steps if n_steps is not None else train_cfg.n_epochs * max(n // bs, 1)

    # per-half epoch-shuffled schedules, identical to train_nerf(seed+h)
    def half_schedule(h):
        rng = np.random.default_rng(seed + h)
        out = []
        while len(out) < total:
            perm = rng.permutation(n)
            for i in range(max(n // bs, 1)):
                idx = perm[i * bs : i * bs + bs]
                if len(idx) < bs:
                    idx = np.concatenate([idx, perm[: bs - len(idx)]])
                out.append(idx)
        return np.stack(out[:total])

    all_idx = np.stack([half_schedule(h) for h in range(H)])  # (H, total, bs)
    keys = [jax.random.PRNGKey(seed + h) for h in range(H)]

    loss_parts = []
    spc = max(1, min(steps_per_call, total))
    done = 0
    while done < total:
        k = min(spc, total - done)
        chunk_idx = jnp.asarray(all_idx[:, done : done + k])  # (H, k, bs)
        subs = jnp.stack([jax.random.fold_in(kk, done) for kk in keys])
        state, loss_vec = fused(state, cam_all, images, sils, chunk_idx, subs)
        # keep losses on device: a per-call np.asarray would sync one relay
        # round-trip per program AND stall the async dispatch queue
        loss_parts.append(loss_vec[:, :k])
        done += k
        if log_every and done % max(log_every, spc) < spc:
            print(f"fused step {done}: losses={np.asarray(loss_vec)[:, k - 1].round(4).tolist()}")
    losses = np.concatenate(jax.device_get(loss_parts), axis=1)
    per_half = [jax.tree.map(lambda x: x[h], state) for h in range(H)]
    return per_half, losses


def train_nerf(
    images: jnp.ndarray,
    sils: jnp.ndarray,
    R_bop: jnp.ndarray,
    t_bop: jnp.ndarray,
    K: jnp.ndarray,
    field: fields.NerfField,
    render_cfg: RenderConfig = RenderConfig(),
    train_cfg: NerfTrainConfig = NerfTrainConfig(),
    n_steps: Optional[int] = None,
    seed: int = 1,
    depth_margin: float = 2.0,
    log_every: int = 0,
    steps_per_call: int = 25,
    on_checkpoint=None,
    init_params=None,
    resume_state: Optional[NerfTrainState] = None,
    mesh="auto",
):
    """Full training loop.  Images must already be masked crops in [0, 1]
    and t_bop already divided by diam/1.8 (trainNerfFine.py:95-101).

    Batches follow the reference's shuffled-epoch order
    (trainNerfFine.py:221-223); `steps_per_call` steps run inside one
    device program (lax.scan) to amortize dispatch.

    ``resume_state`` resumes EXACTLY (params + Adam moments + warmup step;
    the reference's .pth resume is params-only, which corrupts few-step
    warmup schedules): ``n_steps`` is the TOTAL step target, the loop runs
    from resume_state.step to n_steps with the identical batch/RNG
    schedule it would have used uninterrupted.

    ``mesh="auto"`` shards ray chunks over all local devices when more
    than one is present (params replicated, gradient psum over ICI);
    pass mesh=None to force single-device or an explicit Mesh to pin one.
    Returns (state, losses list).
    """
    if mesh == "auto":
        mesh = mesh_lib.auto_mesh()
    field = _kernel_safe_field(field, render_cfg, train_cfg, images, sils)
    S = images.shape[1]
    cam_all = cam_lib.camera_from_bop(jnp.asarray(R_bop), jnp.asarray(t_bop), jnp.asarray(K), S)
    min_d, max_d = depth_bounds(t_bop, depth_margin)

    key = jax.random.PRNGKey(seed)
    if resume_state is not None:
        state, tx = resume_state, make_optimizer(train_cfg)
    else:
        state, tx = init_state(field, train_cfg, key, init_params=init_params)
    multi = _cached_or_fresh(
        _multi_step_cached,
        lambda: make_multi_step(field, tx, render_cfg, train_cfg, min_d, max_d, mesh=mesh),
        field, render_cfg, train_cfg, min_d, max_d, mesh,
    )
    if mesh is not None:
        # replicate params/opt and the view bank; chunk constraints inside
        # the step shard the per-ray work over 'data'
        state = mesh_lib.replicate(state, mesh)
        cam_all = mesh_lib.replicate(cam_all, mesh)
        images = mesh_lib.replicate(jnp.asarray(images), mesh)
        sils = mesh_lib.replicate(jnp.asarray(sils), mesh)

    n = images.shape[0]
    bs = min(train_cfg.batch_size, n)
    rng = np.random.default_rng(seed)
    total = n_steps if n_steps is not None else train_cfg.n_epochs * max(n // bs, 1)

    # epoch-shuffled batch index schedule for the whole run
    all_idx = []
    while len(all_idx) < total:
        perm = rng.permutation(n)
        for i in range(max(n // bs, 1)):
            idx = perm[i * bs : i * bs + bs]
            if len(idx) < bs:
                idx = np.concatenate([idx, perm[: bs - len(idx)]])
            all_idx.append(idx)
    all_idx = np.stack(all_idx[:total])  # (total, bs)

    images = jnp.asarray(images)
    sils = jnp.asarray(sils)
    loss_parts = []
    spc = max(1, min(steps_per_call, total))
    done = int(np.asarray(jax.device_get(state.step)))
    while done < total:
        k = min(spc, total - done)
        # a short tail compiles one extra (smaller) program rather than
        # padding — padded extra steps would silently over-train past
        # n_steps and corrupt exact resume accounting
        chunk_idx = all_idx[done : done + k]
        # per-call key from the step index so a resumed run replays the
        # exact RNG stream the uninterrupted run would have used
        sub = jax.random.fold_in(key, done)
        state, loss_vec = multi(state, cam_all, images, sils, jnp.asarray(chunk_idx), sub)
        # device-side accumulation: per-call np.asarray would sync a relay
        # round-trip per program and stall the async dispatch queue
        loss_parts.append(loss_vec[:k])
        if log_every and (done // spc) % max(log_every // spc, 1) == 0:
            print(f"step {done + k}: loss={float(loss_vec[k - 1]):.4f}")
        done += k
        # periodic checkpoint hook, snapped to multi-step boundaries
        # (the reference saves 'latest' every 100 iters, trainNerfFine.py:227)
        if on_checkpoint is not None and (
            done % max(train_cfg.ckpt_every, spc) < spc or done >= total
        ):
            on_checkpoint(state, done)
    losses = (
        np.concatenate(jax.device_get(loss_parts)).tolist() if loss_parts else []
    )
    return state, losses


def extract_point_cloud(field: fields.NerfField, params, threshold: float = 0.03, grid_res: int = 128):
    """batched_forward_forPC equivalent (nerf.py:640-703): density on a
    grid_res^3 grid (device) + marching tetrahedra (host) -> world verts."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import mcubes

    grid = renderer.density_grid_cached(field, params, grid_res=grid_res)
    verts_idx, tris = mcubes.marching_tetrahedra(np.asarray(grid), threshold)
    verts = mcubes.index_to_world(verts_idx, grid_res, exact=True)
    return verts, tris
