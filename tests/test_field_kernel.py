"""Fused Pallas field kernel vs the flax NerfField (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import field_kernel


def _setup(n_harmonic=8, n_hidden=32, R=7, P=5, seed=0, embed="direct"):
    cfg = FieldConfig(n_harmonic_functions=n_harmonic, n_hidden=n_hidden,
                      act_dtype="bfloat16", embed_method=embed)
    field = fields.NerfField(cfg)
    params = fields.init_field(field, jax.random.PRNGKey(seed))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    pts = jax.random.normal(k1, (R, P, 3)) * 0.5
    dirs = jax.random.normal(k2, (R, 3))
    return cfg, field, params, pts, dirs


def test_forward_matches_flax():
    cfg, field, params, pts, dirs = _setup()
    dens_k, rgb_k = field_kernel.field_color(params, pts, dirs, cfg,
                                             interpret=True)
    dens_f, rgb_f = field.apply(params, pts, dirs, "color")
    assert dens_k.shape == dens_f.shape and rgb_k.shape == rgb_f.shape
    np.testing.assert_allclose(np.asarray(dens_k), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_f),
                               atol=2e-2, rtol=2e-2)


def test_forward_pads_ragged_ray_count():
    # R not divisible by the ray tile exercises the pad/slice path
    cfg, field, params, pts, dirs = _setup(R=3, P=field_kernel._TILE_PTS // 2)
    dens_k, rgb_k = field_kernel.field_color(params, pts, dirs, cfg,
                                             interpret=True)
    dens_f, rgb_f = field.apply(params, pts, dirs, "color")
    np.testing.assert_allclose(np.asarray(dens_k), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_f),
                               atol=2e-2, rtol=2e-2)


def test_density_matches_flax():
    cfg, field, params, pts, _ = _setup()
    dens_k = field_kernel.field_density(params, pts, cfg, interpret=True)
    dens_f = field.apply(params, pts, method=field.density)
    assert dens_k.shape == dens_f.shape
    np.testing.assert_allclose(np.asarray(dens_k), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)


def test_density_ragged_and_flat_shapes(monkeypatch):
    # a non-tile-multiple flat cloud exercises the pad/slice path; a tiny
    # tile exercises multi-tile grids
    monkeypatch.setenv("FIELD_DENSITY_TILE", "16")
    field_kernel._make_dens_op.cache_clear()
    cfg, field, params, pts, _ = _setup(R=1, P=1)
    flat = jax.random.normal(jax.random.PRNGKey(7), (37, 3)) * 0.5
    dens_k = field_kernel.field_density(params, flat, cfg, interpret=True)
    dens_f = field.apply(params, flat, method=field.density)
    np.testing.assert_allclose(np.asarray(dens_k), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)
    field_kernel._make_dens_op.cache_clear()


def test_density_eval_fn_dispatch():
    cfg, field, params, pts, _ = _setup()
    # flax path on CPU (enabled() is False off-TPU)
    fn = field_kernel.density_eval_fn(field, params)
    dens = fn(pts)
    dens_f = field.apply(params, pts, method=field.density)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(dens_f))


def test_density_under_vmap():
    # surface_sampling vmaps the per-view eval over cameras
    cfg, field, params, pts, _ = _setup()
    batch = jnp.stack([pts, pts * 0.5])

    def per_view(p):
        return field_kernel.field_density(params, p, cfg, interpret=True)

    dens_v = jax.vmap(per_view)(batch)
    dens_f = field.apply(params, batch, method=field.density)
    np.testing.assert_allclose(np.asarray(dens_v), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)


def _loss_weights(mode_fn, params, pts, dirs):
    dens, rgb = mode_fn(params, pts, dirs)
    # mix both heads so every weight matrix gets a gradient
    return (jnp.sum(dens * 0.7) + jnp.sum(rgb * jnp.cos(rgb))) / pts.shape[0]


def test_gradients_match_flax():
    cfg, field, params, pts, dirs = _setup(R=6, P=9, seed=3)

    def loss_k(p):
        return _loss_weights(
            lambda p, x, d: field_kernel.field_color(p, x, d, cfg,
                                                     interpret=True),
            p, pts, dirs)

    def loss_f(p):
        return _loss_weights(
            lambda p, x, d: field.apply(p, x, d, "color"), p, pts, dirs)

    vk, gk = jax.value_and_grad(loss_k)(params)
    vf, gf = jax.value_and_grad(loss_f)(params)
    assert np.allclose(float(vk), float(vf), atol=2e-2, rtol=2e-2)
    flat_k = jax.tree_util.tree_leaves_with_path(gk)
    gf_flat = dict(jax.tree_util.tree_leaves_with_path(gf))
    checked = 0
    for path, leaf_k in flat_k:
        leaf_f = gf_flat[path]
        name = jax.tree_util.keystr(path)
        if "feature_layer" in name:
            # feature head is untouched by color mode: both must be zero
            assert float(jnp.abs(leaf_k).max()) == 0.0
            assert float(jnp.abs(leaf_f).max()) == 0.0
            continue
        scale = max(float(jnp.abs(leaf_f).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(leaf_k, np.float32) / scale,
            np.asarray(leaf_f, np.float32) / scale,
            atol=3e-2, err_msg=name)
        checked += 1
    assert checked >= 10  # trunk1/2, density, color1/2 kernels + biases


def test_no_gradient_to_points():
    cfg, field, params, pts, dirs = _setup(R=4, P=6)

    def loss(pts, dirs):
        dens, rgb = field_kernel.field_color(params, pts, dirs, cfg,
                                             interpret=True)
        return jnp.sum(dens) + jnp.sum(rgb)

    gp, gd = jax.grad(loss, argnums=(0, 1))(pts, dirs)
    assert float(jnp.abs(gp).max()) == 0.0
    assert float(jnp.abs(gd).max()) == 0.0


def test_vmapped_over_halves():
    """The fused trainer vmaps the step over the half axis."""
    cfg, field, p0, pts, dirs = _setup(R=6, P=9, seed=0)
    p1 = fields.init_field(field, jax.random.PRNGKey(9))
    params = jax.tree.map(lambda *x: jnp.stack(x), p0, p1)
    pts2 = jnp.stack([pts, pts * 0.5 + 0.1])
    dirs2 = jnp.stack([dirs, dirs[::-1]])

    def one(p, x, d):
        return _loss_weights(
            lambda p, x, d: field_kernel.field_color(p, x, d, cfg,
                                                     interpret=True),
            p, x, d)

    def loss(params):
        return jax.vmap(one)(params, pts2, dirs2).sum()

    g = jax.grad(loss)(params)
    # per-half grads must equal the unbatched computation's
    for h, (ph, xh, dh) in enumerate(((p0, pts, dirs),
                                      (p1, pts2[1], dirs2[1]))):
        g_ref = jax.grad(lambda p: one(p, xh, dh))(ph)
        for (path, lk), (_, lr) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.tree.map(lambda x: x[h], g)),
            jax.tree_util.tree_leaves_with_path(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(lk, np.float32), np.asarray(lr, np.float32),
                atol=1e-4, err_msg=f"half {h} {jax.tree_util.keystr(path)}")


def test_under_scan_and_remat():
    cfg, field, params, pts, dirs = _setup(R=6, P=9)

    def step(p):
        dens, rgb = field_kernel.field_color(p, pts, dirs, cfg,
                                             interpret=True)
        return jnp.sum(rgb) + jnp.sum(dens)

    def loss(p):
        def body(c, _):
            return c + jax.checkpoint(step)(p), None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=3)
        return out

    g = jax.grad(loss)(params)
    # NOTE: grad(3*step) would push a 3.0 cotangent through the kernel's
    # bf16 casts (round(3x) != 3*round(x)); scale outside the graph instead
    g_ref = jax.tree.map(lambda x: 3.0 * x, jax.grad(step)(params))
    for (path, lk), (_, lr) in zip(
        jax.tree_util.tree_leaves_with_path(g),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(lk, np.float32), np.asarray(lr, np.float32),
            atol=1e-4, err_msg=jax.tree_util.keystr(path))


def test_shard_map_over_ray_axis():
    """The multi-device integration: kernel under shard_map (rays sharded,
    params replicated) must match the single-device kernel, including
    gradients (the AD transpose inserts the param-grad psum)."""
    from jax.sharding import PartitionSpec as P

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = mesh_lib.make_mesh(8)
    cfg, field, params, pts, dirs = _setup(R=16, P=6, seed=1)

    kfn = lambda p, x, d: field_kernel.field_color(p, x, d, cfg, interpret=True)
    sfn = jax.shard_map(
        kfn, mesh=mesh,
        in_specs=(P(), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
        out_specs=(P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
        check_vma=False,  # pallas out_shapes carry no vma info
    )

    def loss(fn, p):
        dens, rgb = fn(p, pts, dirs)
        return jnp.sum(dens * 0.5) + jnp.sum(rgb * jnp.sin(rgb))

    v1, g1 = jax.value_and_grad(lambda p: loss(kfn, p))(params)
    v8, g8 = jax.value_and_grad(lambda p: loss(sfn, p))(params)
    np.testing.assert_allclose(float(v1), float(v8), rtol=1e-5)
    for (path, l1), (_, l8) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l8, np.float32),
            atol=1e-5, err_msg=jax.tree_util.keystr(path))


def test_gradients_with_ragged_ray_count():
    """op_bwd's cotangent-padding branch (R % ray_tile != 0): gradients
    through padded tiles must equal a computation where the rays fit the
    tile exactly (pad rows contribute exactly zero to every param grad)."""
    # P chosen so rt = _TILE_PTS // P > 1 and R % rt != 0
    P = field_kernel._TILE_PTS // 2
    cfg, field, params, pts, dirs = _setup(R=3, P=P, seed=5)

    def loss_at(pts, dirs):
        def loss(p):
            dens, rgb = field_kernel.field_color(p, pts, dirs, cfg,
                                                 interpret=True)
            return jnp.sum(dens) + jnp.sum(rgb * jnp.cos(rgb))
        return jax.grad(loss)(params)

    g_ragged = loss_at(pts, dirs)             # R=3, rt=2 -> padded to 4
    # same rays duplicated to R=6 (divisible), then halve the grads
    g_even = jax.tree.map(
        lambda x: 0.5 * x,
        loss_at(jnp.concatenate([pts, pts]), jnp.concatenate([dirs, dirs])),
    )
    for (path, lr), (_, le) in zip(
        jax.tree_util.tree_leaves_with_path(g_ragged),
        jax.tree_util.tree_leaves_with_path(g_even),
    ):
        np.testing.assert_allclose(
            np.asarray(lr, np.float32), np.asarray(le, np.float32),
            atol=1e-4, err_msg=jax.tree_util.keystr(path))


# ------------------------------------------ fused bundle-loss kernel


def _ref_bundle(field, cfg, hs, scale):
    """Flax reference of what the fused loss kernel computes: field fwd ->
    EA composite -> huber color/sil loss (train/nerf_trainer.py loss_fn)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch

    def loss(p, pts, dirs, col, sil, valid):
        dens, rgb = field.apply(p, pts, dirs, "color")
        img, w = raymarch.composite(dens[..., 0], rgb)
        ce = raymarch.huber(img[..., :-1], col, hs).mean(-1)
        se = raymarch.huber(img[..., -1:], sil, hs).mean(-1)
        v = valid[:, 0]
        total = scale * ((ce + se) * v).sum()
        return total, (w, (ce * v).sum(), (se * v).sum())

    return loss


def _bundle_setup(R=6, P=9, seed=3, embed="direct"):
    cfg, field, params, pts, dirs = _setup(R=R, P=P, seed=seed, embed=embed)
    k = jax.random.PRNGKey(seed + 17)
    k1, k2 = jax.random.split(k)
    col = jax.random.uniform(k1, (R, 3))
    sil = (jax.random.uniform(k2, (R, 1)) > 0.5).astype(jnp.float32)
    valid = jnp.ones((R, 1))
    return cfg, field, params, pts, dirs, col, sil, valid


def _assert_grads_close(gk, gf, atol=3e-2):
    gf_flat = dict(jax.tree_util.tree_leaves_with_path(gf))
    checked = 0
    for path, leaf_k in jax.tree_util.tree_leaves_with_path(gk):
        leaf_f = gf_flat[path]
        name = jax.tree_util.keystr(path)
        if "feature_layer" in name:
            assert float(jnp.abs(leaf_k).max()) == 0.0
            continue
        s = max(float(jnp.abs(leaf_f).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(leaf_k, np.float32) / s,
            np.asarray(leaf_f, np.float32) / s,
            atol=atol, err_msg=name)
        checked += 1
    assert checked >= 10


def test_bundle_loss_grads_match_flax():
    hs, scale = 0.1, 500.0 / 6
    cfg, field, params, pts, dirs, col, sil, valid = _bundle_setup()
    gk, (ce_k, se_k), w_k = field_kernel.bundle_loss_grads(
        params, pts, dirs, col, sil, valid, cfg, huber_scaling=hs,
        scale=scale, want_weights=True, interpret=True)
    ref = _ref_bundle(field, cfg, hs, scale)
    (_, (w_f, ce_f, se_f)), gf = jax.value_and_grad(ref, has_aux=True)(
        params, pts, dirs, col, sil, valid)
    np.testing.assert_allclose(float(ce_k), float(ce_f), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(float(se_k), float(se_f), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_f),
                               atol=2e-2, rtol=2e-2)
    _assert_grads_close(gk, gf)


def test_bundle_loss_ragged_rays_and_zero_valid():
    """R not divisible by the ray tile: padded rows must contribute nothing;
    explicit valid=0 rows must also be ignored."""
    hs, scale = 0.1, 10.0
    R = 5
    cfg, field, params, pts, dirs, col, sil, valid = _bundle_setup(
        R=R, P=field_kernel._TILE_PTS // 2, seed=5)
    valid = valid.at[3:].set(0.0)
    gk, (ce_k, se_k), w_k = field_kernel.bundle_loss_grads(
        params, pts, dirs, col, sil, valid, cfg, huber_scaling=hs,
        scale=scale, want_weights=True, interpret=True)
    ref = _ref_bundle(field, cfg, hs, scale)
    (_, (w_f, ce_f, se_f)), gf = jax.value_and_grad(ref, has_aux=True)(
        params, pts, dirs, col, sil, valid)
    assert w_k.shape == (R, pts.shape[1])
    np.testing.assert_allclose(float(ce_k), float(ce_f), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(float(se_k), float(se_f), atol=2e-2, rtol=2e-2)
    _assert_grads_close(gk, gf)


def test_bundle_loss_vmapped_over_halves():
    """The fused trainer vmaps the whole step over the half axis; per-half
    grads/losses must equal the unbatched call's."""
    hs, scale = 0.1, 500.0 / 6
    cfg, field, p0, pts, dirs, col, sil, valid = _bundle_setup(seed=0)
    p1 = fields.init_field(field, jax.random.PRNGKey(9))
    params = jax.tree.map(lambda *x: jnp.stack(x), p0, p1)
    pts2 = jnp.stack([pts, pts * 0.5 + 0.1])
    dirs2 = jnp.stack([dirs, dirs[::-1]])
    col2 = jnp.stack([col, col[::-1]])
    sil2 = jnp.stack([sil, 1.0 - sil])
    val2 = jnp.stack([valid, valid])

    def one(p, x, d, c, s, v):
        return field_kernel.bundle_loss_grads(
            p, x, d, c, s, v, cfg, huber_scaling=hs, scale=scale,
            want_weights=True, interpret=True)

    g, (ce, se), w = jax.vmap(one)(params, pts2, dirs2, col2, sil2, val2)
    for h in range(2):
        ph = jax.tree.map(lambda x: x[h], params)
        g_ref, (ce_r, se_r), w_ref = one(
            ph, pts2[h], dirs2[h], col2[h], sil2[h], val2[h])
        np.testing.assert_allclose(float(ce[h]), float(ce_r), atol=1e-5)
        np.testing.assert_allclose(float(se[h]), float(se_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w[h]), np.asarray(w_ref),
                                   atol=1e-6)
        for (path, lk), (_, lr) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.tree.map(lambda x: x[h], g)),
            jax.tree_util.tree_leaves_with_path(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(lk, np.float32), np.asarray(lr, np.float32),
                atol=1e-4, err_msg=f"half {h} {jax.tree_util.keystr(path)}")


# --------------------------------------- grouped double-angle embedding


def test_grouped_forward_matches_flax():
    """embed_method='grouped': the kernel's rung-major ladder + permuted
    weight rows must reproduce the flax grouped path (H=8 -> L=4, G=2)."""
    cfg, field, params, pts, dirs = _setup(embed="grouped")
    dens_k, rgb_k = field_kernel.field_color(params, pts, dirs, cfg,
                                             interpret=True)
    dens_f, rgb_f = field.apply(params, pts, dirs, "color")
    np.testing.assert_allclose(np.asarray(dens_k), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_f),
                               atol=2e-2, rtol=2e-2)


def test_grouped_density_matches_flax():
    cfg, field, params, pts, _ = _setup(embed="grouped")
    dens_k = field_kernel.field_density(params, pts, cfg, interpret=True)
    dens_f = field.apply(params, pts, method=field.density)
    np.testing.assert_allclose(np.asarray(dens_k), np.asarray(dens_f),
                               atol=2e-2, rtol=2e-2)


def test_grouped_gradients_match_flax():
    """The weight-row gather in _split_weights must round-trip grads on the
    custom-VJP path (autodiff scatters them back to flax row order)."""
    cfg, field, params, pts, dirs = _setup(R=6, P=9, seed=3, embed="grouped")

    def loss_k(p):
        return _loss_weights(
            lambda p, x, d: field_kernel.field_color(p, x, d, cfg,
                                                     interpret=True),
            p, pts, dirs)

    def loss_f(p):
        return _loss_weights(
            lambda p, x, d: field.apply(p, x, d, "color"), p, pts, dirs)

    vk, gk = jax.value_and_grad(loss_k)(params)
    vf, gf = jax.value_and_grad(loss_f)(params)
    assert np.allclose(float(vk), float(vf), atol=2e-2, rtol=2e-2)
    _assert_grads_close(gk, gf)


def test_grouped_bundle_loss_matches_flax():
    """Fused loss kernel under the grouped embedding: losses, weights and
    the explicitly un-permuted grad rows must match the flax reference."""
    hs, scale = 0.1, 500.0 / 6
    cfg, field, params, pts, dirs, col, sil, valid = _bundle_setup(
        embed="grouped")
    gk, (ce_k, se_k), w_k = field_kernel.bundle_loss_grads(
        params, pts, dirs, col, sil, valid, cfg, huber_scaling=hs,
        scale=scale, want_weights=True, interpret=True)
    ref = _ref_bundle(field, cfg, hs, scale)
    (_, (w_f, ce_f, se_f)), gf = jax.value_and_grad(ref, has_aux=True)(
        params, pts, dirs, col, sil, valid)
    np.testing.assert_allclose(float(ce_k), float(ce_f), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(float(se_k), float(se_f), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_f),
                               atol=2e-2, rtol=2e-2)
    _assert_grads_close(gk, gf)


def test_ladder_perm_is_a_permutation():
    perm = field_kernel._ladder_perm(60, 6)
    assert sorted(perm.tolist()) == list(range(180))
    # base rungs (l=0) map to the direct columns f = g*L
    G = 10
    for d in range(3):
        for g in range(G):
            assert perm[d * G + g] == d * 60 + g * 6
