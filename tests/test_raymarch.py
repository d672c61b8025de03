"""Unit tests for EA compositing / importance sampling vs closed forms."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch


def test_shifted_cumprod_matches_reference_semantics():
    x = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    out = raymarch.shifted_cumprod(x, shift=1)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 0.5, 0.25, 0.125]], atol=1e-7)


def test_ea_weights_opaque_slab():
    # density 1 at sample k: all weight lands there, nothing behind.
    dens = jnp.zeros((1, 8)).at[0, 3].set(1.0)
    w = raymarch.ea_weights(dens)
    expect = np.zeros((1, 8))
    expect[0, 3] = 1.0
    np.testing.assert_allclose(np.asarray(w), expect, atol=1e-6)


def test_ea_weights_sum_to_opacity():
    rng = np.random.default_rng(0)
    dens = jnp.asarray(rng.uniform(0, 1, size=(16, 32)))
    img, w = raymarch.composite(dens, jnp.ones((16, 32, 3)))
    opacity = np.asarray(img[..., -1])
    # For features == 1 the composited feature equals sum of weights which
    # equals opacity up to eps terms.
    np.testing.assert_allclose(np.asarray(img[..., 0]), opacity, atol=1e-4)


def test_threshold_mode_binarizes():
    dens = jnp.asarray([[0.1, 0.3, 0.05, 0.9]])
    img, w = raymarch.composite(dens, jnp.ones((1, 4, 1)), threshold_mode=True, threshold=0.2)
    # binarized: [0,1,0,1] -> weights [0,1,0,0]
    np.testing.assert_allclose(np.asarray(w), [[0, 1, 0, 0]], atol=1e-6)


def test_weight_mode_keeps_argmax_weight():
    dens = jnp.asarray([[0.3, 0.6, 0.9, 0.3]])
    new = raymarch.weight_mode_densities(dens, threshold=0.5)
    # weights of raw: [0.3, 0.6*0.7, 0.9*0.7*0.4, ...] -> argmax at idx 1
    w = raymarch.ea_weights(dens)
    argmax = int(np.argmax(np.asarray(w)))
    expect = np.zeros((1, 4))
    if float(dens[0, argmax]) > 0.5:
        expect[0, argmax] = 1.0
    np.testing.assert_allclose(np.asarray(new), expect, atol=1e-6)


def test_back_weights_peak_on_back_surface():
    # two-surface slab: entering at 2, leaving at 5 (binary density 2..5)
    dens = jnp.zeros((1, 8)).at[0, 2:6].set(1.0)
    wf = raymarch.ea_weights(dens)
    wb = raymarch.back_weights(dens)
    assert int(np.argmax(np.asarray(wf))) == 2
    assert int(np.argmax(np.asarray(wb))) == 5


def test_surface_points():
    origins = jnp.asarray([[0.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    lengths = jnp.linspace(1.0, 4.0, 4)[None]
    weights = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])
    pts = raymarch.surface_points(origins, dirs, lengths, weights)
    np.testing.assert_allclose(np.asarray(pts), [[0, 0, 2.0]], atol=1e-6)


def test_sample_pdf_concentrates_on_peak():
    # weights peaked in bin [0.45, 0.55] -> samples should land there
    bins = jnp.linspace(0.0, 1.0, 65)[None].repeat(4, 0)
    w = np.full((4, 64), 1e-4)
    w[:, 30:34] = 1.0
    z = raymarch.sample_pdf(bins, jnp.asarray(w), 128, jax.random.PRNGKey(0))
    z = np.asarray(z)
    frac_in_peak = ((z > 30 / 64) & (z < 34 / 64)).mean()
    assert frac_in_peak > 0.9
    assert z.shape == (4, 128)


def test_sample_pdf_deterministic_sorted():
    bins = jnp.linspace(2.0, 6.0, 17)[None]
    w = jnp.ones((1, 16))
    z = raymarch.sample_pdf(bins, w, 32, None, det=True)
    z = np.asarray(z)[0]
    assert (np.diff(z) >= -1e-6).all()
    assert z.min() >= 2.0 and z.max() <= 6.0


def test_importance_resample_shapes_and_sorted():
    lengths = jnp.linspace(2.0, 6.0, 64)[None].repeat(3, 0)
    w = jnp.ones((3, 64))
    z = raymarch.importance_resample(lengths, w, 256, jax.random.PRNGKey(1), add_input_samples=True)
    assert z.shape == (3, 320)
    assert (np.diff(np.asarray(z), axis=-1) >= -1e-6).all()


def test_huber_matches_reference_formula():
    x = jnp.asarray([0.0, 0.5, 1.0])
    y = jnp.asarray([0.0, 0.0, 0.0])
    out = np.asarray(raymarch.huber(x, y, scaling=0.1))
    diff_sq = np.asarray([0.0, 0.25, 1.0])
    expect = (np.sqrt(np.clip(1 + diff_sq / 0.01, 1e-4, None)) - 1) * 0.1
    np.testing.assert_allclose(out, expect, atol=1e-6)
