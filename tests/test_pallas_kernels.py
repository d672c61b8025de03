"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pallas_kernels as pk
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud, similarity


def test_correspondence_argmax_matches_xla(rng):
    q = jnp.asarray(rng.normal(size=(300, 12)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5000, 12)), jnp.float32)
    idx_p, conf_p = pk.correspondence_argmax(q, k, tile_n=128, tile_m=1024, interpret=True)
    idx_x, conf_x = similarity.correspondence_argmax(q, k)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(conf_p), np.asarray(conf_x), atol=1e-3)


def test_correspondence_argmax_unaligned_sizes(rng):
    q = jnp.asarray(rng.normal(size=(37, 12)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1234, 12)), jnp.float32)
    idx_p, conf_p = pk.correspondence_argmax(q, k, tile_n=64, tile_m=512, interpret=True)
    logits = np.asarray(q) @ np.asarray(k).T
    np.testing.assert_array_equal(np.asarray(idx_p), logits.argmax(-1))


def test_nn_min_matches_bruteforce(rng):
    q = jnp.asarray(rng.normal(size=(200, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(3333, 3)), jnp.float32)
    d_p, i_p = pk.nn_min(q, r, tile_n=128, tile_m=512, interpret=True)
    D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(r)[None], axis=-1)
    np.testing.assert_allclose(np.asarray(d_p), D.min(-1), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(i_p), D.argmin(-1))


def test_nn_min_respects_mask(rng):
    q = jnp.zeros((8, 3))
    r = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    mask = jnp.arange(64) >= 32
    d_p, i_p = pk.nn_min(q, r, ref_mask=mask, tile_n=8, tile_m=32, interpret=True)
    assert (np.asarray(i_p) >= 32).all()


def test_chamfer_matches_xla(rng):
    a = jnp.asarray(rng.normal(size=(500, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(700, 3)), jnp.float32)
    c_p = float(pk.chamfer_distance(a, b, interpret=True))
    c_x = float(pointcloud.chamfer_distance(a, b))
    np.testing.assert_allclose(c_p, c_x, rtol=1e-4)
