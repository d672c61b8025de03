"""Point-cloud op tests vs brute force / analytic references."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc


def test_nn_query_matches_bruteforce(rng):
    q = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(333, 3)), jnp.float32)
    d, i = pc.nn_query(q, r, chunk=64)
    D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(r)[None], axis=-1)
    np.testing.assert_allclose(np.asarray(d), D.min(-1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), D.argmin(-1))


def test_nn_query_respects_mask(rng):
    q = jnp.zeros((1, 3))
    r = jnp.asarray([[0.1, 0, 0], [1.0, 0, 0]])
    mask = jnp.asarray([False, True])
    d, i = pc.nn_query(q, r, ref_mask=mask, chunk=2)
    assert int(i[0]) == 1


def test_chamfer_identical_clouds_zero(rng):
    a = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    assert float(pc.chamfer_distance(a, a, chunk=32)) < 1e-5


def test_chamfer_known_offset():
    a = jnp.zeros((10, 3))
    b = jnp.zeros((10, 3)).at[:, 0].set(1.0)
    np.testing.assert_allclose(float(pc.chamfer_distance(a, b, chunk=16)), 1.0, atol=1e-6)


def test_knn_matches_bruteforce(rng):
    q = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(123, 3)), jnp.float32)
    d, i = pc.knn(q, r, k=5, chunk=32)
    D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(r)[None], axis=-1)
    expect_i = np.argsort(D, axis=-1)[:, :5]
    expect_d = np.sort(D, axis=-1)[:, :5]
    np.testing.assert_allclose(np.sort(np.asarray(d), -1), expect_d, atol=1e-4)
    # index sets equal (order may differ on ties)
    assert all(set(np.asarray(i)[j]) == set(expect_i[j]) for j in range(40))


def test_fps_spreads_points(rng):
    # 2 clusters: fps with K=2 must pick one from each
    a = rng.normal(size=(50, 3)) * 0.01
    b = rng.normal(size=(50, 3)) * 0.01 + 5.0
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    idx = pc.farthest_point_sampling(pts, 2)
    picked = np.asarray(pts)[np.asarray(idx)]
    assert np.linalg.norm(picked[0] - picked[1]) > 4.0


def test_fps_unique_indices(rng):
    pts = jnp.asarray(rng.normal(size=(200, 3)), jnp.float32)
    idx = np.asarray(pc.farthest_point_sampling(pts, 50))
    assert len(np.unique(idx)) == 50


def test_fps_blocked_matches_single_program(rng, monkeypatch):
    # host-blocked decomposition (FPS_BLOCK programs) is bit-identical to
    # one monolithic program: same op sequence, just partitioned
    pts = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(300,)) > 0.2)
    monkeypatch.setenv("FPS_BLOCK", "100000")  # single block
    ref = np.asarray(pc.farthest_point_sampling(pts, 64, mask))
    monkeypatch.setenv("FPS_BLOCK", "7")  # 9 blocks + trimmed tail
    blk = np.asarray(pc.farthest_point_sampling(pts, 64, mask))
    np.testing.assert_array_equal(ref, blk)


def test_fps_single_sample(rng):
    pts = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    idx = np.asarray(pc.farthest_point_sampling(pts, 1))
    assert idx.shape == (1,)
    assert idx[0] == 0


def test_radius_outlier_removes_isolated(rng):
    cluster = rng.normal(size=(100, 3)) * 0.05
    outliers = np.array([[5.0, 5, 5], [-4, 4, 4]])
    pts = jnp.asarray(np.concatenate([cluster, outliers]), jnp.float32)
    keep = np.asarray(pc.radius_outlier_mask(pts, nb_points=5, radius=0.3, chunk=64))
    assert keep[:100].mean() > 0.95
    assert not keep[100:].any()


def test_normals_on_plane(rng):
    # points on z=0 plane -> normals along +-z
    xy = rng.uniform(-1, 1, size=(200, 2))
    pts = jnp.asarray(np.concatenate([xy, np.zeros((200, 1))], -1), jnp.float32)
    n = np.asarray(pc.estimate_normals(pts, k=16))
    assert np.abs(n[:, 2]).min() > 0.99


def test_subsample_surface_normals_outward(rng):
    # sphere: outward normals align with radial direction
    d = rng.normal(size=(2000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = jnp.asarray(d, jnp.float32)
    sub, normals, idx = pc.subsample_surface(pts, 200, normals_k=32)
    sub, normals = np.asarray(sub), np.asarray(normals)
    radial = sub / np.linalg.norm(sub, axis=-1, keepdims=True)
    cos = np.sum(normals * radial, axis=-1)
    assert np.median(cos) > 0.95
