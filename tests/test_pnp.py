"""P3P / RANSAC-PnP vs synthetic projections (SURVEY.md hard part #2)."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import rotvec_to_matrix
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pnp

K = np.array([[320.0, 0, 112], [0, 330.0, 116], [0, 0, 1]])


def make_pose(rng):
    rv = rng.normal(size=3) * 0.6
    R = np.asarray(rotvec_to_matrix(jnp.asarray(rv, jnp.float32)))
    t = np.array([0.05, -0.08, 0.9]) + rng.normal(size=3) * 0.05
    return R, t


def project(R, t, pts):
    xc = pts @ R.T + t
    return (xc[:, :2] * K[[0, 1], [0, 1]] / xc[:, 2:3]) + K[[0, 1], [2, 2]]


def test_p3p_recovers_pose(rng):
    for trial in range(5):
        R, t = make_pose(rng)
        pts = rng.uniform(-0.2, 0.2, size=(3, 3))
        p2d = project(R, t, pts)
        Rs, ts, valid = pnp.p3p_grunert(jnp.asarray(pts, jnp.float32), pnp.bearings(jnp.asarray(p2d, jnp.float32), jnp.asarray(K, jnp.float32)))
        Rs, ts, valid = np.asarray(Rs), np.asarray(ts), np.asarray(valid)
        errs = [
            np.linalg.norm(Rs[i] - R) + np.linalg.norm(ts[i] - t)
            for i in range(4)
            if valid[i]
        ]
        assert errs, "no valid P3P solution"
        assert min(errs) < 0.05, (trial, min(errs))


def test_ransac_pnp_clean(rng):
    R, t = make_pose(rng)
    pts = rng.uniform(-0.25, 0.25, size=(200, 3)).astype(np.float32)
    p2d = project(R, t, pts).astype(np.float32)
    res = pnp.ransac_pnp(jnp.asarray(pts), jnp.asarray(p2d), jnp.asarray(K, jnp.float32), jax.random.PRNGKey(0), n_hyp=64)
    assert bool(res.success)
    assert np.linalg.norm(np.asarray(res.R) - R) < 2e-2
    assert np.linalg.norm(np.asarray(res.t) - t) < 2e-2
    assert int(res.n_inliers) > 190


def test_ransac_pnp_with_outliers(rng):
    R, t = make_pose(rng)
    pts = rng.uniform(-0.25, 0.25, size=(300, 3)).astype(np.float32)
    p2d = project(R, t, pts).astype(np.float32)
    # corrupt 40% with random pixels
    n_out = 120
    p2d[:n_out] = rng.uniform(0, 224, size=(n_out, 2))
    res = pnp.ransac_pnp(jnp.asarray(pts), jnp.asarray(p2d), jnp.asarray(K, jnp.float32), jax.random.PRNGKey(1), n_hyp=256)
    assert bool(res.success)
    assert np.linalg.norm(np.asarray(res.R) - R) < 5e-2, np.asarray(res.R) - R
    assert np.linalg.norm(np.asarray(res.t) - t) < 5e-2
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9  # true correspondences kept
    assert inl[:n_out].mean() < 0.1  # outliers rejected


def test_ransac_pnp_noisy_refinement(rng):
    R, t = make_pose(rng)
    pts = rng.uniform(-0.25, 0.25, size=(400, 3)).astype(np.float32)
    p2d = project(R, t, pts) + rng.normal(size=(400, 2)) * 0.5
    res = pnp.ransac_pnp(
        jnp.asarray(pts), jnp.asarray(p2d.astype(np.float32)), jnp.asarray(K, jnp.float32),
        jax.random.PRNGKey(2), n_hyp=256, reproj_err=2.0,
    )
    assert bool(res.success)
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.02


def test_solve_p3p_batch_shapes(rng):
    R, t = make_pose(rng)
    pts = rng.uniform(-0.2, 0.2, size=(8, 3, 3)).astype(np.float32)
    p2d = np.stack([project(R, t, p) for p in pts]).astype(np.float32)
    Rs, ts, valid = pnp.solve_p3p_batch(jnp.asarray(pts), jnp.asarray(p2d), jnp.asarray(K, jnp.float32))
    assert Rs.shape == (8, 4, 3, 3) and ts.shape == (8, 4, 3) and valid.shape == (8, 4)
    assert bool(valid.any(axis=1).all())
