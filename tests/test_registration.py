"""Registration finale: relative poses, agreement, ICP, Chamfer."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import rotations
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import registration


def rand_rot(rng, scale=1.0):
    return np.asarray(rotations.rotvec_to_matrix(jnp.asarray(rng.normal(size=3) * scale, jnp.float32)))


def test_relative_pose_tensor(rng):
    R = np.stack([rand_rot(rng) for _ in range(4)])
    t = rng.normal(size=(4, 3)).astype(np.float32)
    rel_R, rel_t = registration.relative_pose_tensor(jnp.asarray(R), jnp.asarray(t))
    for i in range(4):
        for j in range(4):
            np.testing.assert_allclose(np.asarray(rel_R[i, j]), R[i].T @ R[j], atol=1e-5)
            np.testing.assert_allclose(np.asarray(rel_t[i, j]), t[j] - t[i], atol=1e-6)


def test_agreement_matrix_and_choice(rng):
    N = 6
    R_gt = np.stack([rand_rot(rng) for _ in range(N)]).astype(np.float32)
    t_gt = rng.normal(size=(N, 3)).astype(np.float32) * 10
    # predictions: all correct except views 4, 5 (bad rotation)
    R_pr = R_gt.copy()
    t_pr = t_gt.copy()
    for bad in (4, 5):
        R_pr[bad] = rand_rot(rng) @ R_gt[bad]
    # asymmetric surface cloud (ADD-S saturates on symmetric/volumetric sets)
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic

    pts, ok = synthetic.analytic_surface_points(400, jax.random.PRNGKey(0))
    verts = (np.asarray(pts)[np.asarray(ok)][:256] * 33.0).astype(np.float32)
    # ADD-S saturates near the cloud's NN spacing (~4 units here); pick the
    # diameter so 0.1*diam sits below the bad-pose error (~4.5) and above
    # the good-pose error (~0)
    diameter = 30.0
    rel_R_gt, rel_t_gt = registration.relative_pose_tensor(jnp.asarray(R_gt), jnp.asarray(t_gt))
    rel_R_pr, rel_t_pr = registration.relative_pose_tensor(jnp.asarray(R_pr), jnp.asarray(t_pr))
    agree, errs = registration.agreement_matrix(
        rel_R_gt, rel_t_gt, rel_R_pr, rel_t_pr, jnp.asarray(verts), diameter, pair_chunk=12
    )
    agree = np.asarray(agree)
    # good views agree with each other
    assert agree[:4, :4].all()
    best, top = registration.choose_best_image(agree, top_k=4)
    assert best < 4
    assert set(top[:4]).issubset(set(range(6)))
    # bad views have fewer agreements
    sums = agree.sum(1)
    assert sums[4] < sums[0] and sums[5] < sums[0]


def test_icp_recovers_transform(rng):
    target = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    R_true = rand_rot(rng, 0.15)
    t_true = np.array([0.1, -0.05, 0.2], np.float32)
    # source = inverse-transformed target: x = R^T (target - t) as rows
    source = np.asarray((target - t_true) @ R_true)
    recon = source @ R_true.T + t_true
    np.testing.assert_allclose(recon, target, atol=1e-5)
    # start from a perturbed initial guess
    R0 = rand_rot(rng, 0.05) @ R_true
    t0 = t_true + rng.normal(size=3).astype(np.float32) * 0.05
    res = registration.icp_point_to_point(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(R0), jnp.asarray(t0),
        threshold=0.3, max_iters=30, chunk=512,
    )
    moved = source @ np.asarray(res.R).T + np.asarray(res.t)
    err = np.linalg.norm(moved - target, axis=-1).mean()
    assert err < 0.02, err
    assert float(res.fitness) > 0.95


def test_register_halves_end_to_end(rng):
    """Two half clouds of one sphere in different frames must merge to a
    full sphere with small Chamfer vs the CAD cloud."""
    d = rng.normal(size=(3000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    cad = (d * 30).astype(np.float32)  # sphere radius 30 "mm"
    lower = cad[cad[:, 2] < 5]
    upper_cad = cad[cad[:, 2] > -5]
    # chosen image GT pose (maps CAD frame -> camera frame)
    R_gt = rand_rot(rng)
    t_gt = np.array([5.0, -10.0, 300.0], np.float32)
    # upper cloud lives in its own (CAD-like) frame == cad frame here
    upper = upper_cad
    # predicted pose of the chosen image with small error
    R_pr = rand_rot(rng, 0.02) @ R_gt
    t_pr = t_gt + rng.normal(size=3).astype(np.float32) * 1.0
    out = registration.register_halves(
        upper, lower, R_gt, t_gt, R_pr, t_pr, cad, diameter=60.0,
        icp_threshold=20.0, icp_iters=20,
    )
    assert out["chamfer"] < 0.1 * 60.0, out["chamfer"]
    assert out["correct"]
    assert out["merged"].shape[0] == upper.shape[0] + lower.shape[0]


def test_verify_consecutive_identity(rng):
    cloud = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    N = 5
    R_gt = np.stack([rand_rot(rng) for _ in range(N)]).astype(np.float32)
    t_gt = rng.normal(size=(N, 3)).astype(np.float32)
    best, chams = registration.verify_consecutive(cloud, R_gt, t_gt, R_gt, t_gt)
    assert len(chams) == N - 1
