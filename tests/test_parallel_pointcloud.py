"""Mesh-sharded point-cloud NN (SURVEY §2c "sharded point-cloud tiles",
VERDICT r2 #4): nn_query / chamfer / ICP / agreement-matrix results on the
8-device mesh must match the single-device kernels."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import registration

MESH = mesh_lib.make_mesh(8)
RNG = np.random.default_rng(0)


def _cloud(n, scale=1.0, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, 3)) * scale, jnp.float32
    )


def test_nn_query_sharded_matches_single():
    q = _cloud(1003, seed=1)  # deliberately not divisible by 8
    ref = _cloud(517, seed=2)
    d0, i0 = pc.nn_query(q, ref)
    d1, i1 = pc.nn_query(q, ref, mesh=MESH)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))


def test_nn_query_sharded_respects_mask():
    q = _cloud(64, seed=3)
    ref = _cloud(40, seed=4)
    mask = jnp.asarray(np.arange(40) < 20)
    _, i1 = pc.nn_query(q, ref, ref_mask=mask, mesh=MESH)
    assert int(np.asarray(i1).max()) < 20


def test_chamfer_sharded_matches_single():
    a = _cloud(900, seed=5)
    b = _cloud(700, seed=6)
    c0 = float(pc.chamfer_distance(a, b))
    c1 = float(pc.chamfer_distance(a, b, mesh=MESH))
    np.testing.assert_allclose(c1, c0, rtol=1e-5)


def test_icp_sharded_matches_single():
    src = _cloud(600, seed=7)
    ang = 0.2
    R_true = jnp.asarray(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        jnp.float32,
    )
    t_true = jnp.asarray([0.05, -0.03, 0.08], jnp.float32)
    tgt = src @ R_true.T + t_true
    res0 = registration.icp_point_to_point(
        src, tgt, jnp.eye(3), jnp.zeros(3), threshold=1.0, max_iters=15
    )
    res1 = registration.icp_point_to_point(
        src, tgt, jnp.eye(3), jnp.zeros(3), threshold=1.0, max_iters=15, mesh=MESH
    )
    np.testing.assert_allclose(np.asarray(res1.R), np.asarray(res0.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res1.t), np.asarray(res0.t), atol=1e-4)
    # and both recover the true transform
    np.testing.assert_allclose(np.asarray(res1.R), np.asarray(R_true), atol=1e-3)


def test_agreement_matrix_sharded_matches_single():
    n = 6
    rng = np.random.default_rng(8)
    R = np.stack([np.linalg.qr(rng.normal(size=(3, 3)))[0] for _ in range(n)])
    R = R * np.sign(np.linalg.det(R))[:, None, None]
    t = rng.normal(size=(n, 3)).astype(np.float32)
    verts = np.asarray(_cloud(128, seed=9))
    Rp = R + rng.normal(size=R.shape) * 0.01
    rel_Rg, rel_tg = registration.relative_pose_tensor(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    rel_Rp, rel_tp = registration.relative_pose_tensor(
        jnp.asarray(Rp, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    args = (rel_Rg, rel_tg, rel_Rp, rel_tp, jnp.asarray(verts), 1.0)
    agree0, errs0 = registration.agreement_matrix(*args, pair_chunk=16)
    agree1, errs1 = registration.agreement_matrix(*args, pair_chunk=16, mesh=MESH)
    # sharded matmul accumulation order differs -> fp-level deviation only
    np.testing.assert_allclose(np.asarray(errs1), np.asarray(errs0), rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(agree1), np.asarray(agree0))


def test_register_halves_auto_mesh_runs():
    """register_halves(mesh='auto') on the 8-device CPU harness exercises
    the sharded ICP + Chamfer path end to end."""
    rng = np.random.default_rng(10)
    cad = rng.normal(size=(800, 3)).astype(np.float32)
    upper = cad[:400] + rng.normal(size=(400, 3)).astype(np.float32) * 1e-3
    lower = cad[400:]
    out = registration.register_halves(
        upper, lower, np.eye(3), np.zeros(3), np.eye(3), np.zeros(3),
        cad, diameter=4.0, icp_threshold=0.5, icp_iters=5,
    )
    assert np.isfinite(out["chamfer"])
    assert out["merged"].shape[0] == 800
