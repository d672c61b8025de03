"""Golden tests for the camera conventions (SURVEY.md hard part #1).

We verify against hand-computed OpenCV-convention projections: the BOP
ground truth is column-convention x_cam = R x + t with pixel
x = fx*Xc/Zc + cx.  After the reference's convention transform
(trainNerfFine.py:91-94) our Camera must reproduce the same pixels and
cast rays that pass through the original 3D points.
"""

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras, rotations


def make_bop_camera(rng, S=200):
    # random-ish but well-conditioned pose looking at origin from +z ~ 5
    rv = rng.normal(size=3) * 0.3
    R = np.asarray(rotations.rotvec_to_matrix(jnp.asarray(rv)))
    t = np.array([0.1, -0.2, 5.0])
    fx, fy = 300.0, 310.0
    cx, cy = S / 2 + 3.0, S / 2 - 4.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    return R, t, K


def opencv_project(R, t, K, pts):
    xc = pts @ R.T + t
    return (xc[:, :2] * K[[0, 1], [0, 1]] / xc[:, 2:3]) + K[[0, 1], [2, 2]], xc[:, 2]


def test_projection_matches_opencv(rng):
    S = 200
    R, t, K = make_bop_camera(rng, S)
    cam = cameras.camera_from_bop(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K), S)
    pts = rng.normal(size=(50, 3)) * 0.5
    pix_cv, z_cv = opencv_project(R, t, K, pts)
    xy_ndc, z = cameras.project_points(cam, jnp.asarray(pts, jnp.float32))
    pix_ours = np.asarray(cameras.ndc_to_pixel(xy_ndc, S))
    np.testing.assert_allclose(pix_ours, pix_cv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), z_cv, atol=1e-4)


def test_rays_pass_through_points(rng):
    S = 200
    R, t, K = make_bop_camera(rng, S)
    cam = cameras.camera_from_bop(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K), S)
    pts = jnp.asarray(rng.normal(size=(20, 3)) * 0.5, jnp.float32)
    xy_ndc, z = cameras.project_points(cam, pts)
    dirs = cameras.ndc_directions(cam, xy_ndc)
    origin = cameras.camera_center(cam)
    # point = origin + dir * z  (dir has camera-z == 1)
    recon = origin[None, :] + dirs * z[:, None]
    np.testing.assert_allclose(np.asarray(recon), np.asarray(pts), atol=1e-4)


def test_grid_rays_cover_pixel_centers(rng):
    S = 8
    R, t, K = make_bop_camera(rng, S)
    cam = cameras.camera_from_bop(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K), S)
    rb = cameras.grid_rays(cam, S, n_pts=4, min_depth=3.0, max_depth=7.0)
    assert rb.xys.shape == (S * S, 2)
    # first ray = pixel (0.5, 0.5) -> ndc (1 - 1/S, 1 - 1/S)
    np.testing.assert_allclose(np.asarray(rb.xys[0]), [1 - 1 / S, 1 - 1 / S], atol=1e-6)
    # row-major: second ray moves in x
    np.testing.assert_allclose(np.asarray(rb.xys[1, 1]), 1 - 1 / S, atol=1e-6)
    assert rb.lengths.shape == (S * S, 4)
    np.testing.assert_allclose(np.asarray(rb.lengths[0]), [3, 3 + 4 / 3, 3 + 8 / 3, 7], atol=1e-5)


def test_monte_carlo_rays_bounds(rng):
    S = 200
    R, t, K = make_bop_camera(rng, S)
    cam = cameras.camera_from_bop(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K), S)
    rb = cameras.monte_carlo_rays(cam, 128, 16, 3.0, 7.0, jax.random.PRNGKey(0))
    assert rb.xys.shape == (128, 2)
    assert float(jnp.abs(rb.xys).max()) <= 1.0
    lengths = np.asarray(rb.lengths)
    assert lengths.min() >= 3.0 and lengths.max() <= 7.0
    assert (np.diff(lengths, axis=-1) > 0).all()  # sorted (stratified bins)


def test_batched_cameras(rng):
    S = 200
    Rs, ts, Ks = [], [], []
    for _ in range(3):
        R, t, K = make_bop_camera(rng, S)
        Rs.append(R); ts.append(t); Ks.append(K)
    cam = cameras.camera_from_bop(jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(Ks), S)
    pts = jnp.asarray(rng.normal(size=(3, 10, 3)) * 0.5, jnp.float32)
    xy, z = cameras.project_points(cam, pts)
    assert xy.shape == (3, 10, 2)
    for b in range(3):
        pix_cv, _ = opencv_project(Rs[b], ts[b], Ks[b], np.asarray(pts[b]))
        np.testing.assert_allclose(np.asarray(cameras.ndc_to_pixel(xy[b], S)), pix_cv, atol=1e-2)


def test_rotvec_roundtrip(rng):
    rv = jnp.asarray(rng.normal(size=(32, 3)))
    R = rotations.rotvec_to_matrix(rv)
    # orthonormality
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    rv2 = rotations.matrix_to_rotvec(R)
    R2 = rotations.rotvec_to_matrix(rv2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_rotvec_near_pi():
    axis = jnp.asarray([0.3, -0.5, 0.81])
    axis = axis / jnp.linalg.norm(axis)
    rv = axis * (np.pi - 1e-5)
    R = rotations.rotvec_to_matrix(rv)
    rv2 = rotations.matrix_to_rotvec(R)
    R2 = rotations.rotvec_to_matrix(rv2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_kabsch_recovers_transform(rng):
    src = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    R_true = rotations.rotvec_to_matrix(jnp.asarray([0.2, -0.1, 0.4]))
    t_true = jnp.asarray([1.0, -2.0, 0.5])
    dst = src @ R_true.T + t_true
    R, t = rotations.kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)


def test_relative_pose_conventions():
    R1 = np.asarray(rotations.rotvec_to_matrix(jnp.asarray([0.1, 0.2, 0.3])))
    R2 = np.asarray(rotations.rotvec_to_matrix(jnp.asarray([-0.2, 0.1, 0.5])))
    t1 = np.array([1.0, 2.0, 3.0]); t2 = np.array([0.5, -1.0, 4.0])
    rel_R, rel_t = rotations.relative_pose(jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(rel_R), R1.T @ R2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rel_t), t2 - t1, atol=1e-6)
    # SE3 version: T2 @ inv(T1)
    rel_R2, rel_t2 = rotations.relative_pose_se3(jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2))
    T1 = np.eye(4); T1[:3, :3] = R1; T1[:3, 3] = t1
    T2 = np.eye(4); T2[:3, :3] = R2; T2[:3, 3] = t2
    rel = T2 @ np.linalg.inv(T1)
    np.testing.assert_allclose(np.asarray(rel_R2), rel[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rel_t2), rel[:3, 3], atol=1e-5)
