"""Small parity components: in-batch InfoNCE, NOCS map, depth render."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.cameras import RayBundle
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment, pose_trainer


def test_info_nce_in_batch(rng):
    # unit-norm keys (the structure InfoNCE training produces): matched
    # q=k pairs must beat mismatched ones
    k = rng.normal(size=(2, 16, 8))
    k = 5 * k / np.linalg.norm(k, axis=-1, keepdims=True)
    k = jnp.asarray(k, jnp.float32)
    loss_matched = float(pose_trainer.info_nce_in_batch(k, k, jax.random.PRNGKey(0)))
    q_wrong = jnp.roll(k, 1, axis=1)
    loss_wrong = float(pose_trainer.info_nce_in_batch(q_wrong, k, jax.random.PRNGKey(0)))
    assert loss_matched < loss_wrong
    # the positive key is in the in-batch negative set -> floor at log(2)/1000
    assert loss_matched < 2e-3


def test_nocs_map_writes_hits():
    xys = jnp.asarray([[1 - 2 * 10.5 / 32, 1 - 2 * 20.5 / 32]])  # pixel (10, 20) at res 32
    pos = jnp.asarray([[0.1, 0.2, 0.3]])
    valid = jnp.asarray([True])
    m = augment.nocs_map(xys, pos, valid, res=32)
    ys, xs = np.nonzero(np.asarray(m).sum(-1))
    assert len(ys) == 1
    # pixel coordinates within 1 of expected
    assert abs(xs[0] - 10) <= 1 and abs(ys[0] - 20) <= 1
    np.testing.assert_allclose(np.asarray(m[ys[0], xs[0]]), [0.1, 0.2, 0.3], atol=1e-6)


def test_render_depth_picks_surface():
    lengths = jnp.linspace(2.0, 4.0, 8)[None]
    weights = jnp.zeros((1, 8)).at[0, 5].set(1.0)
    bundle = RayBundle(jnp.zeros((1, 3)), jnp.zeros((1, 3)), lengths, jnp.zeros((1, 2)))
    d = renderer.render_depth(bundle, weights)
    np.testing.assert_allclose(float(d[0]), float(lengths[0, 5]), atol=1e-6)


def _toy_field(pts, dirs, mode):
    """Analytic blob field: density peaks at the origin, constant color."""
    d2 = jnp.sum(pts**2, axis=-1, keepdims=True)
    dens = jnp.exp(-4.0 * d2)
    col = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.8]), pts.shape[:-1] + (3,))
    return dens, col


def test_freeze_fine_bundle_reuse_matches_coarse_fine():
    """rayFreeze parity (pren.py:127-129, 200-243): the frozen bundle is the
    importance-resampled fine bundle of the FIRST call; re-feeding it to
    render_bundle gives identical renders on every later call."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib

    R = jnp.eye(3)[None]
    t = jnp.asarray([[0.0, 0.0, 3.0]])
    S = 16
    K = jnp.asarray([[[2.0 * S, 0.0, S / 2], [0.0, 2.0 * S, S / 2], [0.0, 0.0, 1.0]]])
    cam = cam_lib.camera_from_bop(R, t, K, S)
    key = jax.random.PRNGKey(0)

    frozen = renderer.freeze_fine_bundle(
        _toy_field, cam, key, n_rays=32, n_pts_coarse=8, n_pts_fine=16,
        min_depth=2.0, max_depth=4.0,
    )
    # same rays/keys as the unfrozen coarse+fine path -> same fine render
    _, fine_img, xys = renderer.render_coarse_fine(
        _toy_field, _toy_field, cam, key, n_rays=32, n_pts_coarse=8,
        n_pts_fine=16, min_depth=2.0, max_depth=4.0,
    )
    img1, _ = renderer.render_bundle(_toy_field, frozen, mode="color")
    np.testing.assert_allclose(np.asarray(img1), np.asarray(fine_img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(frozen.xys), np.asarray(xys), atol=1e-6)
    # "later calls": the frozen bundle is plain data -- rendering it again
    # (as the reference's self.frozenRays reuse does) is bit-identical
    img2, _ = renderer.render_bundle(_toy_field, frozen, mode="color")
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert frozen.lengths.shape[-1] == 8 + 16  # add_input_samples concat
