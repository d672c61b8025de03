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
