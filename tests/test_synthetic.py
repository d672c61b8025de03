"""Synthetic scene sanity checks."""

import numpy as np
import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib


def test_scene_shapes_and_content():
    scene = synthetic.make_scene(n_views=4, image_size=48)
    assert scene.images.shape == (4, 48, 48, 3)
    assert scene.sils.shape == (4, 48, 48)
    sil_frac = float(scene.sils.mean())
    assert 0.05 < sil_frac < 0.9  # object visible, doesn't fill the frame
    # colored pixels only inside the silhouette
    outside = np.asarray(scene.images[np.asarray(scene.sils) == 0])
    np.testing.assert_allclose(outside, 0.0, atol=1e-6)


def test_object_projects_inside_images():
    scene = synthetic.make_scene(n_views=6, image_size=48)
    S = 48
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)
    pts, ok = synthetic.analytic_surface_points(200, jax.random.PRNGKey(1))
    xy, z = cam_lib.project_points(cam, jnp.broadcast_to(pts, (6, 200, 3)))
    pix = np.asarray(cam_lib.ndc_to_pixel(xy, S))
    assert (pix > 1).all() and (pix < S - 1).all()
    assert (np.asarray(z) > 0).all()


def test_surface_points_on_isosurface():
    pts, ok = synthetic.analytic_surface_points(500, jax.random.PRNGKey(0))
    dens = np.asarray(synthetic.analytic_density(pts))[:, 0]
    ok = np.asarray(ok)
    # on the blob boundary the sigmoid density is 0.5
    assert np.abs(dens[ok] - 0.5).max() < 0.05


def test_silhouette_matches_projection():
    """Projected analytic surface points must land on silhouette pixels."""
    scene = synthetic.make_scene(n_views=2, image_size=64)
    S = 64
    cam = cam_lib.camera_from_bop(scene.R_bop, scene.t_bop, scene.K, S)
    pts, ok = synthetic.analytic_surface_points(300, jax.random.PRNGKey(2))
    pts = pts[np.asarray(ok)]
    xy, _ = cam_lib.project_points(cam, jnp.broadcast_to(pts, (2,) + pts.shape))
    pix = np.asarray(cam_lib.ndc_to_pixel(xy, S))
    sils = np.asarray(scene.sils)
    hits = 0
    total = 0
    for b in range(2):
        for p in pix[b]:
            x, y = int(round(p[0])), int(round(p[1]))
            if 0 <= x < S and 0 <= y < S:
                total += 1
                # dilate by 1px to allow boundary rounding
                hits += sils[b, max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2].max() > 0
    assert hits / total > 0.97
