"""Marching tetrahedra vs analytic surfaces."""

import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import mcubes


def sphere_grid(R=48, radius=0.6):
    t = np.linspace(-1, 1, R)
    xx, yy, zz = np.meshgrid(t, t, t, indexing="ij")
    d = np.sqrt(xx**2 + yy**2 + zz**2)
    # smooth density, 0.5 isosurface exactly at `radius`
    return 1.0 / (1.0 + np.exp((d - radius) * 40)), t


def test_sphere_vertices_on_surface():
    R = 48
    dens, t = sphere_grid(R)
    verts, tris = mcubes.marching_tetrahedra(dens, 0.5)
    assert verts.shape[0] > 500
    world = mcubes.index_to_world(verts, R, exact=True)
    r = np.linalg.norm(world, axis=-1)
    # vertices within one cell of the true radius
    assert np.abs(r - 0.6).max() < 2.5 / R
    assert np.abs(np.median(r) - 0.6) < 0.01


def test_triangles_indexable_and_nondegenerate():
    dens, _ = sphere_grid(32)
    verts, tris = mcubes.marching_tetrahedra(dens, 0.5)
    assert tris.max() < verts.shape[0]
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1) / 2
    assert (area > 0).mean() > 0.99


def test_winding_consistent_on_sphere():
    """Triangle normals should consistently point outward (or all inward)."""
    R = 48
    dens, _ = sphere_grid(R)
    verts, tris = mcubes.marching_tetrahedra(dens, 0.5)
    world = mcubes.index_to_world(verts, R, exact=True)
    v0, v1, v2 = world[tris[:, 0]], world[tris[:, 1]], world[tris[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    centroid = (v0 + v1 + v2) / 3
    dots = np.sum(fn * centroid, axis=-1)
    frac_out = (dots > 0).mean()
    assert frac_out > 0.99 or frac_out < 0.01, f"inconsistent winding: {frac_out}"


def test_vertex_normals_point_radially():
    R = 48
    dens, _ = sphere_grid(R)
    verts, tris = mcubes.marching_tetrahedra(dens, 0.5)
    world = mcubes.index_to_world(verts, R, exact=True)
    n = mcubes.vertex_normals(world, tris)
    radial = world / np.linalg.norm(world, axis=-1, keepdims=True)
    cos = np.abs(np.sum(n * radial, axis=-1))
    assert np.median(cos) > 0.98


def test_empty_grid():
    dens = np.zeros((16, 16, 16))
    verts, tris = mcubes.marching_tetrahedra(dens, 0.5)
    assert verts.shape == (0, 3)
