"""Native C++ marching tetrahedra vs the numpy reference implementation."""

import time

import numpy as np
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu import native
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import mcubes


def sphere_grid(R=48, radius=0.6):
    t = np.linspace(-1, 1, R)
    xx, yy, zz = np.meshgrid(t, t, t, indexing="ij")
    d = np.sqrt(xx**2 + yy**2 + zz**2)
    return 1.0 / (1.0 + np.exp((d - radius) * 40)), t


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native build unavailable")
    return lib


def test_native_matches_numpy_vertex_set(lib):
    dens, _ = sphere_grid(40)
    v_np, t_np = mcubes.marching_tetrahedra(dens, 0.5, native=False)
    v_cc, t_cc = mcubes.marching_tetrahedra(dens, 0.5, native=True)
    assert v_cc.shape[0] == v_np.shape[0]
    assert t_cc.shape[0] == t_np.shape[0]
    # same vertex set (order may differ)
    sv_np = np.asarray(sorted(map(tuple, np.round(v_np, 4))))
    sv_cc = np.asarray(sorted(map(tuple, np.round(v_cc, 4))))
    np.testing.assert_allclose(sv_np, sv_cc, atol=1e-3)


def test_native_winding_consistent(lib):
    R = 40
    dens, _ = sphere_grid(R)
    v, t = mcubes.marching_tetrahedra(dens, 0.5, native=True)
    world = mcubes.index_to_world(v, R, exact=True)
    a, b, c = world[t[:, 0]], world[t[:, 1]], world[t[:, 2]]
    fn = np.cross(b - a, c - a)
    cen = (a + b + c) / 3
    frac_out = (np.sum(fn * cen, -1) > 0).mean()
    assert frac_out > 0.99 or frac_out < 0.01


def test_native_faster_than_numpy(lib):
    dens, _ = sphere_grid(96)
    t0 = time.perf_counter()
    mcubes.marching_tetrahedra(dens, 0.5, native=False)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    mcubes.marching_tetrahedra(dens, 0.5, native=True)
    t_cc = time.perf_counter() - t0
    # informational: native should not be slower (usually 5-20x faster)
    assert t_cc < t_np * 1.5, (t_np, t_cc)
