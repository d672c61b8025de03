"""BOP loader tests against a fabricated on-disk dataset."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import bop
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib


@pytest.fixture(scope="module")
def fake_bop(tmp_path_factory):
    """A 2-image BOP-style object dir with a known square object."""
    root = str(tmp_path_factory.mktemp("bop"))
    obj_dir = os.path.join(root, "train", "000001")
    os.makedirs(os.path.join(obj_dir, "rgb"))
    os.makedirs(os.path.join(obj_dir, "mask"))
    H = W = 120
    cam_K = [300.0, 0.0, 60.0, 0.0, 300.0, 62.0, 0.0, 0.0, 1.0]
    scene_camera, scene_gt = {}, {}
    for i in range(2):
        rgb = np.zeros((H, W, 3), np.uint8)
        mask = np.zeros((H, W), np.uint8)
        # object: 40x30 rectangle at (x0=30+i, y0=50)
        x0, y0, w, h = 30 + i, 50, 40, 30
        rgb[y0 : y0 + h, x0 : x0 + w] = [200, 100, 50]
        mask[y0 : y0 + h, x0 : x0 + w] = 255
        # noise outside the mask must be removed by masking
        rgb[0:10, 0:10] = 255
        Image.fromarray(rgb).save(os.path.join(obj_dir, "rgb", f"{i:06d}.png"))
        Image.fromarray(mask).save(os.path.join(obj_dir, "mask", f"{i:06d}_000000.png"))
        scene_camera[str(i)] = {"cam_K": cam_K, "depth_scale": 0.1}
        scene_gt[str(i)] = [
            {"cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [1.0, 2.0, 400.0], "obj_id": 1}
        ]
    json.dump(scene_camera, open(os.path.join(obj_dir, "scene_camera.json"), "w"))
    json.dump(scene_gt, open(os.path.join(obj_dir, "scene_gt.json"), "w"))

    # models dir with diameter + ascii ply
    models = os.path.join(root, "models")
    os.makedirs(models)
    json.dump({"1": {"diameter": 55.5}}, open(os.path.join(models, "models_info.json"), "w"))
    with open(os.path.join(models, "obj_000001.ply"), "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 3\n")
        f.write("property float x\nproperty float y\nproperty float z\nend_header\n")
        f.write("0 0 0\n1 0 0\n0 1 0\n")
    return root


def test_load_bop_samples_shapes(fake_bop):
    s = bop.load_bop_samples(fake_bop, 1, [0, 1], max_b=64, offset=5)
    assert s.images.shape == (2, 64, 64, 3)
    assert s.sils.shape == (2, 64, 64)
    np.testing.assert_allclose(s.R[0], np.eye(3))
    np.testing.assert_allclose(s.t[0], [1, 2, 400])
    # object roughly centered and fills ~40/50 of the crop horizontally
    frac = s.sils[0].mean()
    assert 0.3 < frac < 0.7
    # background noise removed (bicubic resize may bleed ~1px at the rim)
    outside = s.images[0][s.sils[0] == 0]
    assert outside.mean() < 0.01
    assert np.percentile(outside.max(-1), 90) == 0


def test_crop_K_consistency(fake_bop):
    """A known 3D point projecting into the original image must project to
    the equivalent crop pixel under the adjusted K."""
    s = bop.load_bop_samples(fake_bop, 1, [0], max_b=64, offset=5)
    # original image: object rect center at (x=50, y=65), K maps camera pts;
    # pick the 3D point that the ORIGINAL K projects to the rect center.
    K_orig = np.array([[300.0, 0, 60], [0, 300, 62], [0, 0, 1]])
    px_orig = np.array([50.0, 65.0])
    z = 400.0
    X = (px_orig[0] - K_orig[0, 2]) * z / K_orig[0, 0]
    Y = (px_orig[1] - K_orig[1, 2]) * z / K_orig[1, 1]
    # this camera-space point projects with the crop K to:
    Kc = s.K[0]
    u = Kc[0, 0] * X / z + Kc[0, 2]
    v = Kc[1, 1] * Y / z + Kc[1, 2]
    # rect center should land at crop center (the crop centers the bbox)
    assert abs(u - 32) < 1.5 and abs(v - 32) < 1.5, (u, v)


def test_half_sequence_ids():
    ids0 = bop.half_sequence_ids("ruapc", uh=1)
    ids1 = bop.half_sequence_ids("ruapc", uh=0)
    assert ids0[0] == 0 and len(ids0) == 1280
    assert ids1[0] == 1280 and len(ids1) == 1280
    t0 = bop.half_sequence_ids("tless", uh=1)
    t1 = bop.half_sequence_ids("tless", uh=0)
    assert len(t0) == 500 and t1[0] == 500


def test_load_diameter_and_ply(fake_bop):
    assert bop.load_diameter(fake_bop, 1) == 55.5
    verts = bop.load_cad_points(fake_bop, 1)
    assert verts.shape == (3, 3)
    np.testing.assert_allclose(verts[1], [1, 0, 0])


def test_binary_ply(tmp_path):
    import struct

    path = str(tmp_path / "bin.ply")
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n")
        f.write(b"property float x\nproperty float y\nproperty float z\nend_header\n")
        f.write(struct.pack("<6f", 1, 2, 3, 4, 5, 6))
    verts = bop.read_ply_vertices(path)
    np.testing.assert_allclose(verts, [[1, 2, 3], [4, 5, 6]])
