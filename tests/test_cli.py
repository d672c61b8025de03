"""CLI smoke tests on fabricated artifacts (the trainers have their own
tests; here we exercise the orchestration/file plumbing)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu import cli
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import rotvec_to_matrix
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts


def test_parser_covers_reference_commands():
    p = cli.build_parser()
    for cmd in ["train-nerf", "generate-cors", "train-pose", "gen-feat",
                "poses-est", "rel-poses", "choose-image", "icp", "verify"]:
        args = p.parse_args([cmd, "--objid", "2", "--dataset", "ruapc", "--UH", "1", "--synthetic"])
        assert args.cmd == cmd and args.objid == 2


@pytest.fixture(scope="module")
def fabricated(tmp_path_factory):
    """Artifacts for the registration-finale commands, both halves."""
    root = str(tmp_path_factory.mktemp("cliroot"))
    rng = np.random.default_rng(0)
    pts, ok = synthetic.analytic_surface_points(4000, jax.random.PRNGKey(1))
    pts = np.asarray(pts)[np.asarray(ok)]
    scene = synthetic.make_scene(n_views=8, image_size=48, key=jax.random.PRNGKey(0))
    diam = scene.diameter
    scale = diam / 1.8
    verts = pts * scale
    for uh in (0, 1):
        exp = os.path.join(root, f"{uh}_ruapc_obj_1")
        pose_d = artifacts.pose_dir(exp, 1)
        half = verts[verts[:, 2] < 2] if uh == 0 else verts[verts[:, 2] > -2]
        artifacts.save_array(pose_d, "vert1_scaled.npy", half)
        artifacts.save_array(pose_d, "feat1_scaled.npy", np.zeros((half.shape[0], 12), np.float32))
    # predicted poses for half 0 = GT with tiny noise, in CAD units
    exp0 = os.path.join(root, "0_ruapc_obj_1")
    R_gt = np.asarray(scene.R_bop)
    t_gt = np.asarray(scene.t_bop) * scale
    dR = np.stack([np.asarray(rotvec_to_matrix(jnp.asarray(rng.normal(size=3) * 0.005))) for _ in range(8)])
    np.save(os.path.join(exp0, "1pred_R.npy"), np.einsum("nij,njk->nik", dR, R_gt))
    np.save(os.path.join(exp0, "1pred_t.npy"), t_gt + rng.normal(size=(8, 3)) * 0.002 * scale)
    return root, scene, scale


def test_rel_poses_and_choose_image(fabricated):
    root, scene, scale = fabricated
    base = ["--objid", "1", "--dataset", "ruapc", "--UH", "0", "--root", root,
            "--synthetic", "--synthetic-views", "8"]
    cli.main(["rel-poses", *base, "--cal-pred"])
    cli.main(["rel-poses", *base, "--cal-gt"])
    exp0 = os.path.join(root, "0_ruapc_obj_1")
    pred = np.load(os.path.join(exp0, "1pred_relative_poses.npy"))
    gt = np.load(os.path.join(exp0, "1gt_relative_poses.npy"))
    assert pred.shape == (8, 8, 4, 4) and gt.shape[0] == 8
    cli.main(["choose-image", *base])
    top = open(os.path.join(exp0, "1top_50_choices.txt")).read().split()
    assert len(top) == 8  # top_k capped at N


def test_icp_command(fabricated):
    root, scene, scale = fabricated
    out = os.path.join(root, "0_ruapc_obj_1")
    # chosen image is whatever choose-image wrote
    cli.main([
        "icp", "--objid", "1", "--dataset", "ruapc", "--root", root,
        "--synthetic", "--synthetic-views", "8",
        "--icp-threshold", str(0.2 * scale),
    ])
