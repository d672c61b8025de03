"""Full CLI pipeline smoke on the synthetic scene (slow; set RUN_SLOW=1).

Mirrors the reference's command sequence end to end:
train-nerf -> generate-cors -> train-pose (neg + train) -> gen-feat ->
poses-est -> rel-poses -> choose-image -> icp, all through the CLI and
on-disk artifact bus.  Asserts plumbing, not final registration quality
(that's the TPU bench at real scale).

Budgeted for bounded CI (VERDICT r2 #8): split into per-half + finale
tests at 250 steps / 5 views / 40^2 so each piece stays well under 5 min
on an 8-vCPU box; the halves share one module-scoped artifact root.
"""

import json
import os

import numpy as np
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu import cli

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="slow CLI pipeline; set RUN_SLOW=1"
)

S = "40"
VIEWS = "5"
NERF_STEPS = "250"


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_pipeline"))


def _base(root):
    return ["--objid", "1", "--dataset", "synth", "--root", root,
            "--synthetic", "--synthetic-views", VIEWS, "--image-size", S,
            "--grid-res", "40", "--log-every", "0", "--field-preset", "small"]


def _run_half(root, uh):
    base = _base(root)
    cli.main(["train-nerf", *base, "--UH", uh, "--steps", NERF_STEPS])
    cli.main(["generate-cors", *base, "--UH", uh])
    cli.main(["train-pose", *base, "--UH", uh, "--steps", "30"])
    cli.main(["gen-feat", *base, "--UH", uh])
    exp = os.path.join(root, f"{uh}_synth_obj_1")
    assert os.path.exists(os.path.join(exp, "1TLESSObj_Fine", "v1fine.npy"))
    assert os.path.exists(os.path.join(exp, "1Cors", "a1.npy"))
    assert os.path.exists(os.path.join(exp, "1poseEst", "vert1_scaled.npy"))
    cli.main(["check", *base, "--UH", uh])


def test_cli_half_0(root):
    _run_half(root, "0")


def test_cli_half_1(root):
    # second half hits the same compiled programs (bucketed shapes) — this
    # is the compile-cache-stability check as much as a plumbing check
    _run_half(root, "1")


def test_cli_finale(root):
    base = _base(root)
    for uh in ("0", "1"):
        if not os.path.exists(os.path.join(root, f"{uh}_synth_obj_1", "1poseEst",
                                           "vert1_scaled.npy")):
            _run_half(root, uh)  # standalone invocation safety
    cli.main(["poses-est", *base, "--UH", "0"])
    exp0 = os.path.join(root, "0_synth_obj_1")
    assert np.load(os.path.join(exp0, "1pred_R.npy")).shape == (int(VIEWS), 3, 3)
    cli.main(["rel-poses", *base, "--UH", "0", "--cal-pred"])
    cli.main(["rel-poses", *base, "--UH", "0", "--cal-gt"])
    cli.main(["choose-image", *base, "--UH", "0"])
    assert os.path.exists(os.path.join(exp0, "1top_50_choices.txt"))
    cli.main(["icp", *base, "--UH", "0", "--icp-threshold", "20"])
    cli.main(["verify", *base, "--UH", "0"])
