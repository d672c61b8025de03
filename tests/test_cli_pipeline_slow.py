"""Full CLI pipeline smoke on the synthetic scene (slow; set RUN_SLOW=1).

Mirrors the reference's command sequence end to end:
train-nerf -> generate-cors -> train-pose (neg + train) -> gen-feat ->
poses-est -> rel-poses -> choose-image -> icp, all through the CLI and
on-disk artifact bus.  Asserts plumbing, not final registration quality
(that's the TPU bench at real scale).
"""

import json
import os

import numpy as np
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu import cli

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="slow CLI pipeline; set RUN_SLOW=1"
)

S = "48"


def test_full_cli_pipeline(tmp_path):
    root = str(tmp_path)
    base = ["--objid", "1", "--dataset", "synth", "--root", root,
            "--synthetic", "--synthetic-views", "6", "--image-size", S,
            "--grid-res", "48", "--log-every", "0", "--field-preset", "small"]
    for uh in ("0", "1"):
        cli.main(["train-nerf", *base, "--UH", uh, "--steps", "400"])
        cli.main(["generate-cors", *base, "--UH", uh])
        cli.main(["train-pose", *base, "--UH", uh, "--steps", "30"])
        cli.main(["gen-feat", *base, "--UH", uh])
        exp = os.path.join(root, f"{uh}_synth_obj_1")
        assert os.path.exists(os.path.join(exp, "1TLESSObj_Fine", "v1fine.npy"))
        assert os.path.exists(os.path.join(exp, "1Cors", "a1.npy"))
        assert os.path.exists(os.path.join(exp, "1poseEst", "vert1_scaled.npy"))
        cli.main(["check", *base, "--UH", uh])

    cli.main(["poses-est", *base, "--UH", "0"])
    exp0 = os.path.join(root, "0_synth_obj_1")
    assert np.load(os.path.join(exp0, "1pred_R.npy")).shape == (6, 3, 3)
    cli.main(["rel-poses", *base, "--UH", "0", "--cal-pred"])
    cli.main(["rel-poses", *base, "--UH", "0", "--cal-gt"])
    cli.main(["choose-image", *base, "--UH", "0"])
    assert os.path.exists(os.path.join(exp0, "1top_50_choices.txt"))
    cli.main(["icp", *base, "--UH", "0", "--icp-threshold", "20"])
