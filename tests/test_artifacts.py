"""Artifact-bus helpers: de-padded key loading (ADVICE r2) and the bench
JSON sanitizer."""

import numpy as np
import pytest

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts


def _write_keys(d, n_real, n_pad):
    reps = np.resize(np.arange(n_real), n_pad)
    verts = np.arange(n_real * 3, dtype=np.float32).reshape(n_real, 3)[reps]
    feats = np.arange(n_real * 2, dtype=np.float32).reshape(n_real, 2)[reps]
    normals = verts + 0.5
    artifacts.save_array(d, "vert1_scaled.npy", verts)
    artifacts.save_array(d, "feat1_scaled.npy", feats)
    artifacts.save_array(d, "normals_scaled.npy", normals)
    artifacts.save_array(d, "n_keys.npy", np.asarray([n_real]))
    return verts


def test_load_keys_trims_cycled_pad(tmp_path):
    d = str(tmp_path)
    verts = _write_keys(d, 5, 8)
    v, f, n, n_real = artifacts.load_keys(d)
    assert n_real == 5
    assert v.shape == (5, 3) and f.shape == (5, 2) and n.shape == (5, 3)
    np.testing.assert_array_equal(v, verts[:5])
    # untrimmed load still reports the true count
    vp, fp, np_, n_real2 = artifacts.load_keys(d, trim=False)
    assert vp.shape == (8, 3) and n_real2 == 5


def test_load_keys_without_count_file(tmp_path):
    d = str(tmp_path)
    _write_keys(d, 4, 4)
    import os

    os.remove(os.path.join(d, "n_keys.npy"))
    v, f, n, n_real = artifacts.load_keys(d)
    assert n_real == 4 and v.shape == (4, 3)


def test_bench_finite_sanitizer():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    out = bench._finite({"a": float("nan"), "b": [1.0, float("inf")], "c": 2})
    assert out == {"a": None, "b": [1.0, None], "c": 2}
    import json

    json.dumps(out)  # must be strict-JSON serializable
