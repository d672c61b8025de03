"""Unit tests for bench.py's relay-outage defenses (VERDICT r3 #1/#10).

Round 1's MULTICHIP failure came from probing the backend in-process (a
failed init poisons the parent's backend cache); round 3's bench record was
null because a fixed 900 s outage wait + 2 full runs blew the driver's hard
timeout.  These tests pin the load-bearing behaviors without importing jax
or touching a device: `_wait_for_backend` is injected with fake probes and
clocks, `_emit`/`_headline` are exercised as pure functions.
"""

import importlib.util
import json
import sys


def _load_bench():
    """Import bench.py WITHOUT triggering its jax import side effects."""
    # bench.py imports jax at module scope; under the test conftest jax is
    # already pinned to CPU so the import is safe, just slow the first time.
    spec = importlib.util.spec_from_file_location("bench_under_test", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_for_backend_returns_true_when_available():
    bench = _load_bench()
    calls = []

    def probe():
        calls.append(1)
        return True

    assert bench._wait_for_backend(budget_s=100, probe=probe, sleep=lambda s: None) is True
    assert len(calls) == 1


def test_wait_for_backend_retries_then_succeeds():
    bench = _load_bench()
    seq = iter([False, False, True])
    slept = []
    t = [0.0]

    def clock():
        return t[0]

    def sleep(s):
        slept.append(s)
        t[0] += s

    assert bench._wait_for_backend(
        budget_s=1000, probe=lambda: next(seq), sleep=sleep, clock=clock
    ) is True
    assert slept == [30.0, 30.0]


def test_wait_for_backend_gives_up_at_budget():
    """The wait must give up once the budget is exhausted — round 3's
    record died waiting.  Returns False so the caller can decide."""
    bench = _load_bench()
    t = [0.0]

    def clock():
        return t[0]

    def sleep(s):
        t[0] += s

    n = [0]

    def probe():
        n[0] += 1
        return False

    assert bench._wait_for_backend(
        budget_s=100, probe=probe, sleep=sleep, clock=clock
    ) is False
    # 100 s budget / 30 s retry -> 4-5 probes, definitely not 30 (900 s worth)
    assert n[0] <= 6


def test_wait_for_backend_probe_subprocess_is_child_process():
    """The real probe must run `import jax` in a CHILD process (a failed
    in-parent init poisons the backend cache for good — MULTICHIP_r01)."""
    bench = _load_bench()
    import inspect

    src = inspect.getsource(bench._probe_backend_subprocess)
    assert "subprocess.run" in src
    assert "jax.devices()" in src


def test_headline_picks_fastest_run_and_emits_valid_json(capsys):
    bench = _load_bench()
    runs = [
        {"elapsed": 80.0, "nerf_s": 40, "cors_s": 10, "neg_s": 5, "pose_s": 15,
         "bake_s": 4, "infer_s": 4, "icp_s": 2},
        {"elapsed": 52.0, "nerf_s": 28, "cors_s": 6, "neg_s": 3, "pose_s": 10,
         "bake_s": 2, "infer_s": 2, "icp_s": 1},
    ]
    rec = bench._headline(runs, t_data=3.0)
    assert rec["value"] == 52.0
    assert rec["vs_baseline"] == round(60.0 / 52.0, 3)
    assert rec["detail"]["n_runs"] == 2

    bench._emit(rec)
    out = capsys.readouterr().out.strip().splitlines()
    parsed = json.loads(out[-1])
    assert parsed["value"] == 52.0


def test_emit_sanitizes_non_finite(capsys):
    bench = _load_bench()
    bench._emit({"value": float("nan"), "detail": {"x": float("inf")}})
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] is None
    assert parsed["detail"]["x"] is None


def test_save_partial_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench()
    p = tmp_path / "partial.json"
    monkeypatch.setattr(bench, "_PARTIAL", str(p))
    bench._save_partial({"run": 0, "phases": {"nerf_s": 12.3}, "done": False})
    data = json.loads(p.read_text())
    assert data["phases"]["nerf_s"] == 12.3
