"""The bench.py retry wrapper must survive every observed TPU-tunnel failure
mode: backend-init RuntimeError before any measurement (voided BENCH_r03.json),
hangs in jax.devices(), crashes, and garbage output — each attempt is a fresh
subprocess because JAX backend init is once-per-process."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_wrapper(monkeypatch, inner_code, attempts=3, timeout="5"):
    """Run bench.run_with_retries with the inner attempt replaced by
    ``inner_code`` (executed via python -c)."""
    monkeypatch.setenv("SHINEON_BENCH_INNER_CMD", textwrap.dedent(inner_code))
    monkeypatch.setenv("SHINEON_BENCH_ATTEMPTS", str(attempts))
    monkeypatch.setenv("SHINEON_BENCH_ATTEMPT_TIMEOUT", timeout)
    monkeypatch.setenv("SHINEON_BENCH_BACKOFFS", "0.01,0.01")
    # run in-process to exercise the real wrapper code path
    sys.path.insert(0, REPO)
    try:
        import bench

        return bench.run_with_retries([]), None
    finally:
        sys.path.remove(REPO)


STATE = "/tmp/shineon_bench_wrapper_test_state"


def test_wrapper_retries_past_backend_init_failure(monkeypatch, capfd, tmp_path):
    """First attempt dies like BENCH_r03 (RuntimeError at backend init);
    second succeeds — the wrapper must emit the success JSON and rc=0."""
    state = tmp_path / "attempt"
    code = f"""
import json, os
p = {str(state)!r}
n = int(open(p).read()) if os.path.exists(p) else 0
open(p, "w").write(str(n + 1))
if n == 0:
    raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
print("some stderr-ish noise line")
print(json.dumps({{"metric": "vvt_video_tryon_frames_per_sec_per_chip",
                   "value": 123.0, "unit": "frames/sec/chip",
                   "vs_baseline": 0.6}}))
"""
    rc, _ = _run_wrapper(monkeypatch, code)
    out = capfd.readouterr().out
    assert rc == 0
    line = json.loads(out.strip().splitlines()[-1])
    assert line["value"] == 123.0


def test_wrapper_survives_hang_via_timeout(monkeypatch, capfd, tmp_path):
    """A hung attempt (the tunnel has hung >120 s in jax.devices()) is killed
    by the per-attempt timeout and the next attempt wins."""
    state = tmp_path / "attempt"
    code = f"""
import json, os, time
p = {str(state)!r}
n = int(open(p).read()) if os.path.exists(p) else 0
open(p, "w").write(str(n + 1))
if n == 0:
    time.sleep(300)  # "hang": exceeds the attempt timeout
print(json.dumps({{"metric": "m", "value": 1.0, "unit": "u",
                   "vs_baseline": 1.0}}))
"""
    # timeout generous enough for interpreter startup on a contended 1-core
    # host, far below the 300s hang
    rc, _ = _run_wrapper(monkeypatch, code, timeout="30")
    assert rc == 0
    assert json.loads(capfd.readouterr().out.strip().splitlines()[-1])["value"] == 1.0


def test_wrapper_rejects_json_without_metric_key(monkeypatch, capfd):
    """Stray JSON (e.g. a logged dict) must not be mistaken for the result."""
    code = """
print('{"not_the_result": true}')
"""
    rc, _ = _run_wrapper(monkeypatch, code, attempts=2)
    assert rc == 1


def test_wrapper_gives_up_after_attempts(monkeypatch, capfd):
    code = """
raise RuntimeError("persistent failure")
"""
    rc, _ = _run_wrapper(monkeypatch, code, attempts=2)
    assert rc == 1
    err = capfd.readouterr().err
    assert "after 2 attempts" in err


def test_driver_invocation_uses_wrapper():
    """`python bench.py` (driver mode) must route through the retry wrapper:
    with 0 attempts allowed it exits 1 immediately instead of measuring."""
    env = dict(os.environ, SHINEON_BENCH_ATTEMPTS="0",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert proc.returncode == 1
    assert "0 attempts" in proc.stderr
