"""The bench/selftest flake-resistance harness (VERDICT r4 item 1).

BENCH_r04.json was rc=1 because one transient relay error
("response body closed before all bytes were read", a network flake in
remote_compile) killed bench.py in a warmup stage with zero retry and no
partial-result emission — erasing the round's entire perf evidence.  These
tests pin the fix: retry_transient retries exactly that error class, and
bench.Collector isolates stage failures so the JSON always emits with
whatever stages completed.
"""

import json
import subprocess
import sys

import pytest

import bench
from openglottal_tpu.data.prefetch import adaptive_depth
from openglottal_tpu.utils.retry import retry_transient


class Flaky:
    """Fails the first ``n_failures`` calls, then returns ``value``."""

    def __init__(self, n_failures, value=42,
                 exc=lambda: RuntimeError(
                     "INTERNAL: http://127.0.0.1:8113/remote_compile: read "
                     "body: response body closed before all bytes were read")):
        self.calls = 0
        self.n_failures = n_failures
        self.value = value
        self.exc = exc

    def __call__(self):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise self.exc()
        return self.value


def test_retry_recovers_from_transient():
    f = Flaky(n_failures=1)
    sleeps = []
    assert retry_transient(f, attempts=3, sleep=sleeps.append) == 42
    assert f.calls == 2
    assert sleeps == [3.0]  # linear backoff, only between attempts


def test_retry_exhausts_and_reraises():
    f = Flaky(n_failures=10)
    errors = []
    with pytest.raises(RuntimeError, match="response body closed"):
        retry_transient(f, attempts=3, sleep=lambda _: None,
                        on_error=lambda i, e: errors.append(i))
    assert f.calls == 3
    assert errors == [0, 1, 2]


def test_collector_stage_survives_injected_flake():
    """A stage that flakes once still produces its number (the BENCH_r04
    failure mode: the flake erased everything)."""
    col = bench.Collector(attempts=3)
    f = Flaky(n_failures=1)
    import openglottal_tpu.utils.retry as retry_mod

    orig = retry_mod.time.sleep
    retry_mod.time.sleep = lambda s: None
    try:
        assert col.stage("flaky", f) == 42
        assert col.failed == []

        # a stage that fails every attempt yields default + a record, and
        # does NOT raise — later stages still run
        dead = Flaky(n_failures=99)
        assert col.stage("dead", dead, default=None) is None
        assert dead.calls == 3
        assert [d["stage"] for d in col.failed] == ["dead"]
        assert "response body closed" in col.failed[0]["error"]

        ok = Flaky(n_failures=0, value=7)
        assert col.stage("after", ok) == 7
    finally:
        retry_mod.time.sleep = orig


def test_bench_headline_fallback_chain():
    """value = batched > pipelined > serial, whichever survived (the
    promotion of the stable figure to the headline, VERDICT r4 item 6)."""
    out = {"batched_fps": None, "pipelined_fps": 4200.0, "serial_fps": 2300.0}
    for key in ("batched_fps", "pipelined_fps", "serial_fps"):
        if out.get(key):
            value, headline = out[key], key
            break
    assert (value, headline) == (4200.0, "pipelined_fps")


def test_bench_emits_json_with_failed_stages(tmp_path):
    """End-to-end: a bench-shaped Collector run where half the stages die
    still emits one parseable JSON line and exits 0 (subprocess so the
    exit-code contract is the real one)."""
    script = tmp_path / "mini_bench.py"
    script.write_text(
        "import json, sys\n"
        "sys.path.insert(0, %r)\n"
        "import bench\n"
        "col = bench.Collector(attempts=2)\n"
        "import openglottal_tpu.utils.retry as r\n"
        "r.time.sleep = lambda s: None\n"
        "ok = col.stage('serial', lambda: 2300.0)\n"
        "bad = col.stage('pipelined', lambda: 1/0)\n"
        "out = {'value': ok, 'pipelined_fps': bad}\n"
        "if col.failed: out['failed_stages'] = col.failed\n"
        "print(json.dumps(out))\n" % "/root/repo")
    proc = subprocess.run([sys.executable, str(script)],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed["value"] == 2300.0
    assert parsed["pipelined_fps"] is None
    assert parsed["failed_stages"][0]["stage"] == "pipelined"


def test_adaptive_depth():
    # transfer much slower than compute -> deep pipe, clamped at max
    assert adaptive_depth(33e6, 33e6, 0.1) == 6       # 1 s transfer vs 0.1 s
    # transfer ~ compute -> ceil(1)+1 = 2
    assert adaptive_depth(33e6, 330e6, 0.1) == 2
    # fast link -> floor at double buffering
    assert adaptive_depth(33e6, 2e9, 0.1) == 2
    # 3x-slower transfer than compute -> 4 in flight
    assert adaptive_depth(30e6, 100e6, 0.1) == 4
    # degenerate inputs never crash or return <2
    assert adaptive_depth(1.0, 0.0, 0.0) >= 2
