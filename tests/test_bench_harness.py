"""bench.py transient-failure hardening (VERDICT r3 item 1).

BENCH_r03.json was rc=1 because the remote-TPU tunnel was down — a HANG, not
an exception — and bench.py made no attempt to survive it.  These tests drive
the parent retry harness with fake child commands (SEGTPU_BENCH_TEST_CHILD)
and assert: failed attempts emit diagnostic JSON to stderr and are retried;
a later success yields rc=0 + the single metric line on stdout; total failure
yields rc=1 with a loud error JSON line (never silent); hung children are
killed at the attempt timeout.
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra):
    env = {**os.environ, **env_extra}
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=120)


def _fake_child(tmp_path, body):
    path = tmp_path / "fake_child.py"
    path.write_text(textwrap.dedent(body))
    return f"{sys.executable} {path}"


def test_retry_then_success(tmp_path):
    """First attempt crashes; second succeeds → rc=0, one metric line on
    stdout, one diagnostic JSON on stderr."""
    counter = tmp_path / "count"
    child = _fake_child(tmp_path, f"""
        import json, os, sys
        c = os.path.exists({str(counter)!r})
        open({str(counter)!r}, 'w').write('x')
        if not c:
            print('boom: backend UNAVAILABLE', file=sys.stderr)
            sys.exit(1)
        print(json.dumps({{"metric":
            "train_images_per_sec_per_chip_deeplabv2_r101_512",
            "value": 108.15, "unit": "images/sec/chip",
            "vs_baseline": 5.407, "mfu": 0.58}}))
    """)
    r = _run({"SEGTPU_BENCH_TEST_CHILD": child,
              "SEGTPU_BENCH_ATTEMPTS": "3", "SEGTPU_BENCH_BACKOFF": "0"})
    assert r.returncode == 0, r.stderr
    out_lines = r.stdout.strip().splitlines()
    assert len(out_lines) == 1
    row = json.loads(out_lines[0])
    assert row["value"] == 108.15 and row["mfu"] == 0.58
    diags = [json.loads(l) for l in r.stderr.strip().splitlines()
             if l.startswith("{")]
    assert len(diags) == 1
    assert diags[0]["diagnostic"] == "bench_attempt_failed"
    assert diags[0]["attempt"] == 1
    assert "UNAVAILABLE" in diags[0]["stderr_tail"]


def test_all_attempts_fail_is_loud(tmp_path):
    """Total failure: one diagnostic per attempt on stderr AND a terminal
    error JSON line on stdout; rc=1."""
    child = _fake_child(tmp_path, """
        import sys
        print('no backend', file=sys.stderr)
        sys.exit(2)
    """)
    r = _run({"SEGTPU_BENCH_TEST_CHILD": child,
              "SEGTPU_BENCH_ATTEMPTS": "2", "SEGTPU_BENCH_BACKOFF": "0"})
    assert r.returncode == 1
    diags = [json.loads(l) for l in r.stderr.strip().splitlines()
             if l.startswith("{")]
    assert [d["attempt"] for d in diags] == [1, 2]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["value"] is None and "error" in row
    assert row["metric"] == "train_images_per_sec_per_chip_deeplabv2_r101_512"


def test_hung_child_is_killed_and_retried(tmp_path):
    """A child that hangs (the round-3 failure mode) is killed at the attempt
    timeout, diagnosed, and retried."""
    counter = tmp_path / "count"
    child = _fake_child(tmp_path, f"""
        import json, os, sys, time
        c = os.path.exists({str(counter)!r})
        open({str(counter)!r}, 'w').write('x')
        if not c:
            print('[bench-child] initializing backend', file=sys.stderr,
                  flush=True)
            time.sleep(600)   # hang: tunnel down
        print(json.dumps({{"metric":
            "train_images_per_sec_per_chip_deeplabv2_r101_512",
            "value": 108.0, "unit": "images/sec/chip",
            "vs_baseline": 5.4, "mfu": 0.58}}))
    """)
    r = _run({"SEGTPU_BENCH_TEST_CHILD": child,
              "SEGTPU_BENCH_ATTEMPTS": "2", "SEGTPU_BENCH_BACKOFF": "0",
              "SEGTPU_BENCH_TIMEOUT": "3", "SEGTPU_BENCH_RETRY_TIMEOUT": "30"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    diags = [json.loads(l) for l in r.stderr.strip().splitlines()
             if l.startswith("{")]
    assert len(diags) == 1 and "timeout" in diags[0]["error"]
    # the hung child's breadcrumb made it into the diagnostic
    assert "initializing backend" in diags[0].get("stderr_tail", "")
    assert json.loads(r.stdout.strip())["value"] == 108.0


def test_cold_compile_silence_survives_stall_timeout(tmp_path):
    """A child that is SILENT during the compile phase for longer than the
    stall timeout must NOT be killed (fully-cold /tmp/jax_cache: the remote
    compile of the train step is legitimately silent for 15+ min; a pure
    wall-clock 900 s cap killed a healthy cold run mid-round-4)."""
    child = _fake_child(tmp_path, """
        import json, sys, time
        print('[bench-child] initializing backend', file=sys.stderr, flush=True)
        print('[bench-child] compiling + warmup', file=sys.stderr, flush=True)
        time.sleep(15)   # silent "remote compile", > stall timeout
        print('[bench-child] timing', file=sys.stderr, flush=True)
        print(json.dumps({"metric":
            "train_images_per_sec_per_chip_deeplabv2_r101_512",
            "value": 107.5, "unit": "images/sec/chip",
            "vs_baseline": 5.4, "mfu": 0.58}))
    """)
    r = _run({"SEGTPU_BENCH_TEST_CHILD": child,
              "SEGTPU_BENCH_ATTEMPTS": "1", "SEGTPU_BENCH_BACKOFF": "0",
              # stall cap < the silence, with real headroom for interpreter
              # startup on this 1-core host (advisor round 4: 4 s was flaky)
              "SEGTPU_BENCH_TIMEOUT": "10",
              "SEGTPU_BENCH_HARD_TIMEOUT": "60"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert json.loads(r.stdout.strip())["value"] == 107.5


def test_hard_cap_bounds_the_compile_phase(tmp_path):
    """Even inside the compile phase the hard cap kills a stuck child."""
    child = _fake_child(tmp_path, """
        import sys, time
        print('[bench-child] compiling + warmup', file=sys.stderr, flush=True)
        time.sleep(600)   # tunnel wedged mid-compile
    """)
    r = _run({"SEGTPU_BENCH_TEST_CHILD": child,
              "SEGTPU_BENCH_ATTEMPTS": "1", "SEGTPU_BENCH_BACKOFF": "0",
              "SEGTPU_BENCH_TIMEOUT": "4", "SEGTPU_BENCH_HARD_TIMEOUT": "8"})
    assert r.returncode == 1
    diags = [json.loads(l) for l in r.stderr.strip().splitlines()
             if l.startswith("{")]
    assert len(diags) == 1 and "hard cap" in diags[0]["error"]
    assert json.loads(r.stdout.strip().splitlines()[-1])["value"] is None


def test_stale_metric_line_with_bad_rc_not_trusted(tmp_path):
    """A child that prints a metric line but exits nonzero (e.g. died during
    MFU analysis) is treated as a failed attempt."""
    child = _fake_child(tmp_path, """
        import json, sys
        print(json.dumps({"metric":
            "train_images_per_sec_per_chip_deeplabv2_r101_512",
            "value": 1.0, "unit": "images/sec/chip", "vs_baseline": 0.05}))
        sys.exit(1)
    """)
    r = _run({"SEGTPU_BENCH_TEST_CHILD": child,
              "SEGTPU_BENCH_ATTEMPTS": "1", "SEGTPU_BENCH_BACKOFF": "0"})
    assert r.returncode == 1
    assert json.loads(r.stdout.strip().splitlines()[-1])["value"] is None
