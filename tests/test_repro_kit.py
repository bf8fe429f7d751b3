"""Kvasir repro kit smoke (BASELINE.md acceptance prep): the one-command
train->eval->metric pipeline runs end-to-end on the synthetic stand-in."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SEGTPU_FORCE_CPU": "1",
       "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
       "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.3"}


@pytest.mark.slow
def test_repro_kit_synthetic(tmp_path):
    out = str(tmp_path / "repro")
    r = subprocess.run(
        [sys.executable, "repro_kvasir.py", "--synthetic", "--out", out],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    summary = json.load(open(os.path.join(out, "repro_summary.json")))
    (name, res), = summary.items()
    assert 0.0 <= res["macro_miou"] <= 1.0
    assert res["metric"] in res
