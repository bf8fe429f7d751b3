"""CLI surface smoke tests: the root entry points run end-to-end in a
subprocess with the synthetic config (`-cfg yaml KEY VALUE` parity with the
reference, run.sh:1-11)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    # sitecustomize pins the axon platform; jax_platforms config wins
    "SEGTPU_FORCE_CPU": "1",
    "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.3",
}


def _run(args, timeout=900):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV, timeout=timeout,
        capture_output=True, text=True)


@pytest.mark.slow
def test_train_src_and_test_cli(tmp_path):
    out_dir = str(tmp_path)
    r = _run(["train_src.py", "-cfg", "configs/synthetic_smoke.yaml",
              "OUTPUT_DIR", out_dir])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, "Aspp-1"))
    assert os.path.exists(os.path.join(out_dir, "deeplab_chart_params.json"))

    r = _run(["test.py", "-cfg", "configs/synthetic_smoke.yaml",
              "-c", "renders/kvasir.json",
              "OUTPUT_DIR", out_dir, "resume", os.path.join(out_dir, "Aspp-1")])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, "deeplab_confusion_matrix.json"))


@pytest.mark.slow
def test_train_adv_cli(tmp_path):
    out_dir = str(tmp_path)
    r = _run(["train_adv.py", "-cfg", "configs/synthetic_smoke.yaml",
              "OUTPUT_DIR", out_dir, "SOLVER.BATCH_SIZE", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, "AsppFada-1"))
