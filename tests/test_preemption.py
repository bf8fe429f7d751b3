"""Preemption drill (VERDICT r3 item 7; SURVEY §5 failure detection/recovery).

SIGKILL a real training subprocess mid-run, restart it with ``resume latest``,
and assert the recovered run's final checkpoint is IDENTICAL to an
uninterrupted run's: same params, same optimizer state, same BN stats.

This is only achievable because every source of run state is a pure function
of (seed, epoch/step): the loader's shuffle order is f(seed, epoch)
(DataLoader.set_epoch, wired in Trainer.train), the dropout rng is
fold_in(base_rng, state.step), the LR schedule reads state.step, and the
optimizer state rides the checkpoint.  The reference has no recovery story at
all (its trainers restart from scratch; /root/reference/train_src.py:30-44
loads weights only via cfg).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

jax = pytest.importorskip("jax")


def _train_cmd(out_dir, epochs=3, resume=None):
    cmd = [sys.executable, os.path.join(REPO, "train_src.py"),
           "-cfg", os.path.join(REPO, "configs/synthetic_smoke.yaml"),
           "OUTPUT_DIR", str(out_dir),
           "SOLVER.EPOCHS", str(epochs),
           "SOLVER.CHECKPOINT_PERIOD", "1",
           "DATASETS.SYNTHETIC_LENGTH", "24",
           "INPUT.SOURCE_INPUT_SIZE_TRAIN", "[32,32]",
           "SEED", "7"]
    if resume is not None:
        cmd += ["resume", resume]
    return cmd


def _env():
    return {**os.environ, "SEGTPU_FORCE_CPU": "1"}


def _leaves(path):
    # raw orbax read (no state template): full tree incl. optimizer state
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    flat = jax.tree_util.tree_flatten_with_path(restored)[0]
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat
            if hasattr(v, "shape")}


@pytest.mark.slow
def test_sigkill_resume_matches_uninterrupted(tmp_path):
    run_a = tmp_path / "uninterrupted"
    run_b = tmp_path / "preempted"

    # --- run A: 3 epochs straight through ---------------------------------
    r = subprocess.run(_train_cmd(run_a), env=_env(), capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(run_a / "Aspp-3")

    # --- run B: SIGKILL after the epoch-1 checkpoint lands ----------------
    p = subprocess.Popen(_train_cmd(run_b), env=_env(),
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 600
    try:
        while not os.path.isdir(run_b / "Aspp-1"):
            assert p.poll() is None, "training died before first checkpoint"
            assert time.time() < deadline, "no checkpoint within 10 min"
            time.sleep(0.5)
        # give it a moment to get INTO epoch 2 so the kill lands mid-epoch
        time.sleep(2.0)
        os.kill(p.pid, signal.SIGKILL)  # hard preemption: no cleanup at all
    finally:
        p.wait(timeout=60)
    assert not os.path.isdir(run_b / "Aspp-3"), "kill landed too late"

    # --- restart with resume=latest, finish to epoch 3 --------------------
    r = subprocess.run(_train_cmd(run_b, resume="latest"), env=_env(),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    # --- the recovered run must be indistinguishable -----------------------
    a = _leaves(run_a / "Aspp-3")
    b = _leaves(run_b / "Aspp-3")
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(
            a[k], b[k], rtol=0, atol=0,
            err_msg=f"leaf {k} differs after preemption+resume")
