"""demo.py CLI: grid render with multi-checkpoint columns on synthetic data."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SEGTPU_FORCE_CPU": "1",
       "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
       "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.3"}


@pytest.mark.slow
def test_demo_grid(tmp_path, rng):
    out_dir = str(tmp_path)
    # train a tiny checkpoint
    r = subprocess.run(
        [sys.executable, "train_src.py", "-cfg", "configs/synthetic_smoke.yaml",
         "OUTPUT_DIR", out_dir],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    # demo sample list (+ ground truth so PR curves get dumped)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    img_path = str(tmp_path / "demo_img.png")
    Image.fromarray(img).save(img_path)
    (tmp_path / "demo_image.txt").write_text(img_path + "\n")
    gt = rng.randint(0, 3, size=(64, 64)).astype(np.uint8)
    gt_path = str(tmp_path / "demo_gt.png")
    Image.fromarray(gt).save(gt_path)
    (tmp_path / "demo_gt.txt").write_text(gt_path + "\n")
    render = {"name": "aspp_demo",
              "palette": [0, 0, 0, 255, 255, 255, 128, 128, 128],
              "demo_image_path": str(tmp_path / "demo_image.txt"),
              "demo_groundtruth_path": str(tmp_path / "demo_gt.txt"),
              "trainid2name": {"0": "bg", "1": "blob", "2": "ring"},
              "weights": {"epoch1": os.path.join(out_dir, "Aspp-1")},
              "tensorboard": True}
    render_path = str(tmp_path / "render.json")
    json.dump(render, open(render_path, "w"))

    out_png = str(tmp_path / "grid.png")
    r = subprocess.run(
        [sys.executable, "demo.py", "-cfg", "configs/synthetic_smoke.yaml",
         "-c", render_path, "-o", out_png, "-n", "1",
         "OUTPUT_DIR", out_dir,
         "INPUT.INPUT_SIZE_TEST", "[64,64]"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_png)
    # tensorboard events exported through the dependency-free writer
    tb = [f for f in os.listdir(os.path.join(out_dir, "tb_demo"))
          if f.startswith("events.out.tfevents")]
    assert tb
    # per-class PR curves dumped per checkpoint (reference demo.py:80-88)
    pr_dir = os.path.join(out_dir, "pr_curves", "epoch1")
    assert os.path.exists(os.path.join(pr_dir, "pr_curves.json"))
    assert os.path.exists(os.path.join(pr_dir, "pr_curves.png"))
    curves = json.load(open(os.path.join(pr_dir, "pr_curves.json")))
    assert set(curves) == {"bg", "blob", "ring"}


@pytest.mark.slow
def test_inference_and_visualize_cli(tmp_path, rng):
    out_dir = str(tmp_path)
    r = subprocess.run(
        [sys.executable, "train_src.py", "-cfg", "configs/synthetic_smoke.yaml",
         "OUTPUT_DIR", out_dir],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    img_path = str(tmp_path / "one.png")
    Image.fromarray(img).save(img_path)
    render = {"palette": [0, 0, 0, 255, 255, 255, 128, 128, 128]}
    render_path = str(tmp_path / "r.json")
    json.dump(render, open(render_path, "w"))
    out_png = str(tmp_path / "pred.png")
    r = subprocess.run(
        [sys.executable, "inference.py", "-cfg", "configs/synthetic_smoke.yaml",
         "-i", img_path, "-o", out_png, "-c", render_path,
         "OUTPUT_DIR", out_dir, "resume", os.path.join(out_dir, "Aspp-1"),
         "INPUT.INPUT_SIZE_TEST", "[64,64]"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_png)

    curves_png = str(tmp_path / "curves.png")
    r = subprocess.run(
        [sys.executable, "visualize.py",
         "-j", os.path.join(out_dir, "deeplab_chart_params.json"),
         "-o", curves_png, "-w", "4"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(curves_png)
