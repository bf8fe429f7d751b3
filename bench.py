#!/usr/bin/env python
"""Throughput benchmark: DeepLabV2-R101 training step @ 512x512 (bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md: README has none,
`"published": {}`), so `vs_baseline` is computed against PYTORCH_GPU_ANCHOR —
20 images/sec/chip for PyTorch-1.7 DeepLabV2-R101 fwd+bwd @512² on the
reference's CUDA-11-era GPU, the anchor for the driver's >=3x north-star
(BASELINE.json "north_star").  The anchor is grounded by measurement
(bench_torch_ref.py -> BENCH_TORCH_REF.json): the reference's own torch
modules run at 0.072 img/s/core on this host's CPU; scaled to a 16-32-core
server (~1.15-2.3 img/s) and a typical 10-20x V100-vs-server-CPU convnet
training speedup, the implied GPU range is ~11-44 img/s — 20 sits mid-range.
"""

import json
import time

import jax

try:  # persistent compile cache: reruns skip the remote-compile round-trip
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers, make_src_train_step

PYTORCH_GPU_ANCHOR = 20.0  # images/sec/chip; measurement-grounded, see
                           # docstring + BENCH_TORCH_REF.json
BATCH = 16
SIZE = 512
WARMUP = 5
ITERS = 20

# peak bf16 matmul throughput for MFU: v5e = 197 TFLOPS/chip.  Override with
# SEGTPU_PEAK_TFLOPS when benching other generations (v4=275, v5p=459).
import os
PEAK_FLOPS = float(os.environ.get("SEGTPU_PEAK_TFLOPS", "197")) * 1e12


def step_mfu(step, args, step_time_s: float) -> float:
    """Model FLOPs utilization: XLA cost-model FLOPs of the compiled step
    (utils/profiling.py cal_params — the thop replacement, SURVEY §2.0) over
    measured step time and chip peak."""
    try:
        analysis = step.lower(*args).compile().cost_analysis() or {}
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0
    if not flops or step_time_s <= 0:
        return 0.0
    return flops / step_time_s / PEAK_FLOPS


def main():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet101"
    cfg.MODEL.NUM_CLASSES = 19
    cfg.MODEL.FREEZE_BN = True
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1

    spec = build_segmentor(cfg)
    seg = Segmentor(spec, cfg.MODEL.NUM_CLASSES)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, 19, size=(BATCH, SIZE, SIZE)).astype(np.int32))
    batch = {"image": x, "label": y}

    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=1000)

    for _ in range(WARMUP):
        state, metrics = step(state, batch, jnp.float32(0))
    float(metrics["loss"])  # device_get: hard sync (block_until_ready does not
                            # fully fence through the remote-TPU tunnel)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, jnp.float32(0))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    mfu = step_mfu(step, (state, batch, jnp.float32(0)), dt / ITERS)
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_deeplabv2_r101_512",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / PYTORCH_GPU_ANCHOR, 3),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
