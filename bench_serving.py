#!/usr/bin/env python
"""Serving benchmark: bf16 vs int8 eval throughput on the current chip.

One JSON line per row; writes BENCH_SERVING.json at the repo root.  The int8
path is serve/quant.py (s8xs8->s32 convs on the MXU, per-channel weight
scales, static activation scales); v5e peak is 394 TOPS int8 vs 197 TFLOPS
bf16, so a compute-bound eval should approach 2x.

Usage: python bench_serving.py [--model deeplab_resnet101] [--size 512]
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def build(model, nc, dtype):
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.train import Segmentor

    cfg = get_default_cfg()
    cfg.MODEL.NAME = model
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.MODEL.DTYPE = dtype
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    return seg


def bench_mode(seg, size, batch, mode, iters=20, warmup=3):
    from rnd_semantic_segmentation_tpu.serve import (
        QuantConfig, calibrate_segmentor, quant_scope, resolve_mode)

    rng = np.random.RandomState(0)
    in_dtype = jnp.bfloat16 if mode != "f32" else jnp.float32
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)
                    ).astype(in_dtype)
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), in_dtype))
    params = {n: dict(v)["params"] for n, v in variables.items()}
    stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
             for n, v in variables.items()}

    @jax.jit
    def fwd(params, image):
        outputs, _, _ = seg.forward(params, stats, image,
                                    label_size=(size, size), train=False)
        return jnp.argmax(outputs[0].astype(jnp.float32), axis=-1)

    ctx = None
    if mode in ("int8", "fake"):
        resolved = resolve_mode(mode)
        ctx = calibrate_segmentor(
            seg, variables, [{"image": x}],
            config=QuantConfig(mode=resolved, calib_batches=1))
        mode = resolved

    scope = quant_scope(ctx)
    with scope:
        for _ in range(warmup):
            out = fwd(params, x)
        np.asarray(out[0, 0, 0])  # hard sync (tunnel-safe timing boundary)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x)
        np.asarray(out[0, 0, 0])
        dt = time.perf_counter() - t0
    return batch * iters / dt, mode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deeplab_resnet101")
    ap.add_argument("--nc", type=int, default=19)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rows = []
    for mode in ("bf16", "int8"):
        seg = build(args.model, args.nc, "bfloat16")
        try:
            ips, resolved = bench_mode(seg, args.size, args.batch, mode,
                                       iters=args.iters)
        except Exception as e:
            rows.append({"mode": mode, "error": f"{type(e).__name__}: {e}"[:300]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        row = {"model": args.model, "size": args.size, "batch": args.batch,
               "mode": mode, "resolved_mode": resolved,
               "eval_images_per_sec": round(ips, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "eval_images_per_sec" in r]
    if len(ok) == 2:
        print(json.dumps({"int8_speedup_vs_bf16":
                          round(ok[1]["eval_images_per_sec"]
                                / ok[0]["eval_images_per_sec"], 3)}), flush=True)
    with open(os.path.join(REPO, "BENCH_SERVING.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
