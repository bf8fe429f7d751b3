#!/usr/bin/env python
"""Profiler-driven step breakdown (VERDICT r1 next #10).

Captures a jax.profiler trace of the flagship DeepLabV2-R101 train step,
parses the Perfetto trace.json.gz 'X' (complete) events from the device
rows, and prints (a) the top ops by total device time and (b) a
conv-vs-everything-else split — the evidence for whether any non-conv
bubble is worth chasing (>5% of step time) or the step is at the per-conv
ceiling (the round-1 microbench conclusion).

Usage: python bench_profile.py [--model deeplab_resnet101] [--steps 5]
Writes BENCH_PROFILE.json at the repo root.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

CATEGORIES = [
    ("conv", re.compile(r"conv|%cudnn|wgrad", re.I)),
    ("matmul", re.compile(r"dot|einsum|matmul", re.I)),
    ("allreduce", re.compile(r"all-reduce|all-gather|reduce-scatter|collective", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce", re.compile(r"reduce(?!-scatter)", re.I)),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic-slice|dynamic-update", re.I)),
    ("fusion(elementwise)", re.compile(r"fusion|fused", re.I)),
]


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def run_step_under_trace(model, nc, size, batch, steps, trace_dir):
    import jax
    import jax.numpy as jnp

    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.train import (
        Segmentor, make_optimizers, make_src_train_step)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = model
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, nc, (batch, size, size)).astype(np.int32))
    b = {"image": x, "label": y}
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), jnp.bfloat16))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=1000)

    for _ in range(3):  # compile + warm
        state, m = step(state, b, jnp.float32(0))
    float(m["loss"])

    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, m = step(state, b, jnp.float32(0))
    float(m["loss"])
    jax.profiler.stop_trace()


def parse_trace(trace_dir, steps):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device rows: pids whose process_name metadata mentions the accelerator
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {pid for pid, n in proc_names.items()
                if re.search(r"tpu|device|/device:|accelerator|xla", n, re.I)
                and not re.search(r"python|host", n, re.I)}

    per_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        per_op[e["name"]] += e["dur"]  # us

    total = sum(per_op.values())
    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[categorize(name)] += dur
    top = per_op.most_common(25)
    return {
        "device_pids": sorted(dev_pids),
        "total_device_us": total,
        "per_step_ms": round(total / steps / 1e3, 3),
        "category_share": {c: round(d / max(total, 1), 4)
                           for c, d in cats.most_common()},
        "top_ops": [{"name": n[:120], "us": d,
                     "share": round(d / max(total, 1), 4)} for n, d in top],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deeplab_resnet101")
    ap.add_argument("--nc", type=int, default=19)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    trace_dir = tempfile.mkdtemp(prefix="segtpu_trace_")
    run_step_under_trace(args.model, args.nc, args.size, args.batch,
                         args.steps, trace_dir)
    report = parse_trace(trace_dir, args.steps)
    report["config"] = vars(args)
    print(json.dumps({"category_share": report["category_share"],
                      "per_step_ms": report["per_step_ms"]}, indent=1))
    for op in report["top_ops"][:12]:
        print(json.dumps(op))
    with open(os.path.join(REPO, "BENCH_PROFILE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"full report -> BENCH_PROFILE.json (trace in {trace_dir})")


if __name__ == "__main__":
    main()
