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

def run_step_under_trace(model, nc, size, batch, steps, trace_dir):
    import jax
    try:  # persistent compile cache: reruns skip the remote-compile round-trip
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
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
    """Aggregate the device 'XLA Ops' row (leaf HLO ops, no step/module
    containers) into per-op-group device time.

    TPU naming note (measured on v5e): convolutions rarely appear under a
    'convolution' name — forward/dgrad convs become `fusion.N` and wgrad
    convs get named after their fused *epilogue* (e.g. the SGD momentum
    update makes the wgrad show up as `multiply_subtract_fusion`).  Duration
    is the tell: a weight-shaped 'elementwise' op taking milliseconds is a
    wgrad conv, not a bandwidth bubble.  Grouping by name prefix keeps those
    distinctions visible instead of mis-binning everything as 'fusion'.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
    dev_pids = {pid for pid, n in proc_names.items()
                if re.search(r"/device:|tpu|accelerator", n, re.I)
                and not re.search(r"host", n, re.I)}
    op_rows = {k for k, n in thread_names.items()
               if k[0] in dev_pids and n == "XLA Ops"}

    per_op = collections.Counter()
    per_group = collections.Counter()
    group_count = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in op_rows:
            continue
        per_op[e["name"]] += e["dur"]  # us
        g = re.sub(r"\.\d+$", "", e["name"])
        per_group[g] += e["dur"]
        group_count[g] += 1

    total = sum(per_op.values())
    top = per_op.most_common(25)
    return {
        "device_pids": sorted(dev_pids),
        "total_device_us": total,
        "per_step_ms": round(total / steps / 1e3, 3),
        "group_share": [
            {"group": g, "share": round(d / max(total, 1), 4),
             "ms_per_step": round(d / steps / 1e3, 2),
             "ops_per_step": group_count[g] // max(steps, 1)}
            for g, d in per_group.most_common(20)],
        "top_ops": [{"name": n[:120], "us": round(d, 1),
                     "share": round(d / max(total, 1), 4)} for n, d in top],
    }


# measured per-model step anatomy (v5e, bf16, batch 16) — kept with the tool
# so re-runs land next to the prior reading
CONCLUSIONS = {
    "deeplab_resnet101": (
        "v5e @512 bf16 b16 (2026-08-16): 145.4 ms/step device time. "
        "fusion(226 ops, fwd+dgrad convs) 32.5% + multiply_subtract_fusion"
        "(108 ops, wgrad convs with the SGD momentum update fused as "
        "epilogue; 8.2 ms each matches the 616-GFLOP 3x3x512x512 wgrad at "
        "~105 TFLOPS) 24.9% + multiply_add_fusion 10.4% => ~70% of the step "
        "is conv MXU work at the measured per-conv ceiling. The largest "
        "non-conv groups — compare_select_fusion (ReLU backward masks on "
        "OS8 activations, 14.9%) and add_add_fusion (residual-grad adds, "
        "9.9%) — are HBM-bandwidth-bound elementwise on [16,64,64,1-2k] "
        "bf16 tensors and run at/above naive roofline estimates. No "
        "non-conv bubble >5% exists that XLA has not already fused."),
    "gald_hardnet68": (
        "v5e @512 bf16 b16 (2026-08-17): 111.5 ms/step device time. "
        "fusion(444 ops, convs) 55% + convert_reduce_fusion(170 ops, convs "
        "fused with the trainable-BN batch-stat f32 reductions — HarDNet "
        "trains its BN like the reference) 29.9% + convolution_* 2% => "
        "~87% of the step is conv MXU work; remaining groups are all <3%. "
        "No bubble; at the per-conv ceiling like deeplab."),
    "pranet_res2net50": (
        "v5e @352 bf16 b16 (2026-08-17): 34.0 ms/step device time. "
        "fusion 42.8% + convert_reduce_fusion (convs + trainable-BN stats) "
        "39.1% => ~82% conv MXU work. copy-done 8.8% (4618 small copies — "
        "Res2Net's per-Bottle2neck scale-split/concat structure; inherent "
        "to the architecture, not worth restructuring for 3 ms). No other "
        "group >2%."),
    "attn_efficientnet-b2": (
        "v5e @512 bf16 b16 (2026-08-17): 104.1 ms/step device time. "
        "fusion 43.4% + convert_reduce_fusion 29.7% + "
        "multiply_subtract_fusion (wgrads) 6.6% + convolution_* 2.6% => "
        "~82% conv MXU work. copy 7.4% (layout copies around depthwise/"
        "ConvTranspose) and reverse 2.6% (ConvTranspose kernel flips) are "
        "the only non-conv groups >2% — both inherent, both small."),
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
    report["conclusion"] = CONCLUSIONS.get(args.model, "")
    print(json.dumps({"per_step_ms": report["per_step_ms"]}))
    for g in report["group_share"][:12]:
        print(json.dumps(g))
    suffix = ("" if args.model == "deeplab_resnet101"
              else "_" + re.sub(r"[^A-Za-z0-9]+", "_", args.model).upper())
    out = os.path.join(REPO, f"BENCH_PROFILE{suffix}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"full report -> {out} (trace in {trace_dir})")


if __name__ == "__main__":
    main()
