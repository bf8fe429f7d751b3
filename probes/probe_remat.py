"""SOLVER.REMAT memory proof: compiled HBM footprint of the train step
with and without rematerialization, per family.

REMAT (train/steps.py remat_wrap) exists to trade one recomputed forward
for the saved-activation memory of the backward pass — the lever that lets
batch-scaling recipes (BENCH_BATCH_SCALE.json) keep climbing when
activations, not weights, hit the HBM ceiling.  This probe compiles the
REAL train step (same factory the Trainer uses) at a given batch under
SOLVER.REMAT=none / dots / full and MODEL.REMAT_BLOCKS ("blocks") and reads
the executable's own memory analysis (temp/argument/output bytes) plus the
measured step time, so the memory-vs-FLOPs tradeoff is a table, not a claim.

Chip verdict (attn@512 b64, v5e): whole-loss remat saves NOTHING (none
14.3 GB temp, full 15.3 GB — the single remat block keeps the recomputed
forward live through the backward sweep) while block-granular nn.remat
halves it (blocks 7.9 GB) for a 12% step-time cost.

Known harness caveat: the remote AOT compile helper crashes (HTTP 500,
subprocess exit 1) on attn train programs at batch >=192 REGARDLESS of
remat — a compile-service ceiling, not device HBM; the scaling curve
therefore ends at b128 on this rig (see ROUND4.md).

Run on the chip: python probes/probe_remat.py [--family attn] [--batch 64]
CPU shakeout: PROBE_TINY=1 python probes/probe_remat.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

TINY = bool(int(os.environ.get("PROBE_TINY", "0")))
if TINY:
    jax.config.update("jax_platforms", "cpu")

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import (
    Segmentor, make_optimizers, make_src_train_step)

CASES = [  # (name, nc, size, batch) — bench_all geometry
    ("deeplab_resnet101", 19, 512, 16),
    ("gald_hardnet68", 19, 512, 16),
    ("pranet_res2net50", 2, 352, 16),
    ("attn_efficientnet-b2", 2, 512, 64),  # the batch-scaling family
]
if TINY:
    CASES = [("deeplab_resnet18", 3, 32, 2)]


def probe(name, nc, size, batch, remat, iters=6):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    if remat == "blocks":
        cfg.MODEL.REMAT_BLOCKS = True
    else:
        cfg.SOLVER.REMAT = remat
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, nc, (batch, size, size)).astype(np.int32))
    batch_d = {"image": x, "label": y}
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), jnp.bfloat16))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=1000)
    compiled = step.lower(state, batch_d, jnp.float32(0)).compile()
    mem = compiled.memory_analysis()
    row = {"remat": remat}
    if mem is not None:  # TPU backends expose it; CPU may not
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                row[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
    # time the SAME executable we analyzed (calling the jitted step would
    # re-trace and pay the remote compile round-trip a second time)
    state, m = compiled(state, batch_d, jnp.float32(0))
    float(m["loss"])  # sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = compiled(state, batch_d, jnp.float32(0))
    float(m["loss"])
    row["step_ms"] = round((time.perf_counter() - t0) / iters * 1000, 2)
    row["train_images_per_sec"] = round(batch * 1000 / row["step_ms"], 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None,
                    help="substring filter over the case names")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--modes", default="none,dots,full,blocks")
    args = ap.parse_args()
    cases = [c for c in CASES
             if args.family is None or args.family in c[0]]
    out = []
    for name, nc, size, batch in cases:
        if args.batch:
            batch = args.batch
        for remat in args.modes.split(","):
            try:
                row = {"model": name, "size": size, "batch": batch,
                       **probe(name, nc, size, batch, remat)}
            except Exception as e:  # record, continue (compile-helper 500s)
                row = {"model": name, "size": size, "batch": batch,
                       "remat": remat, "error": str(e)[:200]}
            out.append(row)
            print(json.dumps(row), flush=True)
    if TINY:
        return  # CPU shakeout: don't pollute the chip artifact
    # merge with prior runs on (model, size, batch, remat) so partial
    # sweeps (--modes blocks) don't erase earlier rows
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROBE_REMAT.json")
    key = lambda r: (r["model"], str(r["size"]), r["batch"], r["remat"])
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = {key(r): r for r in json.load(f)}
        except Exception:
            pass
    merged.update({key(r): r for r in out})
    with open(path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
