#!/usr/bin/env python
"""Secondary benchmark: per-family training throughput (one JSON line each).

The driver consumes root bench.py (single flagship line); this script
documents the wider performance surface on the current chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers, make_src_train_step

CASES = [
    # (name, nc, size, batch)
    ("deeplab_resnet101", 19, 512, 16),
    ("gald_hardnet68", 19, 512, 16),
    ("pranet_res2net50", 2, 352, 16),
    ("attn_efficientnet-b2", 2, 512, 16),
]


def bench(name, nc, size, batch, iters=8, warmup=2):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, nc, size=(batch, size, size)).astype(np.int32))
    batch_d = {"image": x, "label": y}
    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.bfloat16))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=1000)
    for _ in range(warmup):
        state, m = step(state, batch_d, jnp.float32(0))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_d, jnp.float32(0))
    float(m["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    for name, nc, size, batch in CASES:
        try:
            ips = bench(name, nc, size, batch)
            print(json.dumps({"model": name, "size": size, "batch": batch,
                              "train_images_per_sec": round(ips, 2)}), flush=True)
        except Exception as e:  # keep going; per-family OOM etc.
            print(json.dumps({"model": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
