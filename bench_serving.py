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

try:  # persistent compile cache: reruns skip the remote-compile round-trip
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
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
    return seg, cfg


def bench_mode(seg, size, batch, mode, iters=20, warmup=3, min_channels=None,
               repair_floor=None):
    h, w = (size, size) if isinstance(size, int) else size
    from rnd_semantic_segmentation_tpu.serve import (
        QuantConfig, calibrate_segmentor, quant_scope, resolve_mode)

    rng = np.random.RandomState(0)
    in_dtype = jnp.bfloat16 if mode != "f32" else jnp.float32
    x = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32)
                    ).astype(in_dtype)
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), in_dtype))
    params = {n: dict(v)["params"] for n, v in variables.items()}
    stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
             for n, v in variables.items()}

    @jax.jit
    def fwd(params, image):
        outputs, _, _ = seg.forward(params, stats, image,
                                    label_size=(h, w), train=False)
        return jnp.argmax(outputs[0].astype(jnp.float32), axis=-1)

    ctx = None
    repair_info = None
    if mode in ("int8", "fake"):
        resolved = resolve_mode(mode)
        qkw = {} if min_channels is None else {"min_channels": min_channels}
        ctx = calibrate_segmentor(
            seg, variables, [{"image": x}],
            config=QuantConfig(mode=resolved, calib_batches=1, **qkw))
        mode = resolved
        if repair_floor:
            # per-layer sensitivity repair (serve/quant.py): exclude the
            # worst-quantizing convs until the agreement floor holds, then
            # bench the REPAIRED graph
            from rnd_semantic_segmentation_tpu.serve.quant import (
                repair_exclusions)

            def probs_fn(xx, ls):
                outputs, _, _ = seg.forward(params, stats, xx,
                                            label_size=ls, train=False)
                return outputs[0].astype(jnp.float32)

            agreement, excluded = repair_exclusions(
                probs_fn, x, (h, w), ctx, float(repair_floor))
            repair_info = {"agreement": round(agreement, 5),
                           "excluded_convs": len(excluded)}

    scope = quant_scope(ctx)
    with scope:
        for _ in range(warmup):
            out = fwd(params, x)
        np.asarray(out[0, 0, 0])  # hard sync (tunnel-safe timing boundary)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x)
        np.asarray(out[0, 0, 0])  # scalar sync: timing boundary only
        dt = time.perf_counter() - t0
        pred = np.asarray(out)    # full argmax map (for the agreement row),
                                  # fetched OUTSIDE the timed region — the
                                  # 16MB device->host pull through the tunnel
                                  # is not eval throughput
    if repair_floor:
        return batch * iters / dt, mode, pred, repair_info
    return batch * iters / dt, mode, pred


# (model, num_classes, size, batch) — same geometry as bench_all.py
CASES = [
    ("deeplab_resnet101", 19, 512, 16),
    ("gald_hardnet68", 19, 512, 16),
    ("pranet_res2net50", 2, 352, 16),
    ("attn_efficientnet-b2", 2, 512, 16),
    # the reference's Cityscapes distill-test geometry (INPUT_SIZE_TEST
    # [2048,1024], configs/deeplabv2_r101_tgt_self_distill.yaml:12)
    ("gald_hardnet68@1024x2048", 19, (1024, 2048), 2),
]


def bench_latency(max_batches=(16, 64, 128), lone_reqs=24, load_reqs=96,
                  load_concurrency=8, size=512):
    """p50/p95 request latency vs ``--max-batch`` through the REAL daemon
    (serve/server.py over HTTP) — the latency price of the throughput
    recommendation in docs/SERVING.md (VERDICT r4 item 3).

    The padded-batch design means every dispatch runs the full max_batch
    shape, so a lone request pays the whole big-batch step: that price is
    measured at concurrency 1 ("lone" rows).  The "load" rows add a small
    closed-loop client pool; NOTE on 1-core hosts the per-request host
    preprocessing (decode+resize+normalize in handler threads) binds
    observed throughput long before the chip does — the latency columns are
    the meaningful product here, the load throughput column is host-bound.
    """
    import io
    import tempfile
    import threading

    import jax.numpy as jnp
    from PIL import Image

    from rnd_semantic_segmentation_tpu.ckpt.orbax_io import save_checkpoint
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.serve.server import (
        InferenceServer, ThreadingHTTPServer, _make_handler)
    from rnd_semantic_segmentation_tpu.train import (
        Segmentor, make_optimizers)
    from rnd_semantic_segmentation_tpu.utils import setup_logger

    tmp = tempfile.mkdtemp()
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "attn_efficientnet-b2"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = True
    cfg.AUG.NAME = "attn"
    cfg.INPUT.INPUT_SIZE_TEST = (size, size)
    cfg.OUTPUT_DIR = tmp
    # random-init weights: latency does not depend on the values
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, cfg.MODEL.NUM_CLASSES)
    import jax as _jax
    variables = seg.init(_jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), jnp.float32))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    cfg.resume = save_checkpoint(f"{tmp}/{spec.ckpt_prefix}-1", state, 1)

    # one canned JPEG reused by every request (client-side encode is free)
    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)
                    ).save(buf, format="JPEG", quality=90)
    payload = buf.getvalue()
    logger = setup_logger("bench_latency", tmp, 0)

    def one_request(port, timings=None):
        import http.client
        t0 = time.perf_counter()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict?format=raw", body=payload,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        resp.read()
        conn.close()
        assert resp.status == 200, resp.status
        if timings is not None:
            timings.append(time.perf_counter() - t0)

    rows = []
    for mb in max_batches:
        inf = InferenceServer(cfg, {}, logger, max_batch=mb,
                              batch_timeout_ms=5.0)
        assert inf.ready.wait(3600), "warmup timed out"
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(inf))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            one_request(port)  # prime the HTTP path
            lone = []
            for _ in range(lone_reqs):
                one_request(port, lone)
            load = []
            per_client = load_reqs // load_concurrency
            threads = [threading.Thread(
                target=lambda: [one_request(port, load)
                                for _ in range(per_client)])
                for _ in range(load_concurrency)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            load_dt = time.perf_counter() - t0
            stats = inf.snapshot_stats()
            row = {"bench": "daemon_latency",
                   "model": cfg.MODEL.NAME, "size": size, "max_batch": mb,
                   "lone_p50_ms": round(float(np.percentile(lone, 50)) * 1e3, 1),
                   "lone_p95_ms": round(float(np.percentile(lone, 95)) * 1e3, 1),
                   "load_concurrency": load_concurrency,
                   "load_p50_ms": round(float(np.percentile(load, 50)) * 1e3, 1),
                   "load_p95_ms": round(float(np.percentile(load, 95)) * 1e3, 1),
                   "load_images_per_sec_host_bound": round(len(load) / load_dt, 1),
                   "mean_batch_occupancy": round(
                       stats["batched_images"] / max(stats["batches"], 1), 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        finally:
            httpd.shutdown()
            inf.shutdown()
    out = os.path.join(REPO, "BENCH_SERVING_LATENCY.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="run one family (default: all four)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--min-channels", type=int, default=None,
                    help="override QuantConfig.min_channels for this run")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the per-case batch size (throughput-"
                         "optimal-batch probe; eval batch is semantically "
                         "free, unlike train)")
    ap.add_argument("--latency", action="store_true",
                    help="daemon latency curve: p50/p95 request latency vs "
                         "max_batch through the real HTTP server; writes "
                         "BENCH_SERVING_LATENCY.json and exits")
    args = ap.parse_args()
    if args.latency:
        bench_latency()
        return
    if args.batch and args.model is None:
        ap.error("--batch is a probe flag: combine with --model so the "
                 "committed BENCH_SERVING.json stays default-config")

    # substring match like bench_all --family; exact-match used to let a
    # typo (or a family shorthand) select zero cases and exit 0 silently
    cases = [c for c in CASES if args.model is None or args.model in c[0]]
    if not cases:
        ap.error(f"--model {args.model!r} matches none of "
                 f"{[c[0] for c in CASES]}")
    if args.batch:
        cases = [(n, nc, sz, args.batch) for n, nc, sz, _ in cases]
    rows = []
    for case_name, nc, size, batch in cases:
        model = case_name.split("@")[0]
        preds = {}
        for mode in ("bf16", "int8"):
            seg, case_cfg = build(model, nc, "bfloat16")
            try:
                ips, resolved, pred = bench_mode(seg, size, batch, mode,
                                                 iters=args.iters,
                                                 min_channels=args.min_channels)
            except Exception as e:
                rows.append({"model": case_name, "mode": mode,
                             "error": f"{type(e).__name__}: {e}"[:300]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            preds[mode] = pred
            row = {"model": case_name, "size": size, "batch": batch,
                   "mode": mode, "resolved_mode": resolved,
                   "eval_images_per_sec": round(ips, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        if len(preds) == 2:
            # accuracy proxy: pixelwise argmax agreement int8 vs bf16
            agree = float((preds["bf16"] == preds["int8"]).mean())
            ok = [r for r in rows if r.get("model") == case_name
                  and "eval_images_per_sec" in r]
            # what would TEST.QUANT=auto resolve here?  Same policy as
            # eval/tester.py + serve/server.py: geometry gate
            # (resolve_mode) then the calibration argmax-agreement floor.
            # Gates come from the SAME cfg the benched case was built with,
            # so per-case QUANT_* overrides change this column too.
            from rnd_semantic_segmentation_tpu.serve.quant import resolve_mode
            _c = case_cfg.TEST
            h, w = (size, size) if isinstance(size, int) else size
            geo = resolve_mode("auto", area=h * w,
                               max_area=_c.QUANT_MAX_AREA)
            repaired_row = None
            if geo == "none":
                auto, reason = "bf16", f"area {h*w} > {_c.QUANT_MAX_AREA}"
            elif agree < _c.QUANT_AGREEMENT_FLOOR:
                # the Tester's auto mode now attempts per-layer sensitivity
                # repair before falling back — bench the repaired graph too
                seg, _ = build(model, nc, "bfloat16")
                try:
                    r_ips, _, r_pred, r_info = bench_mode(
                        seg, size, batch, "int8", iters=args.iters,
                        min_channels=args.min_channels,
                        repair_floor=_c.QUANT_AGREEMENT_FLOOR)
                except Exception as e:
                    r_info = {"error": f"{type(e).__name__}: {e}"[:200]}
                if r_info and "agreement" in r_info:
                    r_agree = float((preds["bf16"] == r_pred).mean())
                    repaired_row = {
                        "model": case_name, "mode": "int8_repaired",
                        "eval_images_per_sec": round(r_ips, 2),
                        "excluded_convs": r_info["excluded_convs"],
                        "bf16_argmax_agreement": round(r_agree, 5)}
                    rows.append(repaired_row)
                    print(json.dumps(repaired_row), flush=True)
                if (repaired_row and repaired_row["bf16_argmax_agreement"]
                        >= _c.QUANT_AGREEMENT_FLOOR):
                    auto = "int8_repaired"
                    reason = (f"repaired: {repaired_row['excluded_convs']} "
                              f"convs excluded, agreement "
                              f"{repaired_row['bf16_argmax_agreement']:.3f}")
                else:
                    auto, reason = "bf16", (f"agreement {agree:.3f} < "
                                            f"{_c.QUANT_AGREEMENT_FLOOR}"
                                            " (repair insufficient)")
            else:
                auto, reason = geo, "passes geometry + agreement gates"
            summary = {"model": case_name,
                       "int8_speedup_vs_bf16":
                           round(ok[1]["eval_images_per_sec"]
                                 / ok[0]["eval_images_per_sec"], 3),
                       "int8_bf16_argmax_agreement": round(agree, 5),
                       "auto_resolves": auto, "auto_reason": reason}
            if repaired_row:
                summary["int8_repaired_speedup_vs_bf16"] = round(
                    repaired_row["eval_images_per_sec"]
                    / ok[0]["eval_images_per_sec"], 3)
            rows.append(summary)
            print(json.dumps(summary), flush=True)

    if args.min_channels is not None or args.batch is not None:
        return  # probe run: don't overwrite the default-config artifact
    out = os.path.join(REPO, "BENCH_SERVING.json")
    prev = []
    if os.path.exists(out) and args.model is not None:
        with open(out) as f:
            try:
                prev = json.load(f)
            except Exception:
                prev = []
        prev = [r for r in prev if r.get("model") != args.model]
    with open(out, "w") as f:
        json.dump(prev + rows, f, indent=1)


if __name__ == "__main__":
    main()
