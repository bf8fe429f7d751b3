"""DeepLabV2-R101 dilated-conv probe: is space-to-batch a flagship win?

Gen-2 discovery (probes/_bench.py methodology): the dense 512ch 3x3 @64² runs
at 179 TFLOPs (0.91 MXU) — round-1's "105 TF per-conv ceiling, dilation
irrelevant, space-to-batch <10%" conclusions came from the dispatch/DCE-flawed
harness and must be re-measured.

Hypothesis: a d-dilated 3x3 stride-1 conv is EXACTLY a dense 3x3 conv applied
to each of the d² phase-subsampled grids (space-to-batch, the classic atrous
trick).  Deeplab's layer3 (23 blocks, 256ch d=2) and layer4 (3 blocks, 512ch
d=4) run at 64² with stride 1, and 1x1s/BN/ReLU/residuals all commute with
the phase transform, so a whole stage can run in block space with ONE
transpose pair.  This probe measures, per shape: as-is dilated, dense in
block space (the steady-state cost), and the per-conv s2b round trip (upper
bound on transform overhead).

Reference shapes: /root/reference/core/models/feature_extractor (ResNet101
os=8) — layer3 [16,64,64,1024] bottlenecks 1x1 1024->256, 3x3 256 d2,
1x1 256->1024; layer4 2048/512 d4; ASPP 3x3 d6/12/18/24 2048->19.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

TINY = bool(os.environ.get("PROBE_TINY"))
if TINY:
    jax.config.update("jax_platforms", "cpu")

from probes._bench import time_loop  # noqa: E402

ITERS = 2 if TINY else 25
CHAIN = 2 if TINY else 8
B = 2 if TINY else 16
SZ = 16 if TINY else 64


def space_to_batch(x, d):
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * d * d, h // d, w // d, c)


def batch_to_space(x, d, b0):
    bd, hh, ww, c = x.shape
    x = x.reshape(b0, d, d, hh, ww, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b0, hh * d, ww * d, c)


def bench(name, b, h, w, ci, co, k, d, mode):
    """mode: asis | blockspace | roundtrip"""
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci), jnp.bfloat16)
    ks = [jax.random.normal(jax.random.PRNGKey(i + 1),
                            (k, k, ci, co) if i % 2 == 0 else (k, k, co, ci),
                            jnp.bfloat16) * 0.05 for i in range(CHAIN)]

    def c_dil(x, kk, dd):
        return lax.conv_general_dilated(
            x, kk, (1, 1), "SAME", rhs_dilation=(dd, dd),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if mode == "asis":
        def body(x):
            for kk in ks:
                x = c_dil(x, kk, d)
            return x
    elif mode == "blockspace":
        # steady state: tensor already lives in phase space
        x = space_to_batch(x, d)

        def body(x):
            for kk in ks:
                x = c_dil(x, kk, 1)
            return x
    else:  # roundtrip: per-conv transform overhead upper bound
        def body(x):
            for kk in ks:
                xb = space_to_batch(x, d)
                yb = c_dil(xb, kk, 1)
                x = batch_to_space(yb, d, x.shape[0])
            return x

    dt = time_loop(body, x, iters=ITERS) / CHAIN
    fl = 2 * b * h * w * k * k * ci * co
    print(json.dumps({"case": f"{name} [{mode}]",
                      "us_per_conv": round(dt * 1e6, 1),
                      "tflops": round(fl / dt / 1e12, 2),
                      "mxu_frac": round(fl / dt / 1e12 / 197.0, 3)}),
          flush=True)


def bench_1x1(name, b, h, w, ci, co):
    bench(name, b, h, w, ci, co, 1, 1, "asis")


print(json.dumps({"devices": str(jax.devices())}), flush=True)

D2, D4 = (2, 2) if TINY else (2, 4)
# --- layer3: the bulk (23 blocks) ---
bench("res3 3x3 256 d2 @64", B, SZ, SZ, 256, 256, 3, D2, "asis")
bench("res3 3x3 256 d2 @64", B, SZ, SZ, 256, 256, 3, D2, "blockspace")
bench("res3 3x3 256 d2 @64", B, SZ, SZ, 256, 256, 3, D2, "roundtrip")
# --- layer4 ---
bench("res4 3x3 512 d4 @64", B, SZ, SZ, 512, 512, 3, D4, "asis")
bench("res4 3x3 512 d4 @64", B, SZ, SZ, 512, 512, 3, D4, "blockspace")
bench("res4 3x3 512 d4 @64", B, SZ, SZ, 512, 512, 3, D4, "roundtrip")
# --- the 1x1s around them: do they slow down in block space? ---
bench_1x1("res3 1x1 1024<->256 @64 flat", B, SZ, SZ, 1024, 256)
bench_1x1("res3 1x1 1024<->256 blockspace d2", 4 * B, SZ // 2, SZ // 2, 1024, 256)
bench_1x1("res4 1x1 2048<->512 @64 flat", B, SZ, SZ, 2048, 512)
bench_1x1("res4 1x1 2048<->512 blockspace d4", 16 * B, SZ // 4, SZ // 4, 2048, 512)
# --- dense controls ---
bench("control 3x3 256 d1 @64", B, SZ, SZ, 256, 256, 3, 1, "asis")
bench("control 3x3 512 d1 @64", B, SZ, SZ, 512, 512, 3, 1, "asis")
# --- ASPP attribution (narrow outputs; 4 branches d6/12/18/24 in the model).
# chain needs ci==co round trip; use 2048<->64 as a stand-in pair to keep
# FLOPs comparable per conv (the real head is 2048->19 once per branch).
# h=72 so h % 6 == 0 for the s2b round trip (the model would pad 64->66/72).
SZA, DA = (12, 2) if TINY else (72, 6)
bench("aspp 3x3 2048<->64 d6 @72", B, SZA, SZA, 2048, 64, 3, DA, "asis")
bench("aspp 3x3 2048<->64 d6 @72", B, SZA, SZA, 2048, 64, 3, DA, "roundtrip")
