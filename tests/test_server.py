"""Micro-batched HTTP inference server (serve/server.py).

Covers: warmup/readiness, palette-PNG and raw predictions over real HTTP,
deterministic results, concurrent requests sharing device batches, and the
stats surface.  Runs the tiny synthetic-trained deeplab on CPU.
"""

import http.client
import io
import threading
import time

import numpy as np
import pytest
from PIL import Image

from test_e2e import _cfg, _loader

from rnd_semantic_segmentation_tpu.serve.server import (
    InferenceServer, ThreadingHTTPServer, _make_handler)
from rnd_semantic_segmentation_tpu.train.trainer import Trainer
from rnd_semantic_segmentation_tpu.utils import setup_logger


@pytest.fixture(scope="module")
def trained_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("server")
    cfg = _cfg(tmp)
    Trainer("serve_test", cfg, _loader(cfg), 0).train()
    cfg.resume = "latest"
    return cfg


@pytest.fixture(scope="module")
def server(trained_cfg):
    cfg = trained_cfg
    logger = setup_logger("serve_test", cfg.OUTPUT_DIR, 0)
    render = {"palette": list(np.arange(9) * 20)}
    inf = InferenceServer(cfg, render, logger, max_batch=4,
                          batch_timeout_ms=30.0)
    assert inf.ready.wait(300), "server warmup timed out"
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(inf))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield inf, httpd.server_address[1]
    httpd.shutdown()
    inf.shutdown()


def _jpeg_bytes(seed=0):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_healthz_and_predict_roundtrip(server):
    inf, port = server
    status, body = _get(port, "/healthz")
    assert status == 200 and b"ok" in body

    status, ctype, data = _post(port, "/predict", _jpeg_bytes())
    assert status == 200 and ctype == "image/png"
    im = Image.open(io.BytesIO(data))
    assert im.mode == "P" and im.size == (32, 32)
    pred = np.asarray(im)
    assert pred.min() >= 0 and pred.max() < 3  # 3-class model

    # deterministic: same bytes -> same mask
    _, _, data2 = _post(port, "/predict", _jpeg_bytes())
    np.testing.assert_array_equal(np.asarray(Image.open(io.BytesIO(data2))),
                                  pred)

    # raw flavor: L-mode class ids, same values
    status, ctype, raw = _post(port, "/predict?format=raw", _jpeg_bytes())
    assert status == 200
    imr = Image.open(io.BytesIO(raw))
    assert imr.mode == "L"
    np.testing.assert_array_equal(np.asarray(imr), pred)


def test_concurrent_requests_batched(server):
    inf, port = server
    results = [None] * 6
    errors = []

    def worker(i):
        try:
            status, _, data = _post(port, "/predict", _jpeg_bytes(seed=i))
            assert status == 200
            results[i] = np.asarray(Image.open(io.BytesIO(data)))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    before = dict(inf.stats)
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert all(r is not None for r in results)

    status, body = _get(port, "/stats")
    assert status == 200
    import json
    stats = json.loads(body)
    assert stats["requests"] >= before["requests"] + 6
    assert stats["batches"] >= 1
    assert stats["mean_batch_occupancy"] >= 1.0


def test_bucketed_dispatch_shapes():
    """Power-of-two batch buckets: transfer scales with occupancy, graph
    count stays bounded (round-5 latency fix — a lone request at
    --max-batch 64 used to ship a 200 MB padded buffer per dispatch)."""
    buckets = InferenceServer._bucket
    srv = type("S", (), {"max_batch": 64})()
    assert [buckets(srv, n) for n in (1, 2, 3, 4, 5, 17, 33, 64)] == \
        [1, 2, 4, 4, 8, 32, 64, 64]
    srv.max_batch = 6  # non-power-of-two cap still capped correctly
    assert [buckets(srv, n) for n in (1, 5, 6)] == [1, 6, 6]


def test_batching_deadline_semantics(trained_cfg):
    """The dispatcher's deadline contract (VERDICT r4 item 3): after the
    first request arrives, the batch waits at most ``batch_timeout`` for
    companions; a FULL batch dispatches immediately without waiting out the
    deadline.  Driven with a deliberately huge 2 s deadline so both sides
    are unambiguous on a loaded 1-core host."""
    cfg = trained_cfg
    logger = setup_logger("serve_deadline", cfg.OUTPUT_DIR, 0)
    inf = InferenceServer(cfg, {}, logger, max_batch=2,
                          batch_timeout_ms=2000.0)
    assert inf.ready.wait(300), "server warmup timed out"
    try:
        payload = _jpeg_bytes()
        inf.predict(payload)  # warm the preprocess/jit path end-to-end

        # lone request: nothing joins the batch, so it pays the full
        # deadline before dispatch (the latency price of micro-batching)
        t0 = time.monotonic()
        inf.predict(payload)
        lone = time.monotonic() - t0
        assert lone >= 1.6, f"lone request dispatched early: {lone:.2f}s"

        # full batch: two concurrent requests fill max_batch and must
        # dispatch well before the 2 s deadline
        before = inf.snapshot_stats()
        results, errors = [], []

        def worker():
            try:
                results.append(inf.predict(payload))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(2)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        pair = time.monotonic() - t0
        assert not errors and len(results) == 2
        assert pair < 1.5, (f"full batch waited out the deadline: "
                            f"{pair:.2f}s")
        after = inf.snapshot_stats()
        assert after["batches"] == before["batches"] + 1
        assert after["batched_images"] == before["batched_images"] + 2
    finally:
        inf.shutdown()


def test_bad_input_is_a_clean_400(server):
    inf, port = server
    status, ctype, data = _post(port, "/predict", b"this is not an image")
    assert status == 400
    assert b"error" in data


@pytest.mark.slow
def test_server_pranet_family(tmp_path):
    """The daemon must serve every family's probability head — PraNet's
    sigmoid/min-max head differs most from deeplab's softmax."""
    cfg = _cfg(tmp_path, name="pranet_res2net50", nc=2)
    cfg.SOLVER.BASE_LR = 1e-4 * 8  # PraNet spec divides by 8
    Trainer("serve_pranet", cfg, _loader(cfg), 0).train()
    cfg.resume = "latest"
    logger = setup_logger("serve_pranet", str(tmp_path), 0)
    inf = InferenceServer(cfg, {}, logger, max_batch=2, batch_timeout_ms=5.0)
    try:
        assert inf.ready.wait(300)
        pred = inf.predict(_jpeg_bytes(seed=7), timeout=120)
        assert pred.shape == (32, 32)
        assert set(np.unique(pred)) <= {0, 1}
        png = inf.encode_png(pred)  # no palette -> L mode
        assert Image.open(io.BytesIO(png)).mode == "L"
    finally:
        inf.shutdown()


def test_backpressure_rejects_when_queue_full(server):
    """predict() must raise Overloaded (HTTP 429) instead of queueing
    unboundedly once max_queue requests are pending."""
    from rnd_semantic_segmentation_tpu.serve.server import Overloaded

    inf, port = server
    saved = inf.max_queue
    inf.max_queue = 0  # every enqueue now sees a "full" queue
    try:
        with pytest.raises(Overloaded):
            inf.predict(_jpeg_bytes(), timeout=5)
        assert inf.stats["rejected"] >= 1
        status, _, data = _post(port, "/predict", _jpeg_bytes())
        assert status == 429 and b"queue full" in data
    finally:
        inf.max_queue = saved
    # back to normal service after restoring
    status, _, _ = _post(port, "/predict", _jpeg_bytes())
    assert status == 200


def test_daemon_serves_quantized_graph_not_stale_cache(tmp_path):
    """Regression: the warmup trace (no quant scope) must NOT be reused
    after calibration — Conv2d consults the quant context at trace time, so
    a stale jit cache would silently serve the f32 graph while logging
    'calibrated'.  The daemon rebuilds a fresh jit after calibration; this
    asserts the served output actually differs from the pure-f32 head."""
    import functools

    import jax
    import jax.numpy as jnp

    from rnd_semantic_segmentation_tpu.serve import quant_scope

    cfg = _cfg(tmp_path)
    Trainer("serve_quant", cfg, _loader(cfg), 0).train()
    cfg.resume = "latest"
    cfg.TEST.QUANT = "fake"  # deterministic on every backend
    cfg.TEST.QUANT_MIN_CHANNELS = 0
    logger = setup_logger("serve_quant", str(tmp_path), 0)
    inf = InferenceServer(cfg, {}, logger, max_batch=2, batch_timeout_ms=5.0)
    try:
        assert inf.ready.wait(300)
        inf.predict(_jpeg_bytes(seed=3), timeout=120)  # triggers calibration
        assert inf._qctx is not None and inf._qctx.act_scales

        rng = np.random.RandomState(5)
        xb = jnp.asarray(rng.rand(inf.max_batch, 32, 32, 3)
                         .astype(np.float32))
        with quant_scope(inf._qctx):
            p_served = np.asarray(inf._fwd(inf.tester.variables, xb, (32, 32)))
        p_f32 = np.asarray(jax.jit(
            functools.partial(type(inf.tester)._probs_impl, inf.tester),
            static_argnums=(2,))(inf.tester.variables, xb, (32, 32)))
        assert not np.allclose(p_served, p_f32, atol=1e-6), \
            "served graph is numerically identical to f32 — quant not applied"
    finally:
        inf.shutdown()


def test_dispatcher_thread_inherits_trace_time_policies(server, monkeypatch):
    """Regression: trace-time execution policies (MODEL.S2D_MAX_CHANNELS /
    SUBPIXEL_DECONV / FUSED_MBCONV) are contextvars set by build_segmentor in
    the constructing thread, but every serving trace happens in the
    dispatcher thread — which, as a fresh Python thread, starts with an EMPTY
    contextvars context.  The daemon must run its loop inside a copy of the
    constructor's context so the policies are visible at trace time."""
    import rnd_semantic_segmentation_tpu.ops.s2d as s2d

    inf0, _ = server
    seen = []
    real_applies = s2d.s2d_applies

    def spy(*a, **k):
        seen.append(s2d._S2D_POLICY.get())
        return real_applies(*a, **k)

    monkeypatch.setattr(s2d, "s2d_applies", spy)

    cfg = inf0.cfg.clone()
    cfg.MODEL.S2D_MAX_CHANNELS = 4096  # wide enough to gate-check every conv
    logger = setup_logger("serve_ctx", cfg.OUTPUT_DIR, 0)
    inf = InferenceServer(cfg, {}, logger, max_batch=2, batch_timeout_ms=5.0)
    try:
        assert inf.ready.wait(300), "server warmup timed out"
    finally:
        inf.shutdown()
    assert seen, "warmup trace never consulted the s2d policy gate"
    assert max(seen) == 4096, (
        "dispatcher thread traced with the DEFAULT policy — the constructor's "
        "contextvars did not propagate to the trace site")
