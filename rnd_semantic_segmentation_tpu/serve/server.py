"""Micro-batched HTTP inference server — the production serving surface.

The reference stops at a single-image CLI (/root/reference/inference.py);
a TPU chip at batch 1 is mostly idle, so real serving wants *micro-batching*:
concurrent requests are gathered into one fixed-shape device batch (padding
to ``max_batch`` keeps a single compiled XLA graph hot for every load
level), run through the same jitted ``Tester`` probability head the offline
eval uses — including the ``TEST.QUANT int8`` path — and fanned back out.

Endpoints:
  * ``POST /predict``  image bytes (JPEG/PNG) -> palette-PNG mask
    (``?format=raw`` returns the HxW uint8 class-id PNG without a palette)
  * ``GET  /healthz``  readiness (200 once the model is compiled+warm)
  * ``GET  /stats``    request/batch counters incl. mean batch occupancy

Design notes (TPU-first):
  * one dispatcher thread owns the device; handler threads only enqueue and
    wait — no lock contention around jax calls, requests pipeline naturally.
  * batch shapes are static power-of-two BUCKETS up to ``max_batch``:
    requests are padded to the smallest bucket that fits, so the compiled
    graph count is bounded at log2(max_batch)+1 while the host->device
    transfer scales with actual occupancy instead of always shipping a
    max_batch-sized buffer (all buckets warm before /healthz flips).
  * preprocessing reuses the family's test ``Augmenter`` transform, so the
    server is bit-identical to ``test.py`` eval for any family/checkpoint.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

__all__ = ["InferenceServer", "Overloaded", "serve_forever"]


class Overloaded(RuntimeError):
    """Queue full — the HTTP layer maps this to 429 so load balancers can
    back off instead of piling requests onto an already-saturated chip."""


class _Pending:
    __slots__ = ("image", "event", "pred", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.pred: Optional[np.ndarray] = None
        self.error: Optional[str] = None


class InferenceServer:
    def __init__(self, cfg, render: dict, logger, max_batch: int = 8,
                 batch_timeout_ms: float = 5.0, max_queue: int = 0):
        from ..data.augment import Augmenter
        from ..eval.tester import Tester

        self.cfg = cfg
        self.logger = logger
        self.palette = list(render.get("palette", [])) or None
        self.max_batch = int(max_batch)
        self.batch_timeout = float(batch_timeout_ms) / 1e3
        # backpressure: reject beyond this many queued requests (default 8
        # full batches — bounded latency instead of an unbounded pile-up)
        self.max_queue = int(max_queue) or 8 * self.max_batch
        self.transform = Augmenter(cfg, mode="test",
                                   is_source=False).build_transform()

        h, w = self._shape()

        class _ShapeLoader:
            """One zero batch: Tester samples it to size its init template."""

            def __iter__(self):
                yield {"image": np.zeros((1, h, w, 3), np.float32),
                       "label": np.zeros((1, h, w), np.int32),
                       "name": ["warmup"]}

            def __len__(self):
                return 1

        self.tester = Tester(cfg, _ShapeLoader(), logger)
        self.tester._load_checkpoint()
        # TEST.QUANT: activation scales are calibrated lazily on the FIRST
        # real batch (the shape loader is zeros — useless for calibration).
        # The geometry half of the "auto" policy resolves NOW (the serving
        # shape is fixed), so an HBM-bound geometry never waits on a
        # pointless calibration compile.
        self._qctx = None
        self._quant_mode = "none"
        if cfg.TEST.QUANT != "none":
            from .quant import resolve_mode
            self._quant_mode = resolve_mode(
                cfg.TEST.QUANT, area=h * w,
                max_area=cfg.TEST.QUANT_MAX_AREA)
            if self._quant_mode == "none":
                logger.info(
                    f"TEST.QUANT={cfg.TEST.QUANT}: {w}x{h} exceeds "
                    f"QUANT_MAX_AREA={cfg.TEST.QUANT_MAX_AREA} (HBM-bound "
                    f"regime) — serving bf16")
        self._needs_calib = self._quant_mode != "none"
        self._fwd = self._fresh_fwd()

        self._queue: List[_Pending] = []
        self._cv = threading.Condition()
        self._stop = threading.Event()
        self.ready = threading.Event()
        # dict '+= 1' is not atomic across handler threads + the dispatcher;
        # every mutation goes through _count() under this lock
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "batched_images": 0,
                      "errors": 0, "rejected": 0}
        # The dispatcher thread owns every trace, but a fresh Python thread
        # starts with an EMPTY contextvars context — the trace-time execution
        # policies build_segmentor set in this (main) thread (s2d / subpixel /
        # fused-MBConv contextvars) would silently read their defaults there.
        # Run the loop inside a copy of the constructing thread's context so
        # every policy propagates (quant_scope is entered inside the loop and
        # composes fine with ctx.run).
        import contextvars
        ctx = contextvars.copy_context()
        self._thread = threading.Thread(
            target=lambda: ctx.run(self._dispatch_loop), daemon=True)
        self._thread.start()

    # -- preprocessing -------------------------------------------------------
    def preprocess(self, data: bytes) -> np.ndarray:
        from PIL import Image

        from ..data.loader import preprocess_eval_image

        h, w = self._shape()
        image = Image.open(io.BytesIO(data)).convert("RGB")
        if image.size != (w, h):
            # the serving geometry is fixed (one compiled graph); resize
            # up front with the same bicubic the test Resize transform uses
            image = image.resize((w, h), Image.BICUBIC)
        return preprocess_eval_image(image, self.transform)

    # -- device loop ---------------------------------------------------------
    def _bucket(self, n: int) -> int:
        """Smallest power-of-two batch bucket >= n (capped at max_batch).

        Dispatching every batch at the full ``max_batch`` shape kept exactly
        one compiled graph but shipped a max_batch-sized host->device buffer
        PER DISPATCH regardless of occupancy — at --max-batch 64 @512² that
        is 200 MB per request under light load, which dominates request
        latency on PCIe-constrained or remote-device hosts (measured: lone-
        request p50 815 ms at b16 vs 5.2 s at b64 through the remote-TPU
        link).  Power-of-two buckets bound the graph count at
        log2(max_batch)+1 while the transfer scales with actual load."""
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _warmup(self):
        import jax.numpy as jnp

        h, w = self._shape()
        # warm EVERY bucket so no real request ever pays a compile
        b = 1
        while True:
            b = self._bucket(b)
            self._run(jnp.asarray(np.zeros((b, h, w, 3), np.float32)))
            if b >= self.max_batch:
                break
            b *= 2
        self.ready.set()
        self.logger.info(
            f"server warm: batch buckets <= {self.max_batch} @ {h}x{w}"
            + (f", quant={self.cfg.TEST.QUANT}"
               if self.cfg.TEST.QUANT != "none" else ""))

    def _shape(self):
        size = self.cfg.INPUT.INPUT_SIZE_TEST
        return int(size[1]), int(size[0])  # (H, W) from (W, H) convention

    def _fresh_fwd(self):
        """A freshly-jitted probability head.  Conv2d consults the quant
        context at TRACE time, so after (re)calibration the old jit cache —
        traced without the scope — would silently keep serving the f32
        graph; a fresh wrapper over the unjitted ``_probs_impl`` guarantees
        the first call under the new scope traces the quantized graph."""
        import functools

        import jax

        return jax.jit(functools.partial(type(self.tester)._probs_impl,
                                         self.tester), static_argnums=(2,))

    def _calibrate(self, x):
        from . import QuantConfig, calibrate_segmentor
        from .quant import argmax_agreement

        mode = self._quant_mode
        ctx = calibrate_segmentor(
            self.tester.segmentor, self.tester.variables, [{"image": x}],
            config=QuantConfig(
                mode=mode, calib_batches=1,
                min_channels=self.cfg.TEST.QUANT_MIN_CHANNELS))
        floor = float(self.cfg.TEST.QUANT_AGREEMENT_FLOOR)
        if floor > 0:
            import functools
            agreement = argmax_agreement(
                functools.partial(type(self.tester)._probs_impl, self.tester,
                                  self.tester.variables),
                x, tuple(x.shape[1:3]), ctx)
            if agreement < floor and self.cfg.TEST.QUANT == "auto":
                # per-layer sensitivity repair before giving up (same policy
                # as eval/tester.py make_quant_context)
                max_ex = int(getattr(self.cfg.TEST, "QUANT_REPAIR_MAX", 0))
                if max_ex > 0:
                    from .quant import repair_exclusions
                    agreement, excluded = repair_exclusions(
                        functools.partial(type(self.tester)._probs_impl,
                                          self.tester, self.tester.variables),
                        x, tuple(x.shape[1:3]), ctx, floor,
                        max_exclude=max_ex, logger=self.logger)
                if agreement < floor:
                    self._needs_calib = False
                    self.logger.info(
                        f"TEST.QUANT=auto: argmax agreement {agreement:.3f} "
                        f"< floor {floor} even after repair — serving bf16")
                    return
            elif agreement < floor:
                self.logger.warning(
                    f"TEST.QUANT={self.cfg.TEST.QUANT}: argmax agreement "
                    f"{agreement:.3f} < floor {floor}; honoring the explicit "
                    f"request — set TEST.QUANT auto to gate on accuracy")
        self._qctx = ctx
        self._needs_calib = False
        self._fwd = self._fresh_fwd()  # drop the unquantized trace cache
        self.logger.info(
            f"serving quantization calibrated on first batch: mode={mode}, "
            f"convs={len(self._qctx.act_scales)} (fresh compile follows)")

    def _run(self, x, n: Optional[int] = None):
        """Returns the first ``n`` argmax maps (default: all rows).

        The argmax + uint8 cast happen ON DEVICE (jitted) and only the
        occupied rows are fetched — at batch 16 @512² this is 1 MB/row
        instead of a 16 MB int32 pull for the whole padded batch, which
        matters through the remote-device link.
        """
        import jax
        import jax.numpy as jnp

        from . import quant_scope

        if not hasattr(self, "_postproc"):
            self._postproc = jax.jit(
                lambda p: jnp.argmax(p, axis=-1).astype(jnp.uint8))
        with quant_scope(self._qctx):
            probs = self._fwd(self.tester.variables, x,
                              tuple(x.shape[1:3]))
        preds = self._postproc(probs)
        n = preds.shape[0] if n is None else n
        # per-row static slices: one cached gather per index, k pulls of
        # H*W bytes each instead of one max_batch-sized pull
        return [np.asarray(preds[i]) for i in range(n)]

    def _dispatch_loop(self):
        try:
            self._warmup()
        except Exception as e:  # surface init failures via /healthz
            self.logger.error(f"server warmup failed: {e}")
            return
        h, w = self._shape()
        import jax.numpy as jnp

        while not self._stop.is_set():
            with self._cv:
                while not self._queue and not self._stop.is_set():
                    self._cv.wait(timeout=0.1)
                if self._stop.is_set():
                    return
                deadline = time.monotonic() + self.batch_timeout
                while (len(self._queue) < self.max_batch
                       and time.monotonic() < deadline):
                    self._cv.wait(timeout=max(deadline - time.monotonic(), 0))
                batch = self._queue[:self.max_batch]
                del self._queue[:len(batch)]
            try:
                x = np.zeros((self._bucket(len(batch)), h, w, 3), np.float32)
                for i, p in enumerate(batch):
                    x[i] = p.image
                if self._needs_calib:
                    self._calibrate(jnp.asarray(x))
                preds = self._run(jnp.asarray(x), n=len(batch))
                for i, p in enumerate(batch):
                    p.pred = preds[i]
            except Exception as e:
                for p in batch:
                    p.error = str(e)  # counted once per request in predict()
            self._count("batches")
            self._count("batched_images", len(batch))
            for p in batch:
                p.event.set()

    # -- public API ----------------------------------------------------------
    def _count(self, key: str, n: int = 1) -> None:
        with self._stats_lock:
            self.stats[key] += n

    def snapshot_stats(self) -> dict:
        with self._stats_lock:
            return dict(self.stats)

    def predict(self, data: bytes, timeout: float = 60.0) -> np.ndarray:
        self._count("requests")
        try:
            img = self.preprocess(data)
        except Exception:
            self._count("errors")
            raise
        h, w = self._shape()
        if img.shape != (h, w, 3):
            self._count("errors")
            raise ValueError(f"transform produced {img.shape}, want {(h, w, 3)}")
        pending = _Pending(img)
        with self._cv:
            if len(self._queue) >= self.max_queue:
                self._count("rejected")
                raise Overloaded(
                    f"queue full ({self.max_queue} pending)")
            self._queue.append(pending)
            self._cv.notify()
        if not pending.event.wait(timeout):
            self._count("errors")
            raise TimeoutError("prediction timed out")
        if pending.error:
            self._count("errors")
            raise RuntimeError(pending.error)
        return pending.pred

    def encode_png(self, pred: np.ndarray, with_palette: bool = True) -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        if with_palette and self.palette:
            im = Image.fromarray(pred, mode="P")
            im.putpalette(self.palette)
        else:
            im = Image.fromarray(pred, mode="L")
        im.save(buf, format="PNG")
        return buf.getvalue()

    def shutdown(self):
        self._stop.set()
        with self._cv:
            self._cv.notify_all()


def _make_handler(server: InferenceServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            server.logger.info("http: " + fmt % args)

        def _send(self, code, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                if server.ready.is_set():
                    # "pending-calibration": the f32 graph is warm, but the
                    # first real batch still pays the quantized recompile —
                    # load balancers that need full warmth can gate on it
                    quant = ("pending-calibration" if server._needs_calib
                             else "ready")
                    self._send(200, json.dumps(
                        {"status": "ok", "quant": quant}).encode())
                else:
                    self._send(503, b'{"status": "warming"}')
            elif self.path.startswith("/stats"):
                s = server.snapshot_stats()
                s["mean_batch_occupancy"] = round(
                    s["batched_images"] / max(s["batches"], 1), 3)
                s["ready"] = server.ready.is_set()
                s["model"] = server.cfg.MODEL.NAME
                s["quant"] = (server._qctx.mode if server._qctx is not None
                              else ("pending-calibration"
                                    if server._needs_calib else "none"))
                self._send(200, json.dumps(s).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._send(404, b'{"error": "not found"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                pred = server.predict(data)
            except Overloaded as e:
                self.send_response(429)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except Exception as e:  # predict() already counted the error
                self._send(400, json.dumps({"error": str(e)[:300]}).encode())
                return
            raw = "format=raw" in (self.path.split("?", 1) + [""])[1]
            self._send(200, server.encode_png(pred, with_palette=not raw),
                       ctype="image/png")

    return Handler


def serve_forever(cfg, render, logger, host="127.0.0.1", port=8500,
                  max_batch=8, batch_timeout_ms=5.0):
    inf = InferenceServer(cfg, render, logger, max_batch=max_batch,
                          batch_timeout_ms=batch_timeout_ms)
    httpd = ThreadingHTTPServer((host, port), _make_handler(inf))
    logger.info(f"serving {cfg.MODEL.NAME} on http://{host}:{port}")
    try:
        httpd.serve_forever()
    finally:
        inf.shutdown()
