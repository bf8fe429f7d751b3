"""Post-training int8 quantization for the inference/serving path.

TPU v5e executes s8 x s8 -> s32 matmuls/convolutions on the MXU at twice the
bf16 rate (394 TOPS vs 197 TFLOPS), so a quantized eval path is a genuine
serving lever, not just a memory trick.  The reference framework has no
quantization story at all (its serving surface is test.py/inference.py running
f32 eval, /root/reference/test.py:24-60); this module adds the TPU-native one.

Design (AQT-style in-graph quantization — no parallel "quantized checkpoint"
artifact to manage):

  * **Activations**: per-conv static scales from a calibration pass.
    ``calibrate_segmentor`` runs N batches through the eager forward with the
    context in ``calibrate`` mode; every ``Conv2d`` records the absmax of its
    input, keyed by its Flax module path.  Scales are plain floats, baked into
    the jitted graph as constants.
  * **Weights**: per-output-channel symmetric scales, computed in-graph from
    the f32 params (one cheap elementwise pass, fused by XLA; params stay f32
    so checkpoints/importers are untouched).
  * **Compute**: ``lax.conv_general_dilated`` on int8 operands with
    ``preferred_element_type=int32``, rescaled to f32 by ``sx * sw`` and the
    bias added in f32.
  * **Modes**: ``int8`` (real int8 conv), ``fake`` (quantize-dequantize in
    f32 — same quantized values, equivalent up to f32-vs-int32 accumulation
    rounding; for platforms without int8 conv support and for isolating
    accuracy effects from kernel effects), ``calibrate``.

Hook: ``models.layers.Conv2d`` consults ``current_quant()`` at *trace* time.
Enter ``quant_scope(ctx)`` around both calibration and the jit-compiled eval
calls; a jit cache populated without the scope will not re-trace, so build
fresh jitted callables (a fresh ``Tester``) per quant configuration.

Convs are skipped (left in f32/bf16) when their path matches
``QuantConfig.skip_patterns`` — by default the final classifier convs, the
standard PTQ practice of keeping the logit-producing layer in high precision.
"""

from __future__ import annotations

import contextlib
import contextvars
import fnmatch
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_QCTX: contextvars.ContextVar = contextvars.ContextVar(
    "segtpu_quant_ctx", default=None)


@dataclass
class QuantConfig:
    mode: str = "int8"                       # int8 | fake
    calib_batches: int = 2
    # final logit convs stay f32 by default (classifier heads / score layers)
    skip_patterns: Tuple[str, ...] = (
        "*classifier*", "*conv_out*", "*score*", "*cls*", "*out_0*",
    )
    # percentile of per-batch absmax used as the activation scale; 1.0 = max
    calib_percentile: float = 1.0
    # grouped/depthwise convs are bandwidth- not MXU-bound and int8 grouped
    # conv support varies by backend — keep them in bf16/f32 by default
    quantize_grouped: bool = False
    # only quantize convs with in/out channels >= this.  Measured on v5e
    # with a 30-conv chained microbench (per-conv quant overhead included):
    # c=26 int8 loses (0.76-0.94x) however padded, c=64 is ~1.0-1.18x,
    # c=104 1.25x, c=256 1.5x, c=512 1.73x.  Below 64 channels the quantize/
    # rescale passes outweigh the MXU gain — keep those convs bf16.
    min_channels: int = 64
    # pad channel dims to this multiple before the int8 conv (zeros contribute
    # nothing; output columns are sliced off).  v5e microbench: odd widths
    # take a slow lowering (c=214 unpadded 0.88x vs bf16) and padding to the
    # int8 tile boundary rescues them (c=214 pad128 -> 1.36x, c=104 pad32 ->
    # 1.25x).  Rule: pad to 32 below 128 channels, to 128 above.
    pad_channels: bool = True


@dataclass
class QuantContext:
    """Carries calibration state and scales across Conv2d call sites."""

    config: QuantConfig = field(default_factory=QuantConfig)
    mode: str = "int8"                        # calibrate | int8 | fake
    act_scales: Dict[str, float] = field(default_factory=dict)
    observed: Dict[str, List[float]] = field(default_factory=dict)
    # per-conv input absmax collected during a (possibly jit-traced) forward;
    # values are tracers under jit — return them from the traced fn to realise
    traced: Dict[str, List[jnp.ndarray]] = field(default_factory=dict)
    # calibrated-but-excluded convs (sensitivity repair, repair_exclusions):
    # these take the normal bf16/f32 path even though a scale exists
    exclude: set = field(default_factory=set)
    # probe mode: quantized convs additionally record their LOCAL relative
    # output error vs the unquantized conv on the same (quantized-upstream)
    # input — one forward yields a per-conv error ranking (tracers under jit)
    probe: bool = False
    err_traced: Dict[str, jnp.ndarray] = field(default_factory=dict)

    # -- path filtering ------------------------------------------------------
    def _skipped(self, path: str) -> bool:
        if path in self.exclude:
            return True
        return any(fnmatch.fnmatch(path, p) for p in self.config.skip_patterns)

    # -- calibration ---------------------------------------------------------
    def record(self, path: str, x: jnp.ndarray) -> None:
        if self._skipped(path):
            return
        self.traced.setdefault(path, []).append(
            jnp.max(jnp.abs(x.astype(jnp.float32))))

    def traced_maxes(self) -> Dict[str, jnp.ndarray]:
        """Reduce multiple call sites of the same conv (weight sharing) to one
        scalar per path.  Under jit these are tracers: return them as outputs."""
        return {p: (v[0] if len(v) == 1 else jnp.maximum(*v[:2]) if len(v) == 2
                    else jnp.max(jnp.stack(v)))
                for p, v in self.traced.items()}

    def absorb(self, maxes: Dict[str, float]) -> None:
        for path, v in maxes.items():
            self.observed.setdefault(path, []).append(float(v))

    def finalize_scales(self) -> Dict[str, float]:
        if not self.observed and self.traced:
            # eager calibration path: realise the traced values directly
            self.absorb({p: float(v) for p, v in self.traced_maxes().items()})
        pct = self.config.calib_percentile
        for path, maxes in self.observed.items():
            v = (max(maxes) if pct >= 1.0
                 else float(np.quantile(np.asarray(maxes), pct)))
            # zero-input conv (e.g. dead branch during calibration): keep f32
            if v > 0.0:
                self.act_scales[path] = v / 127.0
        return self.act_scales

    # -- the Conv2d hook -----------------------------------------------------
    def conv2d(self, path: str, x: jnp.ndarray, kernel: jnp.ndarray,
               bias: Optional[jnp.ndarray], conv_kwargs: Dict) -> Optional[jnp.ndarray]:
        """Quantized replacement for Conv2d's compute.  Returns None when this
        conv should take the normal f32/bf16 path (calibration, skipped, or
        no scale was observed for it)."""
        grouped = conv_kwargs.get("feature_group_count", 1) > 1
        if grouped and not self.config.quantize_grouped:
            return None
        ci, co = kernel.shape[2], kernel.shape[3]
        if min(ci, co) < self.config.min_channels:
            return None
        if self.mode == "calibrate":
            self.record(path, x)
            return None
        if self._skipped(path) or path not in self.act_scales:
            return None
        sx = self.act_scales[path]

        xf = x.astype(jnp.float32)
        kf = kernel.astype(jnp.float32)
        # per-output-channel symmetric weight scale, shape (1,1,1,O)
        sw = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True) / 127.0
        sw = jnp.maximum(sw, 1e-12)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127)
        kq = jnp.clip(jnp.round(kf / sw), -127, 127)

        if self.mode == "int8":
            x8, k8 = xq.astype(jnp.int8), kq.astype(jnp.int8)
            pad_i = pad_o = 0
            if self.config.pad_channels:
                tile = lambda c: 32 if c <= 128 else 128
                pad_i, pad_o = (-ci) % tile(ci), (-co) % tile(co)
            if pad_i:
                x8 = jnp.pad(x8, ((0, 0), (0, 0), (0, 0), (0, pad_i)))
                k8 = jnp.pad(k8, ((0, 0), (0, 0), (0, pad_i), (0, 0)))
            if pad_o:
                k8 = jnp.pad(k8, ((0, 0), (0, 0), (0, 0), (0, pad_o)))
            y = lax.conv_general_dilated(
                x8, k8, preferred_element_type=jnp.int32, **conv_kwargs)
            if pad_o:
                y = y[..., :co]
            y = y.astype(jnp.float32)
        else:  # fake: same arithmetic in f32 (oracle / fallback)
            y = lax.conv_general_dilated(xq, kq, **conv_kwargs)
        y = y * (sx * sw.reshape((1, 1, 1, -1)))
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        if self.probe:
            yf = lax.conv_general_dilated(xf, kf, **conv_kwargs)
            if bias is not None:
                yf = yf + bias.astype(jnp.float32)
            self.err_traced[path] = (
                jnp.linalg.norm(y - yf) / (jnp.linalg.norm(yf) + 1e-12))
        return y.astype(x.dtype)


def current_quant() -> Optional[QuantContext]:
    return _QCTX.get()


_INT8_CONV_SUPPORT: Optional[bool] = None


def supports_int8_conv() -> bool:
    """Probe (once) whether the active backend compiles s8xs8->s32 convs.
    Falls back to the f32 'fake' path when it doesn't (numerically equivalent
    up to f32 accumulation rounding: f32 partial sums diverge from int32
    accumulation once a conv's per-output dot product exceeds 2^24)."""
    global _INT8_CONV_SUPPORT
    if _INT8_CONV_SUPPORT is None:
        try:
            x = jnp.ones((1, 4, 4, 8), jnp.int8)
            k = jnp.ones((1, 1, 8, 8), jnp.int8)
            y = jax.jit(lambda a, b: lax.conv_general_dilated(
                a, b, window_strides=(1, 1), padding=((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))(x, k)
            _INT8_CONV_SUPPORT = int(np.asarray(y)[0, 0, 0, 0]) == 8
        except Exception:
            _INT8_CONV_SUPPORT = False
    return _INT8_CONV_SUPPORT


def resolve_mode(mode: str, area: Optional[int] = None,
                 max_area: int = 0) -> str:
    """Resolve the requested quant mode against backend + geometry.

    ``auto`` encodes the measured v5e serving policy (docs/SERVING.md,
    BENCH_SERVING.json): int8 wins at 512^2-class geometries but loses at
    large spatial areas where the model is HBM-bound (gald@1024x2048 int8 =
    0.64x bf16) — above ``max_area`` pixels, resolve to "none" (bf16).
    The accuracy half of the auto policy (argmax-agreement floor) needs a
    calibrated context and lives in the caller (eval/tester.py,
    serve/server.py)."""
    if mode == "auto":
        if max_area and area is not None and area > max_area:
            return "none"
        mode = "int8"
    if mode == "int8" and not supports_int8_conv():
        return "fake"
    return mode


def argmax_agreement(probs_fn, x, label_size, ctx: "QuantContext") -> float:
    """Fraction of pixels whose argmax matches between the quantized and the
    f32 path — the accuracy half of the ``auto`` policy.  ``probs_fn(x,
    label_size)`` must be UNJITTED (it consults ``current_quant()`` at trace
    time).

    Each path is traced through a function object created HERE, fresh per
    call: pjit's dispatch cache is keyed on the callable's identity (not the
    quant contextvar), so ``jax.jit(probs_fn)`` in both scopes would hand the
    second scope the FIRST scope's compiled f32 graph and the comparison
    would be vacuously 1.0 (the quant-scope staleness trap, caught by
    tests/test_quant.py::test_agreement_defeats_jit_cache)."""
    ref = _argmax_under(None, probs_fn, x, label_size)
    quant = _argmax_under(ctx, probs_fn, x, label_size)
    return float(jnp.mean((ref == quant).astype(jnp.float32)))


def _argmax_under(ctx, probs_fn, x, label_size) -> jnp.ndarray:
    """Trace+run ``probs_fn`` under ``quant_scope(ctx)`` through a function
    object created here (fresh per call — see argmax_agreement docstring)."""
    def _trace(xx):
        return jnp.argmax(probs_fn(xx, label_size), axis=-1)

    with quant_scope(ctx):
        return jax.jit(_trace)(x)


def quant_sensitivity(probs_fn, x, label_size,
                      ctx: "QuantContext") -> Dict[str, float]:
    """Per-conv local quantization error in ONE jitted forward.

    Runs the quantized graph in probe mode: every quantized conv also
    computes the unquantized conv on the same (quantized-upstream) input and
    records the relative output error.  Returns {path: rel_err} — the
    ranking that drives ``repair_exclusions``.  One compile total, vs one
    compile per conv for leave-one-out.
    """
    def _probe(xx):
        pctx = QuantContext(config=ctx.config, mode=ctx.mode,
                            act_scales=dict(ctx.act_scales),
                            exclude=set(ctx.exclude), probe=True)
        with quant_scope(pctx):
            probs_fn(xx, label_size)
        return pctx.err_traced

    errs = jax.device_get(jax.jit(_probe)(x))
    return {p: float(v) for p, v in errs.items()}


def repair_exclusions(probs_fn, x, label_size, ctx: "QuantContext",
                      floor: float, max_exclude: int = 6,
                      logger=None) -> Tuple[float, List[str]]:
    """Greedy per-layer sensitivity repair: exclude the highest-local-error
    convs one at a time (they fall back to bf16/f32) until calibration-batch
    argmax agreement reaches ``floor`` or ``max_exclude`` is hit.

    Returns (final_agreement, excluded_paths); ``ctx.exclude`` is mutated in
    place so the repaired context is ready to serve.  The alternative to the
    all-or-nothing policy this replaces: one outlier-heavy conv (e.g. an
    attention head) no longer forces the whole model back to bf16.
    """
    ref = _argmax_under(None, probs_fn, x, label_size)  # f32 path: compile once

    def _agree() -> float:
        quant = _argmax_under(ctx, probs_fn, x, label_size)
        return float(jnp.mean((ref == quant).astype(jnp.float32)))

    agreement = _agree()
    excluded: List[str] = []
    # Every round costs two full-model compiles (sensitivity probe + fresh
    # agreement jit) — minutes each through a cold remote-compile service.
    # A model that genuinely quantizes badly must not burn all max_exclude
    # rounds before the caller falls back to bf16 anyway: stop after two
    # consecutive rounds with no meaningful gain.  Patience is 2 (not 1)
    # because a single exclusion can be flat while its downstream
    # scale-poisoned partner still hides the jump (the OutlierNet pattern:
    # flat after conv_b, 1.0 after conv_head).
    best = agreement
    stagnant = 0
    while agreement < floor and len(excluded) < max_exclude:
        # re-attribute each round: once an offender is excluded, the next
        # worst layer's error is only visible on the REPAIRED graph (e.g. a
        # downstream conv whose scale was poisoned by the same outlier)
        errs = quant_sensitivity(probs_fn, x, label_size, ctx)
        if not errs:
            break
        worst = max(errs, key=errs.get)
        ctx.exclude.add(worst)
        excluded.append(worst)
        agreement = _agree()
        if logger is not None:
            logger.info(
                f"quant repair: excluded {worst} (local err "
                f"{errs[worst]:.4f}) -> agreement {agreement:.4f}")
        if agreement > best + 1e-3:
            best = agreement
            stagnant = 0
        else:
            stagnant += 1
            if stagnant >= 2:
                if logger is not None:
                    logger.info(
                        "quant repair: no gain for 2 rounds — stopping early "
                        f"(agreement {agreement:.4f} < floor {floor})")
                break
    return agreement, excluded


@contextlib.contextmanager
def quant_scope(ctx: Optional[QuantContext]):
    token = _QCTX.set(ctx)
    try:
        yield ctx
    finally:
        _QCTX.reset(token)


def module_path(module) -> str:
    """Stable string key for a Flax module instance ('/'-joined scope path)."""
    try:
        return "/".join(module.scope.path)
    except Exception:
        return module.name or module.__class__.__name__


# ---------------------------------------------------------------- helpers ----

def calibrate_segmentor(segmentor, variables, batches,
                        config: Optional[QuantConfig] = None,
                        label_size: Optional[Tuple[int, int]] = None) -> QuantContext:
    """Collect per-conv activation ranges over ``batches`` (arrays or dicts
    with 'image'); returns a ready-to-serve context.

    The collecting forward is jit-compiled — per-conv absmax scalars are
    outputs of the traced graph, so calibration costs one compiled forward per
    batch instead of an op-by-op eager walk (which through the remote-TPU
    tunnel would take minutes)."""
    cfg = config or QuantConfig()
    ctx = QuantContext(config=cfg, mode="calibrate")
    params = {n: dict(v)["params"] for n, v in variables.items()}
    stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
             for n, v in variables.items()}

    jitted = {}

    def collect(x, ls):
        if ls not in jitted:
            def _fwd_collect(params, stats, x):
                trace_ctx = QuantContext(config=cfg, mode="calibrate")
                with quant_scope(trace_ctx):
                    segmentor.forward(params, stats, x, label_size=ls,
                                      train=False)
                return trace_ctx.traced_maxes()
            jitted[ls] = jax.jit(_fwd_collect)
        return jax.device_get(jitted[ls](params, stats, x))

    for i, batch in enumerate(batches):
        if i >= cfg.calib_batches:
            break
        x = batch["image"] if isinstance(batch, dict) else batch
        x = jnp.asarray(x)
        ls = label_size or tuple(x.shape[1:3])
        ctx.absorb(collect(x, ls))
    ctx.finalize_scales()
    ctx.mode = cfg.mode
    return ctx


def quant_error_report(ctx: QuantContext) -> Dict[str, float]:
    """Summary of the calibration outcome (for logs / demo output)."""
    return {
        "quantized_convs": len(ctx.act_scales),
        "mode": ctx.mode,
        "max_act_scale": max(ctx.act_scales.values()) if ctx.act_scales else 0.0,
        "min_act_scale": min(ctx.act_scales.values()) if ctx.act_scales else 0.0,
    }
