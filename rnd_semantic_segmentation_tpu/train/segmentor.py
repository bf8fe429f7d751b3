"""Functional segmentor: uniform init/forward across the four families.

Wraps a ``SegmentorSpec`` (models/build.py) with pure functions so train
steps, FADA combos, and testers never branch on family internals; the
family-specific wiring (which module feeds which, what the discriminator
taps) lives here in one place.

Reference call paths being unified:
  * deeplab: classifier(feature_extractor(x), label_size) — train_src via
    aspp_trainer.py:90-93; discriminator taps the backbone features
    (aspp_fada.py:97,110).
  * gald: decoder(x, encoder(x)) — gald_trainer.py:69-70; discriminator taps
    hardnetout[3] (gald_fada.py:119).
  * pranet: model(x) -> 4 lateral maps (pranet_trainer.py:49-51).
  * attn: decoder(encoder(x)) -> 5 scale outputs (attn_trainer.py:35-37);
    discriminator taps endpoints['reduction_5'] (attn_fada.py:121).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.build import SegmentorSpec
from .state import ModuleState, TrainState, split_variables


class Segmentor:
    def __init__(self, spec: SegmentorSpec, num_classes: int):
        self.spec = spec
        self.num_classes = num_classes

    # ------------------------------------------------------------------ init
    def init(self, rng, sample_x: jnp.ndarray,
             label_size: Optional[Tuple[int, int]] = None) -> Dict[str, Any]:
        """Initialize all module variables; returns {module: variables}."""
        label_size = label_size or sample_x.shape[1:3]
        fam = self.spec.family
        mods = self.spec.modules
        rngs = jax.random.split(rng, len(mods) + 1)
        out: Dict[str, Any] = {}
        if fam == "deeplab":
            out["feature_extractor"] = mods["feature_extractor"].init(rngs[0], sample_x)
            fea_shape = jax.eval_shape(
                lambda v, x: mods["feature_extractor"].apply(v, x),
                out["feature_extractor"], sample_x)
            fea = jnp.zeros(fea_shape.shape, fea_shape.dtype)
            out["classifier"] = mods["classifier"].init(rngs[1], fea, size=label_size)
        elif fam == "gald":
            out["encoder"] = mods["encoder"].init(rngs[0], sample_x)
            taps_shape = jax.eval_shape(
                lambda v, x: mods["encoder"].apply(v, x), out["encoder"], sample_x)
            taps = tuple(jnp.zeros(t.shape, t.dtype) for t in taps_shape)
            out["decoder"] = mods["decoder"].init(rngs[1], sample_x, taps)
        elif fam in ("pranet", "attnwrap"):
            out["model"] = mods["model"].init(rngs[0], sample_x)
        elif fam == "attn":
            out["encoder"] = mods["encoder"].init(
                {"params": rngs[0], "dropout": rngs[-1]}, sample_x)
            eps_shape = jax.eval_shape(
                lambda v, x: mods["encoder"].apply(v, x), out["encoder"], sample_x)
            eps = {k: jnp.zeros(v.shape, v.dtype) for k, v in eps_shape.items()}
            out["decoder"] = mods["decoder"].init(rngs[1], eps)
        else:
            raise NotImplementedError(fam)
        return out

    # --------------------------------------------------------------- forward
    def forward(self, params: Dict[str, Any], stats: Dict[str, Any],
                x: jnp.ndarray, label_size: Optional[Tuple[int, int]] = None,
                train: bool = False, rngs: Optional[Dict[str, Any]] = None):
        """Returns (outputs tuple, new_stats, disc_tap_feature).

        ``outputs`` ordering matches each reference forward exactly.
        """
        fam = self.spec.family
        mods = self.spec.modules
        label_size = label_size or x.shape[1:3]
        new_stats: Dict[str, Any] = {}
        rngs = rngs or {}

        def run(name, module, *args, method_rngs=None):
            variables = {"params": params[name], **stats.get(name, {})}
            mutable = ["batch_stats"] if (train and "batch_stats" in stats.get(name, {})) else False
            if mutable:
                y, mut = module.apply(variables, *args, train=train,
                                      rngs=method_rngs, mutable=mutable)
                new_stats[name] = {**stats.get(name, {}), **dict(mut)}
            else:
                y = module.apply(variables, *args, train=train, rngs=method_rngs)
                new_stats[name] = stats.get(name, {})
            return y

        if fam == "deeplab":
            fea = run("feature_extractor", mods["feature_extractor"], x)
            out = mods["classifier"].apply(
                {"params": params["classifier"]}, fea, size=label_size)
            new_stats["classifier"] = stats.get("classifier", {})
            return (out,), new_stats, fea
        if fam == "gald":
            taps = run("encoder", mods["encoder"], x)
            outs = run("decoder", mods["decoder"], x, taps)
            return outs, new_stats, taps[3]
        if fam == "pranet":
            outs = run("model", mods["model"], x)
            if len(outs) == 5:  # with_tap registry build: layer4 disc tap
                return tuple(outs[:4]), new_stats, outs[4]
            return outs, new_stats, None
        if fam == "attnwrap":
            outs = run("model", mods["model"], x,
                       method_rngs=rngs if train else None)
            return outs, new_stats, None
        if fam == "attn":
            eps = run("encoder", mods["encoder"], x,
                      method_rngs=rngs if train else None)
            outs = run("decoder", mods["decoder"], eps)
            return outs, new_stats, eps["reduction_5"]
        raise NotImplementedError(fam)

    def make_states(self, variables: Dict[str, Any], txs) -> TrainState:
        modules = {}
        for name, v in variables.items():
            p, s = split_variables(v)
            modules[name] = ModuleState(
                params=p, stats=s, opt_state=txs[name].init(p))
        return TrainState(modules=modules, step=jnp.zeros((), jnp.int32))
