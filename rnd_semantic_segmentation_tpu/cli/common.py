"""Shared CLI plumbing: the YACS-style `-cfg <yaml> [KEY VALUE ...]` surface
(train_src.py:38-52, test.py:45-60 in the reference)."""

from __future__ import annotations

import argparse
import os

from ..configs import get_default_cfg


def _maybe_force_cpu(cfg=None):
    """Honor MODEL.DEVICE=cpu / SEGTPU_FORCE_CPU=1 (the deployment harness can
    pin JAX_PLATFORMS via sitecustomize, so env vars alone don't suffice)."""
    if os.environ.get("SEGTPU_FORCE_CPU") == "1" or (
            cfg is not None and cfg.MODEL.DEVICE == "cpu"):
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized


def base_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("-cfg", "--config-file", default="", metavar="FILE",
                        help="path to config file", type=str)
    parser.add_argument("--local_rank", type=int, default=0,
                        help="kept for reference CLI parity; unused under SPMD")
    parser.add_argument("opts", help="Modify config options from the command line",
                        default=None, nargs=argparse.REMAINDER)
    return parser


def load_cfg(args):
    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    _maybe_force_cpu(cfg)
    if cfg.DEBUG.NANS:
        import jax
        jax.config.update("jax_debug_nans", True)
    return cfg
