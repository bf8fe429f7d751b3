"""Deployment-export CLI: checkpoint -> self-contained StableHLO artifact.

    python export_model.py -cfg configs/deeplabv2_r101_src_kvasir.yaml \\
        -o exported/kvasir_deeplab --batch 8 [TEST.QUANT int8] resume <ckpt>

Consumers call ``serve.export.load_exported(path)`` (or any StableHLO
runtime) — no model code or checkpoint needed at deployment time.
"""

from __future__ import annotations

import argparse

from ..data import DataLoader, build_collate_fn, build_dataset
from ..eval.tester import Tester
from ..serve.export import export_eval
from ..utils import setup_logger
from .common import load_cfg


def cli():
    parser = argparse.ArgumentParser(description="StableHLO deployment export")
    parser.add_argument("-cfg", "--config-file", default="", metavar="FILE",
                        type=str)
    parser.add_argument("-o", "--output", default="exported/model",
                        help="artifact path prefix (.stablehlo/.json added)")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--platforms", default="",
                        help="comma list, e.g. 'tpu,cpu' (default: current)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg = load_cfg(args)
    logger = setup_logger("export", cfg.OUTPUT_DIR, 0)

    test_data = build_dataset(cfg, mode="test", is_source=False)
    test_loader = DataLoader(
        test_data, batch_size=cfg.TEST.BATCH_SIZE, shuffle=False,
        drop_last=False, num_workers=cfg.DATA_PIPE.NUM_WORKERS,
        worker_processes=cfg.DATA_PIPE.WORKER_PROCESSES,
        collate_fn=build_collate_fn(cfg))
    tester = Tester(cfg, test_loader, logger)
    tester._load_checkpoint()
    qctx = tester.make_quant_context()  # calibrates when TEST.QUANT != none
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 or None)
    export_eval(tester, args.batch, args.output, quant_ctx=qctx,
                platforms=platforms, logger=logger)


if __name__ == "__main__":
    cli()
