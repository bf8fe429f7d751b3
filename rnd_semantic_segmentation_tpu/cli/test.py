"""Evaluation CLI (reference test.py): mIoU/F1 + confusion matrix + optional
pseudo-label export (`--saveres`), render-config JSON via `-c`."""

from __future__ import annotations

import argparse

from ..data import DataLoader, build_collate_fn, build_dataset
from ..eval.tester import Tester
from ..parallel import initialize_distributed
from ..utils import load_json, setup_logger
from .common import load_cfg


def test(cfg, render_config, args):
    import jax

    initialize_distributed(cfg)
    name = render_config.get("name", cfg.MODEL.NAME)
    logger = setup_logger(name + "_test", cfg.OUTPUT_DIR, 0)
    logger.info("#" * 20 + " Start Testing " + "#" * 20)
    logger.info(f"INPUT_SIZE_TEST: {cfg.INPUT.INPUT_SIZE_TEST}")
    test_data = build_dataset(cfg, mode="test", is_source=False)
    nproc = jax.process_count()
    test_loader = DataLoader(
        # TEST.BATCH_SIZE is global; each process loads its disjoint slice
        test_data, batch_size=max(cfg.TEST.BATCH_SIZE // nproc, 1),
        shuffle=False, drop_last=False, num_workers=cfg.DATA_PIPE.NUM_WORKERS,
        worker_processes=cfg.DATA_PIPE.WORKER_PROCESSES,
        collate_fn=build_collate_fn(cfg), process_shard=nproc > 1)
    tester = Tester(cfg, test_loader, logger,
                    palette=render_config.get("palette"),
                    trainid2name=render_config.get("trainid2name"),
                    saveres=args.saveres)
    tester._load_checkpoint()
    return tester.test()


def cli():
    parser = argparse.ArgumentParser(description="TPU semantic segmentation testing")
    parser.add_argument("-cfg", "--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("--saveres", action="store_true", help="save the result")
    parser.add_argument("-c", "--config_path", default="renders/cityscapes.json",
                        help="path to render config")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    render_config = load_json(args.config_path)
    cfg = load_cfg(args)
    print(f"Loaded configuration file {args.config_file}")
    test(cfg, render_config, args)


if __name__ == "__main__":
    cli()
