"""Source-only supervised training CLI (reference train_src.py).

Unlike the reference, the model family comes from MODEL.NAME via the registry
instead of a hardcoded ``main("gald", ...)`` (train_src.py:62) — every family
trains through the same entry point.
"""

from __future__ import annotations

from ..data import DataLoader, build_collate_fn, build_dataset
from ..parallel import initialize_distributed
from ..train.trainer import Trainer
from .common import base_parser, load_cfg


def main(name: str, cfg, local_rank: int = 0) -> None:
    train_data = build_dataset(cfg, "train", is_source=True)
    train_loader = DataLoader(
        train_data,
        batch_size=cfg.SOLVER.BATCH_SIZE,
        shuffle=True,
        drop_last=True,
        num_workers=cfg.DATA_PIPE.NUM_WORKERS,
        worker_processes=cfg.DATA_PIPE.WORKER_PROCESSES,
        collate_fn=build_collate_fn(cfg),
        seed=cfg.DATA_PIPE.SEED,
    )
    trainer = Trainer(name, cfg, train_loader, local_rank)
    trainer.train()


def cli():
    args = base_parser("TPU semantic segmentation source training").parse_args()
    cfg = load_cfg(args)
    initialize_distributed(cfg)
    name = cfg.MODEL.NAME.split("_")[0]
    main(name, cfg, args.local_rank)


if __name__ == "__main__":
    cli()
