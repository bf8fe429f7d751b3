"""Adversarial domain-adaptation training CLI (reference train_adv.py).

Keeps the reference's loader topology: src and tgt loaders each at
BATCH_SIZE//2 (train_adv.py:29-49) with the target dataset repeated x9
(ConcatDataset, train_adv.py:18) so zip() doesn't starve the source stream.
"""

from __future__ import annotations

from ..data import DataLoader, build_collate_fn, build_dataset
from ..parallel import initialize_distributed
from ..train.trainer import FadaTrainer
from .common import base_parser, load_cfg


class _Repeat:
    """ConcatDataset([ds]*n) equivalent (train_adv.py:18)."""

    def __init__(self, dataset, times: int = 9):
        self.dataset = dataset
        self.times = times
        self.image_paths = dataset.image_paths * times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, i):
        return self.dataset[i % len(self.dataset)]


def main(name: str, cfg, local_rank: int = 0, distributed: bool = False) -> None:
    src_data = build_dataset(cfg, "train", is_source=True)
    tgt_data = _Repeat(build_dataset(cfg, "train", is_source=False), 9)
    kwargs = dict(shuffle=True, drop_last=True,
                  num_workers=cfg.DATA_PIPE.NUM_WORKERS,
                  worker_processes=cfg.DATA_PIPE.WORKER_PROCESSES,
                  collate_fn=build_collate_fn(cfg), seed=cfg.DATA_PIPE.SEED)
    src_loader = DataLoader(src_data, batch_size=cfg.SOLVER.BATCH_SIZE // 2, **kwargs)
    tgt_loader = DataLoader(tgt_data, batch_size=cfg.SOLVER.BATCH_SIZE // 2, **kwargs)
    FadaTrainer(name, cfg, src_loader, tgt_loader, local_rank).train()


def cli():
    args = base_parser("TPU semantic segmentation adversarial DA training").parse_args()
    cfg = load_cfg(args)
    initialize_distributed(cfg)
    name = cfg.MODEL.NAME.split("_")[0] + "_fada"
    main(name, cfg, args.local_rank)


if __name__ == "__main__":
    cli()
