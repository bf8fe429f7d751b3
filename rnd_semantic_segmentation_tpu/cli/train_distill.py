"""Target self-distillation training CLI.

The reference's train_distill.py is bit-rotted (imports 4 nonexistent modules,
train_distill.py:15-18; SURVEY §2.3) — the *working* reference recipe is a
plain CE loop over ``SOURCE_TRAIN: cityscapes_self_distill_train`` whose labels
are pseudo-label PNGs exported by ``test.py --saveres``
(configs/deeplabv2_r101_tgt_self_distill.yaml:8, run.sh:9).  Here that recipe
is a first-class mode: identical to train_src but defaulting the source
dataset to the self-distill variant and resuming from the adversarial
checkpoint (the teacher's weights).
"""

from __future__ import annotations

from ..parallel import initialize_distributed
from .common import base_parser, load_cfg
from .train_src import main as train_src_main


def _online_distill(name: str, cfg, local_rank: int) -> None:
    """TPU-native online mode: teacher forward lives in the train graph."""
    import jax
    import jax.numpy as jnp

    from ..data import DataLoader, build_collate_fn, build_dataset
    from ..eval.tester import load_torch_checkpoint_variables
    from ..train.distill import make_online_distill_step
    from ..train.trainer import Trainer

    loader = DataLoader(
        build_dataset(cfg, "train", is_source=True),
        batch_size=cfg.SOLVER.BATCH_SIZE, shuffle=True, drop_last=True,
        num_workers=cfg.DATA_PIPE.NUM_WORKERS,
        worker_processes=cfg.DATA_PIPE.WORKER_PROCESSES,
        collate_fn=build_collate_fn(cfg), seed=cfg.DATA_PIPE.SEED)
    trainer = Trainer(name, cfg, loader, local_rank)

    # teacher variables: reference .pth or an orbax dir of this framework
    if cfg.DISTILL.TEACHER.endswith(".pth"):
        tvars = load_torch_checkpoint_variables(cfg, trainer.spec,
                                                cfg.DISTILL.TEACHER)
    else:
        from ..ckpt.orbax_io import load_checkpoint
        from ..train.steps import make_optimizers
        sample = next(iter(loader))
        x = jnp.zeros(sample["image"].shape, jnp.float32)
        template = trainer.segmentor.make_states(
            trainer.segmentor.init(jax.random.PRNGKey(0), x),
            make_optimizers(trainer.spec, cfg))
        tstate, _ = load_checkpoint(cfg.DISTILL.TEACHER, template)
        tvars = {n: {"params": m.params, **m.stats}
                 for n, m in tstate.modules.items()}
    t_params = {n: dict(v)["params"] for n, v in tvars.items()}
    t_stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
               for n, v in tvars.items()}
    trainer.step_fn = make_online_distill_step(
        trainer.segmentor, cfg, trainer.steps_per_epoch, t_params, t_stats,
        confidence_threshold=cfg.DISTILL.CONFIDENCE_THRESHOLD,
        base_rng=jax.random.PRNGKey(cfg.SEED + 1))
    trainer.train()


def main(name: str, cfg, local_rank: int = 0, distributed: bool = False) -> None:
    if cfg.DISTILL.ONLINE:
        _online_distill(name, cfg, local_rank)
    else:
        train_src_main(name, cfg, local_rank)


def cli():
    args = base_parser("TPU semantic segmentation self-distillation").parse_args()
    cfg = load_cfg(args)
    initialize_distributed(cfg)
    name = cfg.MODEL.NAME.split("_")[0] + "_distill"
    main(name, cfg, args.local_rank)


if __name__ == "__main__":
    cli()
