"""Device mesh + sharding helpers (the TPU-native 'distributed backend').

Replaces torch.distributed/NCCL process groups (reference train_adv.py:84-88,
train_distill.py:215-222, run.sh:5-7) with the JAX SPMD model:

  * one process per host, ``jax.distributed.initialize()`` for multi-host DCN
    rendezvous (cfg.DIST.INITIALIZE),
  * a ('data', 'spatial') mesh — batch sharded over 'data' (DP) and,
    optionally, image height over 'spatial' for large-input models (the
    vision analog of sequence parallelism; SURVEY §5 long-context),
  * parameters replicated; XLA inserts the gradient all-reduce over ICI
    during jit compilation (no DDP wrapper, no explicit collectives),
  * BatchNorm stats are computed over the *global* batch under pjit —
    SyncBatchNorm semantics (train_distill.py:52-53) by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None, batch_size: int = 0) -> Mesh:
    """('data','spatial') mesh.  When ``batch_size`` is given, the data axis
    is capped at gcd(batch, devices) so small batches still shard evenly
    (the reference's global->per-GPU split, defaults.py:74-77).
    cfg.DIST.NUM_DEVICES (0 = all) caps the device count — e.g. a forced
    single-device run for A/B-ing sharded vs unsharded numbers."""
    import math

    devices = devices if devices is not None else jax.devices()
    if cfg is not None and int(cfg.DIST.NUM_DEVICES):
        devices = devices[: int(cfg.DIST.NUM_DEVICES)]
    spatial = int(cfg.DIST.SPATIAL_PARALLEL) if cfg is not None else 1
    data_axis = cfg.DIST.DATA_AXIS if cfg is not None else "data"
    spatial_axis = cfg.DIST.SPATIAL_AXIS if cfg is not None else "spatial"
    n = len(devices)
    assert n % spatial == 0, (n, spatial)
    n_data = n // spatial
    if batch_size:
        n_data = math.gcd(batch_size, n_data)
    mesh_devices = np.asarray(devices[: n_data * spatial]).reshape(n_data, spatial)
    return Mesh(mesh_devices, (data_axis, spatial_axis))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """[B,H,W,...] sharded over batch (and optionally H over 'spatial')."""
    data_axis, spatial_axis = mesh.axis_names
    if spatial:
        return NamedSharding(mesh, P(data_axis, spatial_axis))
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                spatial: bool = False) -> Dict[str, Any]:
    """Place a batch onto the mesh's data axis (and optionally H on 'spatial').

    Single-process: arrays are global and device_put shards them.
    Multi-process (jax.distributed): each host passes its LOCAL shard (from a
    ``process_shard=True`` DataLoader) and the global array is assembled via
    ``make_array_from_process_local_data`` — the SPMD replacement for
    DistributedSampler + DDP input pipelines.
    """
    sh = batch_sharding(mesh, spatial=spatial)
    multi = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            if multi:
                out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_state(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def initialize_distributed(cfg) -> None:
    if cfg.DIST.INITIALIZE:
        jax.distributed.initialize()


def process_is_primary() -> bool:
    """Rank-0 gate for checkpoint/log writes (aspp_trainer.py:59)."""
    return jax.process_index() == 0
