"""Data-parallel + spatial sharding correctness on the 8-device CPU mesh.

Validates the SPMD story that replaces the reference's DDP/NCCL path
(SURVEY §2.1): batch sharded over 'data' (and H over 'spatial'), params
replicated, XLA-inserted gradient all-reduce — results must equal the
single-device computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.parallel import batch_sharding, make_mesh, shard_batch
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers, make_src_train_step


def _setup(spatial=1):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.DIST.SPATIAL_PARALLEL = spatial
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    rng = np.random.RandomState(0)
    x = rng.rand(8, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 3, size=(8, 32, 32)).astype(np.int32)
    variables = seg.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=10)
    return cfg, seg, state, step, x, y


def test_mesh_shapes():
    cfg = get_default_cfg()
    cfg.DIST.SPATIAL_PARALLEL = 2
    mesh = make_mesh(cfg)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "spatial")


def test_dp_matches_single_device():
    cfg, seg, state, step, x, y = _setup()
    # replicate BEFORE stepping: donate_argnums deletes step inputs
    mesh = make_mesh(cfg)
    state8 = jax.device_put(jax.device_get(state), NamedSharding(mesh, P()))
    # single device
    s1, m1 = step(state, {"image": jnp.asarray(x), "label": jnp.asarray(y)},
                  jnp.float32(0))
    # 8-way data parallel
    sharded = shard_batch({"image": x, "label": y}, mesh)
    s8, m8 = step(state8, sharded, jnp.float32(0))
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    a = jax.tree.leaves(s1.modules["classifier"].params)[0]
    b = jax.tree.leaves(s8.modules["classifier"].params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_plus_spatial_sharding():
    cfg, seg, state, step, x, y = _setup(spatial=2)
    mesh = make_mesh(cfg)
    assert mesh.devices.shape == (4, 2)
    sh = NamedSharding(mesh, P("data", "spatial"))
    batch = {"image": jax.device_put(x, sh), "label": jax.device_put(y, sh)}
    state_sp = jax.device_put(jax.device_get(state), NamedSharding(mesh, P()))

    s1, m1 = step(state, {"image": jnp.asarray(x), "label": jnp.asarray(y)},
                  jnp.float32(0))
    s_sp, m_sp = step(state_sp, batch, jnp.float32(0))
    assert abs(float(m1["loss"]) - float(m_sp["loss"])) < 1e-5
