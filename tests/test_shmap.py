"""Explicit shard_map+psum step vs the GSPMD auto-parallel step.

Also the end-to-end exercise of cross-replica BatchNorm (bn_axis_name pmean):
with trainable BN, per-shard stats pmean'd over the data axis must equal
global-batch stats from the single-program path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.parallel import make_mesh, shard_batch
from rnd_semantic_segmentation_tpu.parallel.shmap import make_shmap_train_step
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers, make_src_train_step


def _cfg(freeze_bn):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = freeze_bn
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.DIST.SPATIAL_PARALLEL = 1
    return cfg


@pytest.mark.parametrize("freeze_bn", [True, False])
def test_shmap_matches_gspmd(freeze_bn, rng):
    cfg = _cfg(freeze_bn)
    mesh = make_mesh(cfg)
    x = rng.rand(8, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 3, size=(8, 32, 32)).astype(np.int32)

    # GSPMD reference: global batch, params replicated
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    variables = seg.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    snapshot = jax.device_get(variables)
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    gspmd_step = make_src_train_step(seg, cfg, 10)
    s1, m1 = gspmd_step(state, {"image": jnp.asarray(x), "label": jnp.asarray(y)},
                        jnp.float32(0))

    # shard_map: same init weights (bn_axis_name differs but trees match)
    seg2, shmap_step = make_shmap_train_step(cfg, mesh, 10)
    state2 = seg2.make_states(snapshot, make_optimizers(seg2.spec, cfg))
    state2 = jax.device_put(state2, NamedSharding(mesh, P()))
    batch = shard_batch({"image": x, "label": y}, mesh)
    s2, loss2 = shmap_step(state2, batch, jnp.float32(0))

    assert abs(float(m1["loss"]) - float(loss2)) < 1e-5
    a = jax.tree.leaves(s1.modules["classifier"].params)[0]
    b = jax.tree.leaves(s2.modules["classifier"].params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    if not freeze_bn:
        # cross-replica BN stats must equal global-batch stats
        sa = jax.tree.leaves(s1.modules["feature_extractor"].stats)[0]
        sb = jax.tree.leaves(s2.modules["feature_extractor"].stats)[0]
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-4, atol=1e-5)
