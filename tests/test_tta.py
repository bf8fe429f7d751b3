"""TTA paths: flip and multi-scale inference through the Tester."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.eval.tester import Tester
from rnd_semantic_segmentation_tpu.eval.tta import inference, multi_scale_inference
from rnd_semantic_segmentation_tpu.utils import setup_logger


def test_flip_tta_symmetry(rng):
    """For a flip-equivariant forward, flip TTA must equal the plain output."""
    def forward(image, size):
        return image[..., :2] * 2.0  # trivially equivariant "logits"

    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    base = inference(forward, x, (8, 8), flip=False)
    tta = inference(forward, x, (8, 8), flip=True)
    np.testing.assert_allclose(np.asarray(tta), np.asarray(base), rtol=1e-6)


def test_multi_scale_averages(rng):
    calls = []

    def forward(image, size):
        calls.append(image.shape)
        return jnp.zeros(image.shape[:3] + (3,), jnp.float32)

    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    out = multi_scale_inference(forward, x, (16, 16), flip=True,
                                scales=(0.5, 1.0))
    assert out.shape == (1, 16, 16, 3)
    # 2 scales x (plain + flip) = 4 forwards (utility.py:193-209)
    assert len(calls) == 4
    np.testing.assert_allclose(np.asarray(out), 1.0 / 3, rtol=1e-6)  # softmax of zeros


class _Loader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        yield self.batch

    def __len__(self):
        return 1


@pytest.mark.parametrize("flip,ms", [(True, False), (True, True)])
def test_tester_tta_configs(tmp_path, rng, flip, ms):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TEST.FLIP_TTA = flip
    cfg.TEST.MULTI_SCALE = ms
    cfg.TEST.SCALES = (0.5, 1.0)
    logger = setup_logger(f"tta_{flip}_{ms}", str(tmp_path), 0)
    batch = {"image": rng.rand(1, 32, 32, 3).astype(np.float32),
             "label": rng.randint(0, 3, size=(1, 32, 32)).astype(np.int32),
             "name": ["t"]}
    tester = Tester(cfg, _Loader(batch), logger, trainid2name={0: "a", 1: "b", 2: "c"})
    # random weights (no checkpoint): init directly
    import jax as _jax
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    tester.variables = tester.segmentor.init(_jax.random.PRNGKey(0), x)
    summary = tester.test()
    assert 0.0 <= summary["macro_miou"] <= 1.0
