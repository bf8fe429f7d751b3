import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.fam_variants import (
    FAMAG,
    FAMAGv3,
    FAMPra,
    FAMSCWS,
)


def _feats(rng):
    left = jnp.asarray(rng.rand(1, 16, 16, 64).astype(np.float32))
    down = jnp.asarray(rng.rand(1, 8, 8, 32).astype(np.float32))
    right = jnp.asarray(rng.rand(1, 8, 8, 32).astype(np.float32))
    return left, down, right


def test_famag_and_v3(rng):
    left, down, right = _feats(rng)
    for mod in (FAMAG(interplanes=32), FAMAGv3(interplanes=32)):
        v = mod.init(jax.random.PRNGKey(0), left, down, right)
        out = mod.apply(v, left, down, right)
        # the reference's k1/p1 convs grow spatial dims by 2 (gcpa_gald.py:116)
        assert out.shape == (1, 18, 18, 32)
        assert np.isfinite(np.asarray(out)).all()


def test_fampra_reverse_attention(rng):
    left, down, right = _feats(rng)
    crop = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    m = FAMPra(interplanes=32)
    v = m.init(jax.random.PRNGKey(0), left, down, right, crop)
    out, ra = m.apply(v, left, down, right, crop)
    assert out.shape == (1, 16, 16, 32)
    assert ra.shape == (1, 16, 16, 1)


def test_famscws(rng):
    left, down, right = _feats(rng)
    m = FAMSCWS(interplanes=32)
    v = m.init(jax.random.PRNGKey(0), left, down, right)
    out = m.apply(v, left, down, right)
    assert out.shape == (1, 16, 16, 32)
