"""Spatial (H) sharding of GALD inference — the vision analog of sequence
parallelism (SURVEY §5 long-context): large Cityscapes-scale inputs sharded
over the 'spatial' mesh axis; GSPMD inserts conv halo exchanges and the
criss-cross einsums' collectives automatically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rnd_semantic_segmentation_tpu.models import GCPADecoder, GCPAEncoder


def test_gald_eval_spatial_sharding(rng):
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices).reshape(2, 2), ("data", "spatial"))

    enc = GCPAEncoder()
    dec = GCPADecoder(num_classes=4)
    x_np = rng.rand(2, 256, 256, 3).astype(np.float32)
    x = jnp.asarray(x_np)
    ev = enc.init(jax.random.PRNGKey(0), x[:1])
    taps = enc.apply(ev, x[:1])
    dv = dec.init(jax.random.PRNGKey(1), x[:1], taps)

    @jax.jit
    def forward(ev, dv, image):
        taps = enc.apply(ev, image)
        return dec.apply(dv, image, taps)[-1]  # res2

    ref = forward(ev, dv, x)

    sh = NamedSharding(mesh, P("data", "spatial"))
    x_sp = jax.device_put(x_np, sh)
    ev_r = jax.device_put(jax.device_get(ev), NamedSharding(mesh, P()))
    dv_r = jax.device_put(jax.device_get(dv), NamedSharding(mesh, P()))
    out = forward(ev_r, dv_r, x_sp)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
