"""Optimizer parity vs torch (training-trajectory correctness).

The reference uses torch SGD(momentum, weight_decay) and Adam (default betas,
plus (0.9, 0.99) for the discriminator — fada_adapter.py:24); our LR-less
optax chains + apply_updates must take identical steps."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from rnd_semantic_segmentation_tpu.train.state import ModuleState, apply_updates, make_optimizer


def _run_ours(kind, params0, grads_seq, lr, **kw):
    tx = make_optimizer(kind, **kw)
    state = ModuleState(params={"w": jnp.asarray(params0)}, stats={},
                        opt_state=tx.init({"w": jnp.asarray(params0)}))
    for g in grads_seq:
        state = apply_updates(state, {"w": jnp.asarray(g)}, tx, lr)
    return np.asarray(state.params["w"])


def _run_torch(opt_cls, params0, grads_seq, **kw):
    p = torch.nn.Parameter(torch.from_numpy(params0.copy()))
    opt = opt_cls([p], **kw)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    return p.detach().numpy()


def test_sgd_momentum_wd_matches_torch(rng):
    params0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(5)]
    ours = _run_ours("sgd", params0, grads, lr=0.01, momentum=0.9,
                     weight_decay=5e-4)
    ref = _run_torch(torch.optim.SGD, params0, grads, lr=0.01, momentum=0.9,
                     weight_decay=5e-4)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_adam_matches_torch(rng):
    params0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(5)]
    ours = _run_ours("adam", params0, grads, lr=1e-3)
    ref = _run_torch(torch.optim.Adam, params0, grads, lr=1e-3)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_adam_custom_betas_matches_torch(rng):
    params0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) for _ in range(4)]
    ours = _run_ours("adam", params0, grads, lr=1e-4, betas=(0.9, 0.99))
    ref = _run_torch(torch.optim.Adam, params0, grads, lr=1e-4,
                     betas=(0.9, 0.99))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)


def test_grad_clip_is_preclip(rng):
    # clip_gradient clamps raw grads BEFORE the optimizer (utils.py:6-16)
    params0 = np.zeros(3, np.float32)
    grads = [np.array([10.0, -10.0, 0.1], np.float32)]
    tx = make_optimizer("sgd", momentum=0.0)
    state = ModuleState(params={"w": jnp.asarray(params0)}, stats={},
                        opt_state=tx.init({"w": jnp.asarray(params0)}))
    state = apply_updates(state, {"w": jnp.asarray(grads[0])}, tx, 1.0,
                          grad_clip=0.5)
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               [-0.5, 0.5, -0.1], rtol=1e-6)
