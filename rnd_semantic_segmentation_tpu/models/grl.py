"""Gradient reversal layer (Ganin DANN).

Reference: core/components/grl.py:12-36 — defined for adversarial DA though
the live FADA loops use explicit alternating optimization instead.  Provided
for capability parity and for users composing DANN-style objectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reverse(x: jnp.ndarray, lambd: float = 1.0) -> jnp.ndarray:
    return x


def _fwd(x, lambd):
    return x, lambd


def _bwd(lambd, g):
    return (-lambd * g, None)


gradient_reverse.defvjp(_fwd, _bwd)
