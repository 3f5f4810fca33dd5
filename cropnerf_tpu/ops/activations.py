"""Numerically-guarded activations.

``trunc_exp`` mirrors the tcnn/nerfstudio truncated exponential used for
density (`/root/reference/crop_nerf/fruit_nerf/fruit_field.py:192`): forward is
exp(x), backward clamps the input so the gradient cannot overflow in low
precision.  On TPU we also clamp the forward input — bf16 exp overflows past
~88 and XLA propagates inf through the transmittance scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_TRUNC = 15.0


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(jnp.clip(x, -_TRUNC, _TRUNC))


def _trunc_exp_fwd(x):
    y = jnp.exp(jnp.clip(x, -_TRUNC, _TRUNC))
    return y, y


def _trunc_exp_bwd(y, g):
    return (g * y,)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
