"""Sinusoidal positional encoding (NeRF frequency encoding).

Equivalent of nerfstudio ``NeRFEncoding`` (bound at
/root/reference/crop_nerf/fruit_nerf/fruit_field.py:121-123 and used by the
legacy ``SemanticNeRFField`` variant, fruit_field.py:311-411).
"""
from __future__ import annotations

import jax.numpy as jnp


def nerf_encoding(x: jnp.ndarray, num_frequencies: int,
                  min_freq_exp: float = 0.0,
                  max_freq_exp: float | None = None,
                  include_input: bool = True) -> jnp.ndarray:
    """[..., D] → [..., D * (2 * F + include_input)].

    Frequencies 2^k for k in [min_freq_exp, max_freq_exp] (F log-spaced
    values); sin and cos of each.
    """
    if max_freq_exp is None:
        max_freq_exp = num_frequencies - 1
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    xb = x[..., None, :] * freqs[:, None]              # [..., F, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
