"""Spatial warps: scene contraction and AABB normalisation.

Equivalents of nerfstudio ``SceneContraction(order=inf)`` as bound at
/root/reference/crop_nerf/fruit_nerf/fruit_field.py:171-194 and the AABB
normalisation fallback used at export time (``setup_inference`` nulls the
contraction, fruit_nerf.py:185-189).
"""
from __future__ import annotations

import jax.numpy as jnp


def contract_inf(x: jnp.ndarray) -> jnp.ndarray:
    """L-inf scene contraction: identity inside the unit box, maps all of
    space into [-2, 2]^3 outside.  contract(x) = (2 - 1/||x||_inf) * x/||x||_inf
    for ||x||_inf > 1."""
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / mag) * (x / mag)
    return jnp.where(mag <= 1.0, x, contracted)


def contracted_to_unit(x: jnp.ndarray) -> jnp.ndarray:
    """Map contracted space [-2, 2] to [0, 1] for hash-grid lookup
    (fruit_field.py:176: ``positions = (positions + 2.0) / 4.0``)."""
    return (contract_inf(x) + 2.0) / 4.0


def aabb_to_unit(x: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """Normalise world positions into [0, 1] by an AABB.

    aabb: [2, 3] (min corner, max corner).  Mirrors nerfstudio
    ``SceneBox.get_normalized_positions`` used when contraction is disabled
    (fruit_field.py:178-180).
    """
    lo, hi = aabb[0], aabb[1]
    return (x - lo) / (hi - lo)


def unit_selector(x_unit: jnp.ndarray) -> jnp.ndarray:
    """{0,1} mask of positions inside the unit cube; out-of-box samples get
    zero density (fruit_field.py:182-194)."""
    inside = jnp.all((x_unit >= 0.0) & (x_unit <= 1.0), axis=-1)
    return inside.astype(x_unit.dtype)
