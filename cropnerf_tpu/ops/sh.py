"""Real spherical-harmonics direction encoding, closed form up to degree 4.

TPU-native equivalent of tiny-cuda-nn's ``SHEncoding`` (bound at
/root/reference/crop_nerf/fruit_nerf/fruit_field.py:116-119 with
``levels=4`` → 16 coefficients).  Pure jnp: XLA fuses the polynomial
evaluation into neighbouring matmuls, so no Pallas kernel is needed.

Convention matches the tcnn component ordering (l-major, m from -l..l) with
the hard-coded constants tcnn uses, so a model trained here sees the same
feature basis as the reference field.
"""
from __future__ import annotations

import jax.numpy as jnp


def sh_encoding(directions: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Encode unit directions [..., 3] → [..., levels**2] SH basis values."""
    if not 1 <= levels <= 4:
        raise ValueError(f"SH levels must be in [1, 4], got {levels}")
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    comps = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if levels >= 2:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels >= 3:
        comps += [
            1.0925484305920792 * xy,
            1.0925484305920792 * yz,
            0.9461746957575601 * zz - 0.31539156525252005,
            1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if levels >= 4:
        comps += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)
