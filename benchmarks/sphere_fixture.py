"""Shared loader for the 24-view synthetic sphere fixture
(``.sphere_data.npz`` at the repo root) used by the convergence/parity
benchmarks — one place to update if the fixture schema or the Cameras
signature changes."""
from __future__ import annotations

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_sphere_bank():
    """Returns (bank, images, cameras, n, h, w)."""
    import jax.numpy as jnp

    from cropnerf_tpu.core.cameras import Cameras
    from cropnerf_tpu.data.databank import build_pixel_bank

    d = np.load(os.path.join(REPO, ".sphere_data.npz"))
    images, masks, c2w, fx = d["images"], d["masks"], d["c2w"], d["fx"]
    n, h, w = images.shape[:3]
    cams = Cameras(
        c2w=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fx),
        cx=jnp.full((n,), w / 2.0), cy=jnp.full((n,), h / 2.0),
        width=jnp.full((n,), w, jnp.int32),
        height=jnp.full((n,), h, jnp.int32))
    return build_pixel_bank(images, masks, cams), images, cams, n, h, w
