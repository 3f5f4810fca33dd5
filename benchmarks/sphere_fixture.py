"""Shared loader for the 24-view synthetic sphere fixture
(``.sphere_data.npz`` at the repo root) used by the convergence/parity
benchmarks — one place to update if the fixture schema or the Cameras
signature changes."""
from __future__ import annotations

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, ".sphere_data.npz")


def make_sphere_fixture(path: str = FIXTURE) -> str:
    """Regenerate the committed fixture from tests/synthetic.py (24 ring
    cameras at radius 1.2 / elevation 0.3, 256x256, focal 300, sphere
    radius 0.35 — verified bit-identical to the committed .npz)."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(REPO, "tests"))
    from synthetic import render_synthetic_images, ring_cameras
    cams = ring_cameras(n=24, radius=1.2, height=256, width=256, focal=300.0)
    images, masks = render_synthetic_images(cams, 256, 256,
                                            sphere_radius=0.35)
    np.savez_compressed(path, images=images, masks=masks,
                        c2w=np.asarray(cams.c2w),
                        fx=np.asarray(cams.fx))
    return path


def load_sphere_bank():
    """Returns (bank, images, cameras, n, h, w)."""
    import jax.numpy as jnp

    from cropnerf_tpu.core.cameras import Cameras
    from cropnerf_tpu.data.databank import build_pixel_bank

    if not os.path.exists(FIXTURE):
        make_sphere_fixture()
    d = np.load(FIXTURE)
    images, masks, c2w, fx = d["images"], d["masks"], d["c2w"], d["fx"]
    n, h, w = images.shape[:3]
    cams = Cameras(
        c2w=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fx),
        cx=jnp.full((n,), w / 2.0), cy=jnp.full((n,), h / 2.0),
        width=jnp.full((n,), w, jnp.int32),
        height=jnp.full((n,), h, jnp.int32))
    return build_pixel_bank(images, masks, cams), images, cams, n, h, w
