"""On-device pixel bank: the whole training set resident in HBM.

TPU-first replacement for the reference's CPU dataloader + pixel-sampler +
ray-generator chain (nerfstudio ``VanillaDataManager`` bound at
/root/reference/crop_nerf/fruit_nerf/data/fruit_datamanager.py:188-215).
Instead of host workers assembling a RayBundle per step and shipping it over
PCIe, all images/masks live as flat uint8 arrays on device; pixel sampling,
gather, and ray generation happen *inside* the jitted train step — zero
host↔device traffic in steady state.  For a 3DCotton plant (~300 cams at
~1200px) the bank is well under 2 GB of HBM.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.cameras import Cameras


@struct.dataclass
class PixelBank:
    """Flattened training pixels.

    rgb:  [P, 3] uint8, P = num_images * H * W.
    mask: [P] uint8 binary fruit/crop mask (``fruit_mask`` in the reference,
          data/cotton_dataset.py:99-106).
    cameras: stacked camera parameters (index i owns pixels
          [i*H*W, (i+1)*H*W)).
    height/width: static image size (dataparser rescales to a common size).
    """

    rgb: jnp.ndarray
    mask: jnp.ndarray
    cameras: Cameras
    height: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=0)

    @property
    def num_pixels(self) -> int:
        return self.rgb.shape[0]

    @property
    def num_images(self) -> int:
        return self.cameras.num_cameras


def build_pixel_bank(images: np.ndarray, masks: np.ndarray,
                     cameras: Cameras) -> PixelBank:
    """images: [N, H, W, 3] uint8; masks: [N, H, W] uint8 {0,1}."""
    n, h, w, _ = images.shape
    return PixelBank(
        rgb=jnp.asarray(images.reshape(-1, 3)),
        mask=jnp.asarray(masks.reshape(-1)),
        cameras=cameras,
        height=h, width=w)


def decode_pixel_index(idx: jnp.ndarray, height: int, width: int):
    """Flat pixel index → (camera, x, y)."""
    hw = height * width
    cam = idx // hw
    rem = idx % hw
    y = rem // width
    x = rem % width
    return cam, x, y
