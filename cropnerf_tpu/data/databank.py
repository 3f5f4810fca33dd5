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


# -- sharded bank (multi-host / large datasets) ------------------------------
#
# The replicated bank above is ideal up to a few GB.  For pod slices (or
# datasets larger than one chip's HBM) the bank itself shards over the
# ``data`` mesh axis at image granularity and each device samples rays from
# its *local* shard only — the reference's per-rank datamanager contract
# (fruit_pipeline.py:100-102: world_size/local_rank threaded into the
# datamanager so each rank draws independent ray batches).  Each host loads
# only its own image slice from disk (``process_image_range``) and the global
# array is assembled with ``jax.make_array_from_process_local_data``.


def padded_num_images(num_images: int, num_shards: int) -> int:
    """Images are the shard granularity (every image holds H*W pixels), so
    the global image count is padded up to a multiple of the mesh size."""
    return ((num_images + num_shards - 1) // num_shards) * num_shards


def pad_cameras(cameras: Cameras, num_shards: int) -> Cameras:
    """Camera set padded to the sharding granularity by wrapping around
    (``i % n``) — duplicated frames bias pixel sampling negligibly and keep
    every shard shape-identical (static shapes under jit)."""
    n = cameras.num_cameras
    n_pad = padded_num_images(n, num_shards)
    if n_pad == n:
        return cameras
    sel = np.arange(n_pad) % n

    def take(a):
        return jnp.asarray(np.asarray(a)[sel])

    return Cameras(
        c2w=take(cameras.c2w), fx=take(cameras.fx), fy=take(cameras.fy),
        cx=take(cameras.cx), cy=take(cameras.cy),
        width=take(cameras.width), height=take(cameras.height),
        distortion=(take(cameras.distortion)
                    if cameras.distortion is not None else None))


def pad_images_for_sharding(images: np.ndarray, masks: np.ndarray,
                            cameras: Cameras, num_shards: int):
    """Repeat trailing images (and their cameras) so the stack divides the
    mesh evenly."""
    n = images.shape[0]
    sel = np.arange(padded_num_images(n, num_shards)) % n
    return images[sel], masks[sel], pad_cameras(cameras, num_shards)


def process_image_range(num_images_padded: int) -> tuple:
    """[lo, hi) slice of the padded global image stack this host must load
    (per-host input pipelines feed only their shard, SURVEY §5.8)."""
    import jax
    per = num_images_padded // jax.process_count()
    lo = jax.process_index() * per
    return lo, lo + per


def build_sharded_pixel_bank(local_images: np.ndarray,
                             local_masks: np.ndarray,
                             cameras: Cameras,
                             mesh) -> PixelBank:
    """Bank with rgb/mask sharded over the ``data`` mesh axis.

    ``local_images``/``local_masks``: THIS process's contiguous slice of the
    padded global stack (all of it in single-process runs).  ``cameras``:
    the full padded global camera set (tiny; replicated).  The global image
    count (``cameras.num_cameras``) must divide the mesh size.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_global = cameras.num_cameras
    assert n_global % mesh.size == 0, (
        f"{n_global} images over {mesh.size} devices: pad first "
        "(pad_images_for_sharding)")
    n, h, w, _ = local_images.shape
    assert n * jax.process_count() == n_global, (
        f"each of {jax.process_count()} processes must hold "
        f"{n_global // jax.process_count()} images, got {n}")
    rgb = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local_images.reshape(-1, 3))
    mask = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local_masks.reshape(-1))
    # The per-host loader (process_image_range) assumes this process's
    # devices own the CONTIGUOUS global row range [p*per, (p+1)*per).  If
    # device enumeration ever interleaved processes in the mesh, the local
    # slice would land on the wrong global rows and the sharded step's
    # ``cam = cam_l + axis_index*images_per_device`` would silently pair
    # pixels with wrong cameras — assert the layout instead of trusting it.
    total_rows = n_global * h * w
    per_proc = total_rows // jax.process_count()
    lo_row = jax.process_index() * per_proc
    spans = sorted(((s.index[0].start or 0,
                     s.index[0].stop if s.index[0].stop is not None
                     else total_rows) for s in rgb.addressable_shards))
    assert spans[0][0] == lo_row and spans[-1][1] == lo_row + per_proc and \
        all(a[1] == b[0] for a, b in zip(spans, spans[1:])), (
        f"process {jax.process_index()} owns rows {spans}, expected the "
        f"contiguous range [{lo_row}, {lo_row + per_proc}) — device "
        "enumeration interleaves processes; the sharded bank's camera-id "
        "arithmetic does not support this mesh layout")
    replicate = NamedSharding(mesh, P())
    cams = jax.tree.map(lambda a: jax.device_put(a, replicate), cameras)
    return PixelBank(rgb=rgb, mask=mask, cameras=cams, height=h, width=w)
