"""Pinhole camera model, ray generation, and AABB ray clipping.

TPU-native equivalent of nerfstudio ``Cameras`` / ``Cameras.generate_rays``
(bound at /root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:283 with
``aabb_box=`` clipping, and via the datamanager's RayGenerator for training).

Convention matches transforms.json / nerfstudio (OpenGL): camera -Z forward,
+Y up; ``c2w`` is [3, 4] camera-to-world.  All cameras of a dataset are
stored struct-of-arrays so ray generation for a training batch is one fused
gather + matmul on device — no per-camera Python objects.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .rays import RayBundle


@struct.dataclass
class Cameras:
    """N stacked cameras.

    c2w:    [N, 3, 4] camera-to-world (OpenGL convention).
    fx, fy, cx, cy: [N] intrinsics in pixels.
    width, height:  [N] int32 (images are rescaled to a common size in the
            dataparser; the static render resolution comes from the dataset).
    distortion: [N, 6] (k1, k2, k3, k4, p1, p2) or None when undistorted.
    """

    c2w: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    distortion: Optional[jnp.ndarray] = None

    @property
    def num_cameras(self) -> int:
        return self.c2w.shape[0]


def _undistort(x: jnp.ndarray, y: jnp.ndarray, coeffs: jnp.ndarray,
               iters: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterative inverse of the OpenCV radial/tangential distortion model
    (nerfstudio ``radial_and_tangential_undistort``).  coeffs: [..., 6]."""
    k1, k2, k3, k4 = coeffs[..., 0], coeffs[..., 1], coeffs[..., 2], coeffs[..., 3]
    p1, p2 = coeffs[..., 4], coeffs[..., 5]
    xu, yu = x, y
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx = 2.0 * p1 * xu * yu + p2 * (r2 + 2.0 * xu * xu)
        dy = p1 * (r2 + 2.0 * yu * yu) + 2.0 * p2 * xu * yu
        xu = (x - dx) / radial
        yu = (y - dy) / radial
    return xu, yu


def generate_rays(cameras: Cameras, cam_idx: jnp.ndarray,
                  pixel_x: jnp.ndarray, pixel_y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays through pixel centers for (camera, x, y) index triples.

    cam_idx/pixel_x/pixel_y: [R] (pixel coords are 0-based integers; the ray
    passes through the pixel center, i.e. +0.5).
    Returns (origins [R,3], directions [R,3] unit-norm).
    """
    fx = cameras.fx[cam_idx]
    fy = cameras.fy[cam_idx]
    cx = cameras.cx[cam_idx]
    cy = cameras.cy[cam_idx]
    c2w = cameras.c2w[cam_idx]                       # [R, 3, 4]

    x = (pixel_x.astype(jnp.float32) + 0.5 - cx) / fx
    y = (pixel_y.astype(jnp.float32) + 0.5 - cy) / fy
    if cameras.distortion is not None:
        x, y = _undistort(x, y, cameras.distortion[cam_idx])
    # OpenGL: -y (image y grows downward), -z forward.
    dirs_cam = jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)
    dirs = jnp.einsum("rij,rj->ri", c2w[:, :, :3], dirs_cam)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = c2w[:, :, 3]
    return origins, dirs


def camera_ray_grid(cameras: Cameras, cam_index: int | jnp.ndarray,
                    height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image ray grid for one camera → (origins [H*W,3], dirs [H*W,3])."""
    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    idx = jnp.full((height * width,), cam_index, dtype=jnp.int32)
    return generate_rays(cameras, idx, xs.reshape(-1), ys.reshape(-1))


def ray_aabb_intersect(origins: jnp.ndarray, directions: jnp.ndarray,
                       aabb: jnp.ndarray,
                       min_near: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB intersection.

    aabb: [2, 3].  Returns (nears [R], fars [R], hit_mask [R] float {0,1}).
    Replaces nerfstudio ``generate_rays(aabb_box=...)`` + the reference's
    ``valid = nears < 1e10`` jagged filtering (fruit_nerf.py:283-297) with a
    static-shape mask.
    """
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-12,
                          jnp.where(directions >= 0, 1e-12, -1e-12), directions)
    t0 = (aabb[0] - origins) * inv
    t1 = (aabb[1] - origins) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    nears = jnp.maximum(tmin, min_near)
    fars = tmax
    hit = (fars > nears) & (fars > 0)
    nears = jnp.where(hit, jnp.maximum(nears, 0.0), 0.0)
    fars = jnp.where(hit, fars, 1.0)
    return nears, fars, hit.astype(jnp.float32)


def near_far_collider(ray_bundle: RayBundle, near: float, far: float) -> RayBundle:
    """Constant near/far assignment (nerfstudio ``NearFarCollider``,
    fruit_nerf.py:167, nerfacto defaults near 0.05 / far 1000)."""
    R = ray_bundle.num_rays
    return ray_bundle.replace(
        nears=jnp.full((R,), near, dtype=jnp.float32),
        fars=jnp.full((R,), far, dtype=jnp.float32))
