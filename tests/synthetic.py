"""Synthetic tiny scene for end-to-end tests: a coloured 'crop' sphere inside
the unit box, viewed from cameras on a ring (stands in for a 3DCotton plant,
SURVEY §4 test-strategy item (c))."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cropnerf_tpu.core.cameras import Cameras


def ring_cameras(n: int = 8, radius: float = 1.2, height: float = 64,
                 width: float = 64, focal: float = 80.0,
                 elevations=(0.3,)) -> Cameras:
    """n cameras on a circle looking at the origin (OpenGL convention).
    ``elevations`` are cycled per camera (multiple rings disambiguate
    density floaters between objects)."""
    c2ws = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        z = elevations[i % len(elevations)]
        eye = np.array([radius * np.cos(theta), radius * np.sin(theta), z])
        forward = -eye / np.linalg.norm(eye)          # look at origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        # OpenGL: columns = (x=right, y=up, z=-forward)
        R = np.stack([right, true_up, -forward], axis=1)
        c2ws.append(np.concatenate([R, eye[:, None]], axis=1))
    c2w = np.stack(c2ws).astype(np.float32)
    n_f = np.full((n,), focal, np.float32)
    return Cameras(
        c2w=jnp.asarray(c2w),
        fx=jnp.asarray(n_f), fy=jnp.asarray(n_f),
        cx=jnp.full((n,), width / 2, jnp.float32),
        cy=jnp.full((n,), height / 2, jnp.float32),
        width=jnp.full((n,), width, jnp.int32),
        height=jnp.full((n,), height, jnp.int32))


def render_multi_sphere_images(cameras: Cameras, height: int, width: int,
                               centers, radius: float = 0.18,
                               occluders=None, occluder_radius: float = 0.25,
                               texture_freq: float = 0.0):
    """Ray-trace several matte spheres ('crops') on white background.

    ``occluders`` [M, 3]: extra grey spheres that render into the IMAGE and
    the z-buffer (hiding crops behind them, like foliage/trunk geometry on
    real plants) but never into masks/labels — the NeRF must reconstruct
    them while the semantic head learns to exclude them.

    ``texture_freq`` > 0 modulates albedo with a high-frequency surface
    pattern (sin products at that spatial frequency) — the
    high-frequency-content regime where hash grids are expected to beat
    PE MLPs; used by the harder psnr-parity scene.

    Returns (images [N,H,W,3] u8, masks [N,H,W] u8 binary,
    labels [N,H,W] u8 instance ids 1..K with z-ordering).
    """
    c2w = np.asarray(cameras.c2w)
    fx = np.asarray(cameras.fx)
    n = c2w.shape[0]
    centers = np.asarray(centers, np.float64)
    spheres = [(ctr, radius, k + 1) for k, ctr in enumerate(centers)]
    if occluders is not None:
        spheres += [(np.asarray(ctr, np.float64), occluder_radius, 0)
                    for ctr in np.asarray(occluders, np.float64)]
    images = np.zeros((n, height, width, 3), np.uint8)
    masks = np.zeros((n, height, width), np.uint8)
    labels = np.zeros((n, height, width), np.uint8)
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    tints = [(1.0, 0.15, 0.1), (0.9, 0.5, 0.1), (0.8, 0.1, 0.6),
             (0.2, 0.8, 0.3)]
    grey = (0.45, 0.48, 0.42)
    for i in range(n):
        x = (xs + 0.5 - width / 2) / fx[i]
        y = (ys + 0.5 - height / 2) / fx[i]
        dirs_cam = np.stack([x, -y, -np.ones_like(x)], -1)
        dirs = dirs_cam @ c2w[i, :, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        o = c2w[i, :, 3]
        img = np.ones((height, width, 3), np.float32)
        zbuf = np.full((height, width), np.inf)
        light = np.array([0.5, 0.5, 1.0])
        light = light / np.linalg.norm(light)
        for ctr, rad, inst in spheres:
            oc = o - ctr
            b = np.sum(dirs * oc, -1)
            c = np.sum(oc * oc) - rad ** 2
            disc = b * b - c
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            hit &= (t > 0) & (t < zbuf)
            p = o + t[..., None] * dirs
            normal = (p - ctr) / rad
            lam = np.clip(np.sum(normal * light, -1), 0.2, 1.0)
            tint = np.asarray(grey if inst == 0
                              else tints[(inst - 1) % len(tints)])
            shade = lam[hit][:, None] * tint[None, :]
            if texture_freq > 0:
                ph = p[hit]
                tex = (0.65 + 0.35 * np.sin(texture_freq * ph[:, 0])
                       * np.sin(texture_freq * ph[:, 1])
                       * np.sin(texture_freq * ph[:, 2]))
                shade = shade * tex[:, None]
            img[hit] = shade
            zbuf[hit] = t[hit]
            masks[i][hit] = 1 if inst else 0
            labels[i][hit] = inst
        images[i] = (img * 255).astype(np.uint8)
    return images, masks, labels


def render_synthetic_images(cameras: Cameras, height: int, width: int,
                            sphere_center=(0.0, 0.0, 0.0),
                            sphere_radius: float = 0.3):
    """Analytically ray-trace a matte red sphere on white background.

    Returns (images [N,H,W,3] uint8, masks [N,H,W] uint8) where the mask is 1
    on the sphere (the synthetic 'crop').
    """
    c2w = np.asarray(cameras.c2w)
    fx = np.asarray(cameras.fx)
    n = c2w.shape[0]
    images = np.zeros((n, height, width, 3), np.uint8)
    masks = np.zeros((n, height, width), np.uint8)
    ctr = np.asarray(sphere_center)
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    for i in range(n):
        x = (xs + 0.5 - width / 2) / fx[i]
        y = (ys + 0.5 - height / 2) / fx[i]
        dirs_cam = np.stack([x, -y, -np.ones_like(x)], -1)
        dirs = dirs_cam @ c2w[i, :, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        o = c2w[i, :, 3]
        oc = o - ctr
        b = np.sum(dirs * oc, -1)
        c = np.sum(oc * oc) - sphere_radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= t > 0
        # shade: simple lambert from a fixed light
        p = o + t[..., None] * dirs
        normal = (p - ctr) / sphere_radius
        light = np.array([0.5, 0.5, 1.0])
        light = light / np.linalg.norm(light)
        lam = np.clip(np.sum(normal * light, -1), 0.2, 1.0)
        img = np.ones((height, width, 3), np.float32)
        img[hit] = np.stack([lam[hit], 0.15 * lam[hit], 0.1 * lam[hit]], -1)
        images[i] = (img * 255).astype(np.uint8)
        masks[i] = hit.astype(np.uint8)
    return images, masks
