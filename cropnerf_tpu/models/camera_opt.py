"""Camera-pose optimisation: per-camera SO3xR3 tangent deltas.

Equivalent of nerfstudio ``CameraOptimizer`` (bound at
/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:114-116,547 — the train
path applies pose deltas to the ray bundle before sampling).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rays import RayBundle


def camera_opt_init(num_cameras: int) -> jnp.ndarray:
    """Zero-initialised [N, 6] tangent deltas: (tx, ty, tz, rx, ry, rz)."""
    return jnp.zeros((num_cameras, 6), dtype=jnp.float32)


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: so(3) vector [..., 3] → rotation matrix [..., 3, 3].

    Taylor-guarded near zero so gradients stay finite at the (zero) init.
    """
    # safe norm (sqrt grad at ||omega||=0 is NaN otherwise — omega starts at 0)
    theta = jnp.sqrt(jnp.sum(omega ** 2, axis=-1, keepdims=True) + 1e-24)
    axis = omega / theta
    theta = theta[..., None]
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack([
        jnp.stack([zeros, -kz, ky], axis=-1),
        jnp.stack([kz, zeros, -kx], axis=-1),
        jnp.stack([-ky, kx, zeros], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    sin, cos = jnp.sin(theta), jnp.cos(theta)
    R = eye + sin * K + (1.0 - cos) * (K @ K)
    return jnp.where(theta < 1e-8, eye + K * theta, R)


def apply_to_raybundle(pose_adjustment: jnp.ndarray, ray_bundle: RayBundle,
                       mode: str = "SO3xR3") -> RayBundle:
    """Adjust ray origins/directions by the per-camera deltas
    (nerfstudio ``CameraOptimizer.apply_to_raybundle``): origins += t,
    directions ← R(omega) @ directions."""
    if mode == "off":
        return ray_bundle
    adj = pose_adjustment[ray_bundle.camera_idx]          # [R, 6]
    origins = ray_bundle.origins + adj[:, :3]
    R = exp_so3(adj[:, 3:])                               # [R, 3, 3]
    directions = jnp.einsum("rij,rj->ri", R, ray_bundle.directions)
    return ray_bundle.replace(origins=origins, directions=directions)
