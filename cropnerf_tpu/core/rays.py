"""Ray and sample containers as immutable struct-of-arrays pytrees.

TPU-first replacement for the reference's mutable ``RayBundle``/``RaySamples``
objects (nerfstudio ``cameras/rays.py``, bound at
/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:617-637).  Everything is a
registered pytree with static shapes so the whole render path stays inside one
XLA computation; jagged/"valid ray" handling becomes masking (see
``RayBundle.mask``) instead of boolean filtering.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayBundle:
    """A batch of rays.

    Shapes: all leading dims are the ray batch ``[R]``.

    origins:    [R, 3] world-space ray origins.
    directions: [R, 3] unit direction vectors.
    nears:      [R] per-ray near distance (set by the collider or AABB clip).
    fars:       [R] per-ray far distance.
    camera_idx: [R] int32 index of the source camera (appearance embedding +
                camera-pose optimisation key). Zero when not applicable.
    mask:       [R] float32 {0,1} validity mask.  Replaces the reference's
                jagged valid-ray gathering (fruit_nerf.py:286-303) — invalid
                rays still flow through the static-shape compute and are
                zeroed at the end.
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    nears: jnp.ndarray
    fars: jnp.ndarray
    camera_idx: jnp.ndarray
    mask: Optional[jnp.ndarray] = None

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        if self.mask is None:
            return jnp.ones(self.origins.shape[:-1], dtype=jnp.float32)
        return self.mask


@struct.dataclass
class RaySamples:
    """Per-ray sample points along rays.

    starts/ends: [R, S] euclidean bin edges along each ray (t-space).
    spacing_starts/spacing_ends: [R, S] bin edges in normalised s-space
        (the sampler's warped coordinate, used by interlevel/distortion
        losses, mirroring nerfstudio ``RaySamples.spacing_*``).
    """

    origins: jnp.ndarray         # [R, 3]
    directions: jnp.ndarray      # [R, 3]
    starts: jnp.ndarray          # [R, S]
    ends: jnp.ndarray            # [R, S]
    spacing_starts: jnp.ndarray  # [R, S]
    spacing_ends: jnp.ndarray    # [R, S]
    camera_idx: jnp.ndarray      # [R]

    @property
    def positions(self) -> jnp.ndarray:
        """Sample midpoints in world space, shape [R, S, 3]."""
        mids = 0.5 * (self.starts + self.ends)
        return self.origins[:, None, :] + mids[..., None] * self.directions[:, None, :]

    @property
    def deltas(self) -> jnp.ndarray:
        """Bin widths, shape [R, S]."""
        return self.ends - self.starts

    @property
    def midpoints(self) -> jnp.ndarray:
        return 0.5 * (self.starts + self.ends)

    @property
    def spacing_midpoints(self) -> jnp.ndarray:
        return 0.5 * (self.spacing_starts + self.spacing_ends)


def ray_samples_from_bins(ray_bundle: RayBundle, spacing_bins: jnp.ndarray,
                          s_to_t) -> RaySamples:
    """Build RaySamples from s-space bin edges.

    spacing_bins: [R, S+1] monotone bin edges in [0, 1] (s-space).
    s_to_t: vectorised map from s in [0,1] to euclidean t (already bound to
        each ray's near/far).
    """
    t_bins = s_to_t(spacing_bins)
    return RaySamples(
        origins=ray_bundle.origins,
        directions=ray_bundle.directions,
        starts=t_bins[..., :-1],
        ends=t_bins[..., 1:],
        spacing_starts=spacing_bins[..., :-1],
        spacing_ends=spacing_bins[..., 1:],
        camera_idx=ray_bundle.camera_idx,
    )
