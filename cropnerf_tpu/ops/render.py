"""Volume-rendering compositors: transmittance weights and renderers.

TPU-native equivalents of nerfacc's CUDA ``render_weight_from_density`` /
``accumulate_along_rays`` (SURVEY §2.3 N2) and nerfstudio's renderer stack
bound at /root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:170-174
(RGB "last_sample", Accumulation, Depth(median), Semantic renderers) and
``RaySamples.get_weights`` (fruit_nerf.py:556).

The transmittance scan is an exclusive cumulative sum of sigma*delta along the
(on-chip) sample axis — an ordered scan that XLA lowers to a fast log-depth
cumsum on the VPU; no cross-chip dependency exists (SURVEY §5.7), so the ray
axis shards freely over the mesh while this axis stays local.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def render_weights(density: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Transmittance-composited weights.

    density: [R, S] (non-negative), deltas: [R, S] bin widths.
    Returns weights [R, S]:  w_i = alpha_i * T_i,
      alpha_i = 1 - exp(-sigma_i * delta_i),
      T_i = exp(-sum_{j<i} sigma_j * delta_j).
    """
    tau = density * deltas                                   # optical depth
    alpha = 1.0 - jnp.exp(-tau)
    # exclusive cumsum along samples
    accum = jnp.cumsum(tau, axis=-1)
    trans = jnp.exp(-(accum - tau))
    return alpha * trans


def accumulate(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """sum_i w_i * v_i along the sample axis. weights [R,S], values [R,S,C]."""
    return jnp.sum(weights[..., None] * values, axis=-2)


def render_rgb(weights: jnp.ndarray, rgb: jnp.ndarray,
               background: str = "last_sample",
               background_color: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Composite RGB with a background model.

    background: "last_sample" (train default, fruit_nerf inherits nerfacto's
    ``background_color="last_sample"``), "black", or "color" (uses
    background_color [3]).
    """
    comp = accumulate(weights, rgb)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    if background == "last_sample":
        bg = rgb[..., -1, :]
    elif background == "black":
        bg = jnp.zeros_like(comp)
    elif background == "color":
        assert background_color is not None
        bg = jnp.broadcast_to(background_color, comp.shape)
    else:
        raise ValueError(background)
    return comp + (1.0 - acc) * bg


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """Opacity per ray, [R, 1]."""
    return jnp.sum(weights, axis=-1, keepdims=True)


def render_depth_median(weights: jnp.ndarray, steps: jnp.ndarray) -> jnp.ndarray:
    """Median depth: the step at which cumulative weight first crosses 0.5
    (nerfstudio DepthRenderer(method="median")). steps: [R, S] midpoints.
    Returns [R, 1]."""
    cum = jnp.cumsum(weights, axis=-1)
    crossed = cum >= 0.5
    # index of first crossing; if never crossed use the last sample
    idx = jnp.argmax(crossed, axis=-1)
    none = ~jnp.any(crossed, axis=-1)
    idx = jnp.where(none, steps.shape[-1] - 1, idx)
    depth = jnp.take_along_axis(steps, idx[..., None], axis=-1)
    return depth


def render_depth_expected(weights: jnp.ndarray, steps: jnp.ndarray) -> jnp.ndarray:
    """Expected depth sum(w*t)/sum(w), [R, 1]."""
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    d = jnp.sum(weights * steps, axis=-1, keepdims=True)
    return d / jnp.maximum(acc, 1e-10)


def render_semantics(weights: jnp.ndarray, semantics: jnp.ndarray) -> jnp.ndarray:
    """Accumulate per-sample semantic logits, [R, C] (nerfstudio
    SemanticRenderer; weights are stop-gradiented by the caller when
    ``pass_semantic_gradients=False``, fruit_nerf.py:586-591)."""
    return accumulate(weights, semantics)
