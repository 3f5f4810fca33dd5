"""Training losses: RGB MSE, semantic BCE, interlevel (proposal), distortion.

Equivalents of the loss stack at
/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:601-615 (MSE +
``BCEWithLogitsLoss`` vs fruit_mask + nerfstudio ``interlevel_loss`` +
``distortion_loss``).  All pure jnp; the distortion loss uses the O(n)
cumulative-sum form (the nerfacc CUDA kernel's math) instead of the O(n^2)
pairwise expansion.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

_EPS = jnp.finfo(jnp.float32).eps


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             mask: jnp.ndarray | None = None) -> jnp.ndarray:
    err = (pred - target) ** 2
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0) * err.shape[-1]
        return jnp.sum(err * mask[..., None]) / denom
    return jnp.mean(err)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy on logits (torch
    BCEWithLogitsLoss semantics, mean reduction)."""
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0) * (per.size / mask.size)
        return jnp.sum(per * mask.reshape(mask.shape + (1,) * (per.ndim - mask.ndim))) / denom
    return jnp.mean(per)


def _outer_measure(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """Total env weight intersecting each query bin (mipnerf360 ``outer``).

    All in s-space; t0_*: [R, N] query bin edges, t1_*: [R, M] env bin edges,
    y1: [R, M] env weights.
    """
    # Gather-free SUM form.  The searchsorted lookups of mipnerf360's
    # ``outer`` (cy1[idx_lo], cy1[idx_hi+1]) are prefix sums of y1 at
    # data-dependent cut points; because t1_* are ascending, each lookup
    # expands to a masked sum that is LINEAR in y1:
    #   cy1_lo[n] = cy1[max(#(t1_starts<=t0_start)-1, 0)]
    #             = sum_m y1[m] * [t1_starts[m+1] <= t0_starts[n]]
    #   cy1_hi[n] = cy1[clip(#(t1_ends<=t0_end), 0, M-1) + 1]
    #             = y1[0] + sum_{m>=1} y1[m] * [t1_ends[m-1] <= t0_ends[n]]
    # (derivation holds for contiguous ascending bins).  Compared to the
    # earlier max-of-cumsum form this is one [R, N, M-1] pass per bound
    # with a plain broadcast-multiply-reduce backward — no cumsum, no
    # argmax/tie routing — and the bin edges carry no parameter gradients
    # (final-level edges are stop-gradiented by the caller; proposal edges
    # come from param-free spaced bins / stop-gradiented CDF inversion).
    lo_mask = t1_starts[..., None, 1:] <= t0_starts[..., :, None]  # [R,N,M-1]
    cy1_lo = jnp.sum(jnp.where(lo_mask, y1[..., None, :-1], 0.0), axis=-1)
    hi_mask = t1_ends[..., None, :-1] <= t0_ends[..., :, None]     # [R,N,M-1]
    cy1_hi = y1[..., :1] + jnp.sum(
        jnp.where(hi_mask, y1[..., None, 1:], 0.0), axis=-1)
    return cy1_hi - cy1_lo


def interlevel_loss(weights_list: List[jnp.ndarray],
                    sdist_list: List[jnp.ndarray]) -> jnp.ndarray:
    """Proposal supervision (mipnerf360 ``lossfun_outer``): the only gradient
    path into the proposal density fields.  Final-level histogram is detached;
    proposal weights are not.

    weights_list: per-level [R, S_l] weights (final level last).
    sdist_list:   per-level [R, S_l + 1] s-space bin edges.
    """
    c = jax.lax.stop_gradient(sdist_list[-1])
    w = jax.lax.stop_gradient(weights_list[-1])
    loss = 0.0
    for sdist, wp in zip(sdist_list[:-1], weights_list[:-1]):
        w_outer = _outer_measure(c[..., :-1], c[..., 1:],
                                 sdist[..., :-1], sdist[..., 1:], wp)
        loss = loss + jnp.mean(
            jnp.clip(w - w_outer, 0.0) ** 2 / (w + _EPS))
    return loss


def distortion_loss(weights: jnp.ndarray, sdist: jnp.ndarray) -> jnp.ndarray:
    """mipnerf360 distortion on the final level, O(n) form:

      L = sum_ij w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 (t_{i+1} - t_i)

    with m the s-space bin midpoints (sorted ascending), via
      sum_ij w_i w_j |m_i - m_j| = 2 sum_i w_i (m_i W_i^< - S_i^<)
    where W^< and S^< are exclusive prefix sums of w and w*m.
    """
    m = 0.5 * (sdist[..., 1:] + sdist[..., :-1])
    dt = sdist[..., 1:] - sdist[..., :-1]
    wm = weights * m
    w_cum = jnp.cumsum(weights, axis=-1) - weights       # exclusive
    wm_cum = jnp.cumsum(wm, axis=-1) - wm
    loss_bi = 2.0 * jnp.sum(weights * (m * w_cum - wm_cum), axis=-1)
    loss_uni = jnp.sum(weights ** 2 * dt, axis=-1) / 3.0
    return jnp.mean(loss_bi + loss_uni)


def camera_opt_regularizer(pose_adjustment: jnp.ndarray,
                           trans_penalty: float = 1e-2,
                           rot_penalty: float = 1e-3) -> jnp.ndarray:
    """L2 penalty on SE(3) tangent deltas (nerfstudio CameraOptimizer
    defaults; bound at fruit_nerf.py:612-615 via camera_optimizer.get_loss_dict)."""
    # safe norm: sqrt grad at the zero init would be NaN otherwise
    trans = jnp.sqrt(jnp.sum(pose_adjustment[:, :3] ** 2, axis=-1) + 1e-12).mean()
    rot = jnp.sqrt(jnp.sum(pose_adjustment[:, 3:] ** 2, axis=-1) + 1e-12).mean()
    return trans * trans_penalty + rot * rot_penalty
