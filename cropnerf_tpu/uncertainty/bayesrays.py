"""Post-hoc spatial uncertainty (BayesRays), adapted to the semantic head.

Equivalent of the vendored BayesRays in the reference
(/root/reference/crop_nerf/fruit_nerf/bayesrays/uncertainty.py:44-339,
output_uncertainty.py:32-111, utils.py:6-41), whose Fruit adaptation
backprops the **semantic** output instead of RGB (uncertainty.py:326).

Math: a virtual deformation field u(x) on a dense (2^lod+1)^3 grid perturbs
sample positions; the Laplace-approximation Hessian diagonal is accumulated
as, per ray r and grid corner g,

    H[g] += sum_d ( sum_{points p in r} w_{g,p} * dL_r/d u_d(x_p) )^2

where w are trilinear weights.  The reference materialises offsets with
``requires_grad`` and runs torch backward per channel + bincount scatter;
here it is one ``jax.grad`` w.r.t. injected offsets and a sort-based
segment-sum (static shapes, jit-safe) — no mutable grads, no uniques.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spatial
from ..core.rays import RayBundle
from ..models.config import ModelConfig
from ..models.field import field_density, field_semantics, field_rgb
from ..models.model import _proposal_sampling
from ..ops import render as render_ops


def normalize_points(points: jnp.ndarray, cfg: ModelConfig,
                     aabb: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World → [0,1]^3 + selector (utils.py:6-15)."""
    if cfg.field.use_contraction:
        pos = spatial.contracted_to_unit(points)
    else:
        pos = spatial.aabb_to_unit(points, aabb)
    selector = spatial.unit_selector(pos)
    return pos * selector[..., None], selector


def grid_corner_indices(pos_unit: jnp.ndarray, selector: jnp.ndarray,
                        lod: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """8-corner flat indices + trilinear coefficients (utils.py:18-41).

    pos_unit: [P, 3] in [0,1].  Returns (inds [8, P] int32, coeffs [8, P]).
    """
    res = 2 ** lod
    coords = pos_unit * res
    base = jnp.floor(coords)
    frac = coords - base
    inds, coeffs = [], []
    side = res + 1
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        idx = ((base[:, 0] + dx) * side * side
               + (base[:, 1] + dy) * side + (base[:, 2] + dz))
        w = (jnp.abs(frac[:, 0] - (1 - dx))
             * jnp.abs(frac[:, 1] - (1 - dy))
             * jnp.abs(frac[:, 2] - (1 - dz)))
        inds.append(idx.astype(jnp.int32))
        coeffs.append(w * selector)
    return jnp.stack(inds), jnp.stack(coeffs)


def _hessian_batch(params: Dict, rb: RayBundle, cfg: ModelConfig, lod: int,
                   channel: str) -> jnp.ndarray:
    """One ray batch → dense hessian grid contribution [(2^lod+1)^3]."""
    samples, _, _ = _proposal_sampling(params, rb, cfg, None, False, 1.0)
    positions = samples.positions                      # [R, S, 3]
    R, S = positions.shape[:2]

    def render_channel(offsets):
        pos = positions + offsets
        density, geo = field_density(params["field"], pos, cfg.field)
        weights = render_ops.render_weights(density, samples.deltas)
        if channel == "semantics":
            vals = field_semantics(params["field"], geo, cfg.field,
                                   pass_gradients=True)
        else:
            vals = field_rgb(params["field"], geo, samples.directions,
                             samples.camera_idx, cfg.field, train=False)
        out = render_ops.accumulate(weights, vals)     # [R, C]
        return jnp.sum(out, axis=0)                    # [C]

    zeros = jnp.zeros_like(positions)
    if channel == "semantics":
        grads = jax.grad(lambda o: render_channel(o)[0])(zeros)[None]
    else:
        grads = jax.jacrev(render_channel)(zeros)      # [C, R, S, 3]

    pos_unit, selector = normalize_points(positions, cfg)
    inds, coeffs = grid_corner_indices(pos_unit.reshape(-1, 3),
                                       selector.reshape(-1), lod)   # [8, P]
    P = R * S
    side = 2 ** lod + 1
    G = side ** 3

    ray_id = jnp.repeat(jnp.arange(R, dtype=jnp.int32), S)          # [P]
    hessian = jnp.zeros((G,), jnp.float32)
    # per (ray, corner-index) sums: sort-based segmenting over the 8P keys.
    # (ray, ind) pairs can exceed int32 when combined (G ~ 16.9M at lod=8),
    # so sort lexicographically with two stable passes instead of one
    # combined key.
    rays8 = jnp.broadcast_to(ray_id[None, :], inds.shape).reshape(-1)
    inds8 = inds.reshape(-1)
    order1 = jnp.argsort(inds8, stable=True)
    order = order1[jnp.argsort(rays8[order1], stable=True)]
    rays_s = rays8[order]
    inds_s = inds8[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         ((rays_s[1:] != rays_s[:-1]) | (inds_s[1:] != inds_s[:-1])
          ).astype(jnp.int32)])
    seg_id = jnp.cumsum(new_seg) - 1                                # [8P]
    n_seg = rays_s.shape[0]

    for c in range(grads.shape[0]):
        g_flat = grads[c].reshape(P, 3)                             # [P, 3]
        vals = (coeffs[:, :, None] * g_flat[None, :, :]).reshape(-1, 3)
        vals_s = vals[order]
        per_seg = jax.ops.segment_sum(vals_s, seg_id, num_segments=n_seg)
        sq = jnp.sum(per_seg ** 2, axis=-1)                         # [n_seg]
        seg_grid = jax.ops.segment_max(inds_s, seg_id, num_segments=n_seg)
        hessian = hessian.at[seg_grid].add(sq)
    return hessian


class ComputeUncertainty:
    """Hessian accumulation driver (≙ ComputeUncertainty.main,
    uncertainty.py:292-339)."""

    def __init__(self, params: Dict, cfg: ModelConfig, lod: int = 8,
                 channel: str = "semantics"):
        self.params = params
        self.cfg = cfg
        self.lod = lod
        self.channel = channel
        self._fn = jax.jit(functools.partial(
            _hessian_batch, cfg=cfg, lod=lod, channel=channel))

    def run(self, ray_batches, save_path=None) -> np.ndarray:
        """Iterate ray batches (RayBundles), accumulate, return the hessian
        grid [(2^lod+1)^3] (saved as unc.npy when ``save_path`` given)."""
        hessian = None
        for rb in ray_batches:
            h = self._fn(self.params, rb)
            hessian = h if hessian is None else hessian + h
        hessian = np.asarray(hessian)
        if save_path is not None:
            np.save(save_path, hessian)
        return hessian


# Fixed global log10 normalisation bounds (output_uncertainty.py: min=-3,
# max=6): uncertainty is an ABSOLUTE quantity — normalising per batch would
# rescale every render chunk independently and turn the filter threshold
# into a per-chunk relative quantile (chunk-boundary banding).
UNC_LOG_MIN = -3.0
UNC_LOG_MAX = 6.0


def uncertainty_at(points: jnp.ndarray, hessian: jnp.ndarray, cfg: ModelConfig,
                   lod: int, n_samples: int, lambda_reg: float = 1e-4
                   ) -> jnp.ndarray:
    """Pointwise uncertainty 1/(H/N + λ), trilinearly interpolated from the
    grid; log10-rescaled to [0,1] against the reference's FIXED global
    bounds [-3, 6] (output_uncertainty.py:32-76), so the same threshold
    means the same absolute uncertainty in every chunk/batch."""
    shape = points.shape[:-1]
    pos_unit, selector = normalize_points(points.reshape(-1, 3), cfg)
    inds, coeffs = grid_corner_indices(pos_unit, selector, lod)
    h = jnp.zeros(pos_unit.shape[0])
    for corner in range(8):
        h = h + hessian[inds[corner]] * coeffs[corner]
    unc = 1.0 / (h / n_samples + lambda_reg)
    unc = jnp.log10(unc + 1e-12)
    unc = (jnp.clip(unc, UNC_LOG_MIN, UNC_LOG_MAX) - UNC_LOG_MIN) \
        / (UNC_LOG_MAX - UNC_LOG_MIN)
    return unc.reshape(shape)


def make_uncertainty_density_hook(hessian: jnp.ndarray, cfg: ModelConfig,
                                  lod: int, n_samples: int,
                                  lambda_reg: float = 1e-4):
    """Density post-filter for uncertainty-filtered rendering: zero the
    field density wherever pointwise uncertainty exceeds the (traced)
    threshold — the reference viewer's filter slider
    (bayesrays/run_viewer_u.py:49-120 + output_uncertainty.py:44-63).

    Returns ``hook(positions, density, threshold) -> density`` for
    :func:`cropnerf_tpu.models.model.forward` /
    :func:`cropnerf_tpu.train.step.make_render_fn`.
    """
    hessian = jnp.asarray(hessian)

    def hook(positions, density, threshold):
        unc = uncertainty_at(positions, hessian, cfg, lod, n_samples,
                             lambda_reg)
        return jnp.where(unc <= threshold, density, 0.0)

    return hook


def render_uncertainty(params: Dict, rb: RayBundle, cfg: ModelConfig,
                       hessian: jnp.ndarray, lod: int, n_samples: int,
                       lambda_reg: float = 1e-4,
                       density_threshold: Optional[float] = None
                       ) -> jnp.ndarray:
    """Per-ray uncertainty: weight-accumulated pointwise uncertainty, with
    optional density filtering (output_uncertainty.py:78-111).  Returns [R]."""
    samples, _, _ = _proposal_sampling(params, rb, cfg, None, False, 1.0)
    density, _ = field_density(params["field"], samples.positions, cfg.field)
    if density_threshold is not None:
        density = jnp.where(density >= density_threshold, density, 0.0)
    weights = render_ops.render_weights(density, samples.deltas)
    unc = uncertainty_at(samples.positions, hessian, cfg, lod, n_samples,
                         lambda_reg)
    return jnp.sum(weights * unc, axis=-1)
