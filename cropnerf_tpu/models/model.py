"""CropNeRF model: proposal-sampled semantic NeRF, pure-function forward.

TPU-native re-design of ``FruitModel``
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:87-637).  Instead of an
nn.Module with test-mode dispatch, the model is a set of pure functions over a
params pytree; each entry point corresponds to one reference path:

  * :func:`forward`              ≙ get_outputs / get_inference_outputs (:543/:497)
  * :func:`forward_export`       ≙ get_export_outputs (:476-494, raw samples)
  * :func:`forward_accumulation` ≙ get_density_for_camera_ray_bundle (:320-344)
  * :func:`anneal_factor` + proposal loop ≙ ProposalNetworkSampler with
    annealing callbacks (:144-164, :198-232)

All shapes are static; rays are the shardable axis, samples stay on-chip.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.rays import RayBundle, RaySamples
from ..ops import pdf as pdf_ops
from ..ops import render as render_ops
from .camera_opt import apply_to_raybundle, camera_opt_init
from .config import ModelConfig
from .field import (field_all, field_density, field_init, field_rgb,
                    field_semantics)
from .proposal import proposal_density, proposal_init


def model_init(key: jax.Array, cfg: ModelConfig, num_images: int) -> Dict:
    keys = jax.random.split(key, 2 + len(cfg.proposal_fields))
    params = {
        "field": field_init(keys[0], cfg.field, num_images),
        "camera_opt": camera_opt_init(num_images),
    }
    for i, pcfg in enumerate(cfg.proposal_fields):
        params[f"proposal_{i}"] = proposal_init(keys[2 + i], pcfg)
    return params


def anneal_factor(step: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Proposal-weight annealing (fruit_nerf.py:198-217): bias(train_frac, s)
    with bias(x, s) = s*x / ((s-1)*x + 1), ramping 0→1 over
    ``proposal_weights_anneal_max_num_iters`` steps."""
    n = cfg.proposal_weights_anneal_max_num_iters
    x = jnp.clip(step.astype(jnp.float32) / n, 0.0, 1.0)
    s = cfg.proposal_weights_anneal_slope
    return s * x / ((s - 1.0) * x + 1.0)


def _proposal_sampling(params: Dict, rb: RayBundle, cfg: ModelConfig,
                       key: Optional[jax.Array], train: bool,
                       anneal: jnp.ndarray | float,
                       prop_update: Optional[jnp.ndarray] = None,
                       density_hook=None,
                       ) -> Tuple[RaySamples, List[jnp.ndarray], List[jnp.ndarray]]:
    """Hierarchical proposal sampling (nerfstudio ProposalNetworkSampler).

    Returns (final RaySamples, weights_list, sdist_list) where the lists hold
    one entry per proposal level (final level appended by the caller).

    ``prop_update`` (traced bool scalar): the proposal update schedule
    (fruit_nerf.py:144-149 / nerfstudio's no_grad between update steps).
    When False, the proposal evals run with stopped gradients inside a
    ``lax.cond`` — gradient-IDENTICAL to gating the interlevel loss to zero
    (the only grad path into the prop nets; sampling already uses
    ``stop_gradient(weights)``) but the expensive prop backward (gather
    transpose + MLP vjp over 256+96 samples/ray) is skipped entirely on
    non-update steps.
    """
    spacing = pdf_ops.spacing_piecewise()
    n_prop = cfg.num_proposal_iterations
    keys = (list(jax.random.split(key, n_prop + 1))
            if key is not None else [None] * (n_prop + 1))

    weights_list: List[jnp.ndarray] = []
    sdist_list: List[jnp.ndarray] = []

    samples = pdf_ops.sample_spaced(keys[0], rb,
                                    cfg.num_proposal_samples_per_ray[0],
                                    spacing, train, cfg.use_single_jitter)
    weights = None
    for i in range(n_prop):
        def prop_fn(p, x, _i=i):
            return proposal_density(p, x, cfg.proposal_fields[_i])
        if cfg.remat or cfg.remat_props:
            prop_fn = jax.checkpoint(prop_fn)
        if prop_update is not None:
            density = jax.lax.cond(
                prop_update,
                prop_fn,
                lambda p, x: jax.lax.stop_gradient(
                    prop_fn(jax.lax.stop_gradient(p),
                            jax.lax.stop_gradient(x))),
                params[f"proposal_{i}"], samples.positions)
        else:
            density = prop_fn(params[f"proposal_{i}"], samples.positions)
        if density_hook is not None:
            # uncertainty-filtered rendering also wraps the proposal density
            # fns (output_uncertainty.py density_fns_new) so proposal samples
            # avoid filtered-out regions
            density = density_hook(samples.positions, density)
        weights = render_ops.render_weights(density, samples.deltas)
        sdist = jnp.concatenate(
            [samples.spacing_starts, samples.spacing_ends[..., -1:]], axis=-1)
        weights_list.append(weights)
        sdist_list.append(sdist)

        annealed = jnp.power(jax.lax.stop_gradient(weights), anneal)
        next_count = (cfg.num_proposal_samples_per_ray[i + 1]
                      if i + 1 < n_prop else cfg.num_nerf_samples_per_ray)
        samples = pdf_ops.sample_pdf(keys[i + 1], rb, sdist, annealed,
                                     next_count, spacing, train,
                                     cfg.use_single_jitter)
    return samples, weights_list, sdist_list


def forward(params: Dict, ray_bundle: RayBundle, cfg: ModelConfig,
            key: Optional[jax.Array] = None, train: bool = False,
            anneal: jnp.ndarray | float = 1.0,
            background: Optional[str] = None,
            density_hook=None,
            prop_update: Optional[jnp.ndarray] = None
            ) -> Dict[str, jnp.ndarray]:
    """Full composited forward pass.

    Train path ≙ fruit_nerf.py:543-599; eval/inference uses mean appearance
    and optionally a black background (the projection CLI overrides the
    background, scripts/semantic_projection.py:158).  ``density_hook``
    (positions, density) -> density post-processes the final field density —
    the BayesRays uncertainty-filtered rendering path
    (bayesrays/output_uncertainty.py:44-63 density filtering).
    """
    rb = apply_to_raybundle(params["camera_opt"], ray_bundle,
                            cfg.camera_opt.mode) if train else ray_bundle

    samples, weights_list, sdist_list = _proposal_sampling(
        params, rb, cfg, key, train, anneal, prop_update,
        density_hook=density_hook)

    def field_eval(fparams, positions, directions, camera_idx):
        return field_all(fparams, positions, directions, camera_idx,
                         cfg.field, train, cfg.pass_semantic_gradients)

    if cfg.remat:
        field_eval = jax.checkpoint(field_eval)
    density, rgb_samples, sem_samples = field_eval(
        params["field"], samples.positions, samples.directions,
        samples.camera_idx)
    if cfg.use_gradient_scaling:
        # Gradient scaling by squared sample distance (≙ nerfacto's
        # scale_gradients_by_distance_squared, fruit_nerf.py:432-434;
        # forward is the identity, backward multiplies by clamp(t², 0, 1))
        s = jnp.clip(samples.midpoints ** 2, 0.0, 1.0)

        def gscale(v, s):
            return v * s + jax.lax.stop_gradient(v * (1.0 - s))

        density = gscale(density, s)
        rgb_samples = gscale(rgb_samples, s[..., None])
        sem_samples = gscale(sem_samples, s[..., None])
    if density_hook is not None:
        density = density_hook(samples.positions, density)
    weights = render_ops.render_weights(density, samples.deltas)

    sdist = jnp.concatenate(
        [samples.spacing_starts, samples.spacing_ends[..., -1:]], axis=-1)
    weights_list = weights_list + [weights]
    sdist_list = sdist_list + [sdist]

    bg = background or cfg.background_color
    rgb = render_ops.render_rgb(weights, rgb_samples, background=bg)
    accumulation = render_ops.render_accumulation(weights)
    depth = render_ops.render_depth_median(jax.lax.stop_gradient(weights),
                                           samples.midpoints)
    sem_weights = (weights if cfg.pass_semantic_gradients
                   else jax.lax.stop_gradient(weights))
    semantics = render_ops.render_semantics(sem_weights, sem_samples)

    outputs = {
        "rgb": rgb,
        "accumulation": accumulation,
        "depth": depth,
        "semantics": semantics,
        "semantics_colormap": jax.nn.sigmoid(semantics),
        "weights_list": weights_list,
        "sdist_list": sdist_list,
    }
    # Per-proposal expected depths (debug heads, fruit_nerf.py:582-583).
    for i in range(cfg.num_proposal_iterations):
        mids = 0.5 * (sdist_list[i][..., 1:] + sdist_list[i][..., :-1])
        outputs[f"prop_depth_{i}"] = render_ops.render_depth_expected(
            jax.lax.stop_gradient(weights_list[i]), mids)

    if ray_bundle.mask is not None:
        m = ray_bundle.mask
        for k in ("rgb", "accumulation", "depth", "semantics",
                  "semantics_colormap"):
            outputs[k] = outputs[k] * m[..., None]
    return outputs


def forward_export(params: Dict, ray_bundle: RayBundle, cfg: ModelConfig,
                   num_samples: int, aabb: jnp.ndarray,
                   key: Optional[jax.Array] = None,
                   render_rgb_samples: bool = False) -> Dict[str, jnp.ndarray]:
    """Raw per-sample field queries for volume export — uniform sampler with
    stratified noise, AABB normalisation instead of contraction
    (``setup_inference`` + get_export_outputs, fruit_nerf.py:185-189,476-494).

    Returns per-sample arrays [R, S(, C)]: density, semantics, positions,
    and optionally rgb.
    """
    samples = pdf_ops.sample_uniform_with_noise(key, ray_bundle, num_samples)
    pos = samples.positions
    density, geo = field_density(params["field"], pos, cfg.field,
                                 aabb=aabb)
    semantics = field_semantics(params["field"], geo, cfg.field,
                                pass_gradients=True)
    out = {
        "density": density,
        "semantics": semantics[..., 0],
        "point_location": pos,
    }
    if render_rgb_samples:
        out["rgb"] = field_rgb(params["field"], geo, samples.directions,
                               samples.camera_idx, cfg.field, train=False)
    return out


def forward_accumulation(params: Dict, ray_bundle: RayBundle, cfg: ModelConfig,
                         ) -> jnp.ndarray:
    """Accumulated density weight per ray (visibility/occlusion test for the
    projection stage, ≙ get_density_for_camera_ray_bundle fruit_nerf.py:320-344).
    Returns [R] accumulated weights."""
    samples, _, _ = _proposal_sampling(params, ray_bundle, cfg, None, False, 1.0)
    density, _ = field_density(params["field"], samples.positions, cfg.field)
    weights = render_ops.render_weights(density, samples.deltas)
    acc = jnp.sum(weights, axis=-1)
    if ray_bundle.mask is not None:
        acc = acc * ray_bundle.mask
    return acc
