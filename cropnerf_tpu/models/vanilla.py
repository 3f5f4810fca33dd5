"""Vanilla (positional-encoding MLP) semantic NeRF field.

Equivalent of the reference's legacy ``SemanticNeRFField``
(/root/reference/crop_nerf/fruit_nerf/fruit_field.py:311-411): frequency
encodings for position (10) and direction (4), an 8x256 base MLP with a skip
connection, density + feature heads, a direction-conditioned RGB head and a
semantic head.  Useful as a hash-grid-free baseline and for parity with the
reference's second field family.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import spatial
from ..ops.activations import trunc_exp
from ..ops.mlp import mlp_apply, mlp_init
from ..ops.posenc import nerf_encoding
from .config import FieldConfig


POS_FREQS = 10
DIR_FREQS = 4


def vanilla_field_init(key: jax.Array, cfg: FieldConfig,
                       num_images: int) -> Dict:
    k_base, k_top, k_color, k_sem, k_app = jax.random.split(key, 5)
    pos_dim = 3 * (2 * POS_FREQS + 1)
    dir_dim = 3 * (2 * DIR_FREQS + 1)
    hidden = max(cfg.hidden_dim, 64)
    params = {
        # base MLP (first half, before the skip)
        "mlp_base": mlp_init(k_base, pos_dim, hidden, hidden, 4),
        # second half takes [h, posenc] (skip connection) → 1 + geo_feat
        "mlp_top": mlp_init(k_top, hidden + pos_dim, hidden,
                            1 + cfg.geo_feat_dim, 4),
        "mlp_color": mlp_init(
            k_color,
            cfg.geo_feat_dim + dir_dim + cfg.appearance_embedding_dim,
            cfg.hidden_dim_color, 3, 2),
        "mlp_semantic": mlp_init(k_sem, cfg.geo_feat_dim,
                                 cfg.hidden_dim_semantics,
                                 cfg.num_semantic_classes,
                                 cfg.num_layers_semantic),
    }
    if cfg.appearance_embedding_dim:
        # per-image appearance code (exposure/white-balance variation on
        # real captures) — same semantics as the hash field's embedding
        # (fruit_field.py:109, :251-261)
        params["appearance"] = jax.random.normal(
            k_app, (num_images, cfg.appearance_embedding_dim)) * 0.1
    return params


def vanilla_field_density(params: Dict, positions: jnp.ndarray,
                          cfg: FieldConfig,
                          aabb: jnp.ndarray | None = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if cfg.use_contraction:
        unit = spatial.contracted_to_unit(positions)
    else:
        assert aabb is not None
        unit = spatial.aabb_to_unit(positions, aabb)
    selector = spatial.unit_selector(unit)
    unit = unit * selector[..., None]
    enc = nerf_encoding(unit * 2.0 - 1.0, POS_FREQS)
    h = mlp_apply(params["mlp_base"], enc, output_activation=jax.nn.relu,
                  impl=cfg.mlp_impl)
    h = mlp_apply(params["mlp_top"], jnp.concatenate([h, enc], axis=-1),
                  impl=cfg.mlp_impl)
    density = trunc_exp(h[..., 0]) * selector
    return density, h[..., 1:]


def vanilla_field_rgb(params: Dict, geo: jnp.ndarray,
                      directions: jnp.ndarray, camera_idx: jnp.ndarray,
                      cfg: FieldConfig, train: bool) -> jnp.ndarray:
    enc = nerf_encoding(directions, DIR_FREQS)
    enc = jnp.broadcast_to(enc[..., None, :],
                           geo.shape[:-1] + (enc.shape[-1],))
    parts = [geo, enc]
    if cfg.appearance_embedding_dim:
        app_table = params["appearance"]
        if train:
            app = app_table[camera_idx]
        elif cfg.use_average_appearance_embedding:
            app = jnp.broadcast_to(jnp.mean(app_table, axis=0),
                                   (camera_idx.shape[0], app_table.shape[1]))
        else:
            app = jnp.zeros((camera_idx.shape[0], app_table.shape[1]))
        parts.append(jnp.broadcast_to(app[..., None, :],
                                      geo.shape[:-1] + (app.shape[-1],)))
    h = jnp.concatenate(parts, axis=-1)
    return mlp_apply(params["mlp_color"], h, output_activation=jax.nn.sigmoid,
                     impl=cfg.mlp_impl)


def vanilla_field_semantics(params: Dict, geo: jnp.ndarray, cfg: FieldConfig,
                            pass_gradients: bool = False) -> jnp.ndarray:
    if not pass_gradients:
        geo = jax.lax.stop_gradient(geo)
    return mlp_apply(params["mlp_semantic"], geo, impl=cfg.mlp_impl)
