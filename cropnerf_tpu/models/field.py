"""CropField: hash-grid NeRF field with density, colour, and semantic heads.

TPU-native re-design of ``FruitField``
(/root/reference/crop_nerf/fruit_nerf/fruit_field.py:44-302): pure functions
over a params pytree; tcnn's fused encodings/MLPs become jnp hash-grid
gathers + MXU matmuls (see ops/hashgrid.py, ops/mlp.py).

Structure (fruit_field.py line refs):
  * hash grid 16x2^19x2, max_res 2048 (:125-132)
  * base MLP [32 → 64 → 1 + geo_feat(15)] (:133-141), trunc_exp density (:192)
  * SH(levels=4) direction encoding (:116-119)
  * appearance Embedding(num_images, 32) (:109), mean at eval (:251-261)
  * semantic MLP on (detached) geo features + linear head → 1 logit (:145-157,264-269)
  * colour MLP [SH+geo+app → 64 → 64 → 3], sigmoid (:159-167)
  * L-inf scene contraction or AABB normalisation + out-of-box selector
    (:169-194)
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import spatial
from ..ops.activations import trunc_exp
from ..ops.hashgrid import (hashgrid_encode, hashgrid_init,
                            hashgrid_init_packed, level_resolutions)
from ..ops.mlp import mlp_apply, mlp_init
from ..ops.sh import sh_encoding
from .config import FieldConfig


def field_init(key: jax.Array, cfg: FieldConfig, num_images: int) -> Dict:
    if cfg.field_type == "vanilla":
        from .vanilla import vanilla_field_init
        return vanilla_field_init(key, cfg, num_images)
    k_grid, k_base, k_sem, k_head, k_color, k_app = jax.random.split(key, 6)
    g = cfg.grid
    grid_dim = g.num_levels * g.features_per_level
    color_in = cfg.sh_levels ** 2 + cfg.geo_feat_dim + cfg.appearance_embedding_dim
    res = level_resolutions(g.num_levels, g.min_res, g.max_res)
    grid = (hashgrid_init_packed(k_grid, res, g.features_per_level,
                                 g.log2_hashmap_size)
            if g.layout == "packed"
            else hashgrid_init(k_grid, g.num_levels, g.features_per_level,
                               g.log2_hashmap_size))
    return {
        "grid": grid,
        "mlp_base": mlp_init(k_base, grid_dim, cfg.hidden_dim,
                             1 + cfg.geo_feat_dim, cfg.num_layers),
        "mlp_semantic": mlp_init(k_sem, cfg.geo_feat_dim,
                                 cfg.hidden_dim_semantics,
                                 cfg.hidden_dim_semantics,
                                 cfg.num_layers_semantic),
        "semantic_head": mlp_init(k_head, cfg.hidden_dim_semantics, 0,
                                  cfg.num_semantic_classes, 1),
        "mlp_color": mlp_init(k_color, color_in, cfg.hidden_dim_color, 3,
                              cfg.num_layers_color),
        "appearance": jax.random.normal(
            k_app, (num_images, cfg.appearance_embedding_dim)) * 0.1,
    }


def field_density(params: Dict, positions: jnp.ndarray, cfg: FieldConfig,
                  aabb: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [..., 3] world → (density [...], geo_feat [..., G]).

    Contraction (train) or AABB normalisation (export, when ``setup_inference``
    nulls the distortion, fruit_nerf.py:185-189) + zero-density selector.
    """
    if cfg.field_type == "vanilla":
        from .vanilla import vanilla_field_density
        return vanilla_field_density(params, positions, cfg, aabb)
    if cfg.use_contraction:
        unit = spatial.contracted_to_unit(positions)
    else:
        assert aabb is not None
        unit = spatial.aabb_to_unit(positions, aabb)
    selector = spatial.unit_selector(unit)
    unit = unit * selector[..., None]

    res = level_resolutions(cfg.grid.num_levels, cfg.grid.min_res,
                            cfg.grid.max_res)
    if cfg.grid.impl == "pallas":
        assert params["grid"].ndim == 3, "impl='pallas' needs layout='dense'"
        from ..ops.pallas.hash_encode import hashgrid_encode_pallas
        feats = hashgrid_encode_pallas(params["grid"], unit, res)
    else:
        feats = hashgrid_encode(params["grid"], unit, res,
                                table_size=2 ** cfg.grid.log2_hashmap_size,
                                cell_pack=cfg.grid.cell_pack)
    h = mlp_apply(params["mlp_base"], feats, impl=cfg.mlp_impl)
    density_raw, geo = h[..., 0], h[..., 1:]
    density = trunc_exp(density_raw) * selector
    return density, geo


def field_semantics(params: Dict, geo: jnp.ndarray, cfg: FieldConfig,
                    pass_gradients: bool = False) -> jnp.ndarray:
    """Per-sample semantic logits [..., C] from geo features; detached from
    the density branch unless ``pass_semantic_gradients``
    (fruit_nerf.py:66, fruit_field.py:264-269)."""
    if cfg.field_type == "vanilla":
        from .vanilla import vanilla_field_semantics
        return vanilla_field_semantics(params, geo, cfg, pass_gradients)
    if not pass_gradients:
        geo = jax.lax.stop_gradient(geo)
    h = mlp_apply(params["mlp_semantic"], geo, impl=cfg.mlp_impl)
    return mlp_apply(params["semantic_head"], h)


def field_all(params: Dict, positions: jnp.ndarray, directions: jnp.ndarray,
              camera_idx: jnp.ndarray, cfg: FieldConfig, train: bool,
              pass_sem_grads: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(density, rgb, semantic logits) for one sample batch — the train-path
    field evaluation (≙ FruitField.forward's combined heads,
    fruit_field.py:271-302).  For the vanilla field with
    ``mlp_impl="pallas-fused"`` this is a single fused kernel; otherwise it
    composes the split functions."""
    if cfg.field_type == "vanilla":
        from .vanilla import vanilla_field_all
        return vanilla_field_all(params, positions, directions, camera_idx,
                                 cfg, train, pass_sem_grads)
    density, geo = field_density(params, positions, cfg)
    rgb = field_rgb(params, geo, directions, camera_idx, cfg, train)
    sem = field_semantics(params, geo, cfg, pass_sem_grads)
    return density, rgb, sem


def field_rgb(params: Dict, geo: jnp.ndarray, directions: jnp.ndarray,
              camera_idx: jnp.ndarray, cfg: FieldConfig,
              train: bool) -> jnp.ndarray:
    """Per-sample RGB [..., 3].

    directions: [R, 3] (broadcast over samples), camera_idx: [R].
    Appearance embedding: per-image row when training; mean embedding at eval
    (``use_average_appearance_embedding``) else zeros (fruit_field.py:251-261).
    """
    if cfg.field_type == "vanilla":
        from .vanilla import vanilla_field_rgb
        return vanilla_field_rgb(params, geo, directions, camera_idx, cfg,
                                 train)
    S = geo.shape[-2]
    sh = sh_encoding(directions, cfg.sh_levels)               # [R, 16]
    sh = jnp.broadcast_to(sh[..., None, :], geo.shape[:-1] + (sh.shape[-1],))

    app_table = params["appearance"]
    if train:
        app = app_table[camera_idx]                           # [R, A]
    elif cfg.use_average_appearance_embedding:
        app = jnp.broadcast_to(jnp.mean(app_table, axis=0),
                               (camera_idx.shape[0], app_table.shape[1]))
    else:
        app = jnp.zeros((camera_idx.shape[0], app_table.shape[1]))
    app = jnp.broadcast_to(app[..., None, :], geo.shape[:-1] + (app.shape[-1],))

    h = jnp.concatenate([sh, geo, app], axis=-1)
    return mlp_apply(params["mlp_color"], h,
                     output_activation=jax.nn.sigmoid, impl=cfg.mlp_impl)
