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
    x = unit * 2.0 - 1.0
    if cfg.mlp_impl == "pallas-fused":
        # one kernel: PE encode + base MLP + skip + top MLP, all VMEM-
        # resident (ops/pallas/fused_pe_field.py) — no [N, 63..319] HBM
        # intermediates.  Falls back to an equivalent jnp path off-TPU.
        from ..ops.pallas.fused_pe_field import (fused_pe_density,
                                                 pe_selector_matrix)
        s = jnp.asarray(pe_selector_matrix(POS_FREQS))
        base, top = params["mlp_base"], params["mlp_top"]
        base_wbs = []
        for w, b in zip(base["w"], base["b"]):
            base_wbs += [w, b.reshape(1, -1)]
        top_wbs = []
        for w, b in zip(top["w"], top["b"]):
            top_wbs += [w, b.reshape(1, -1)]
        flat = x.reshape(-1, 3)
        h = fused_pe_density(flat, s, base_wbs, top_wbs, POS_FREQS,
                             cfg.fused_tile, False, 3,
                             min(cfg.fused_tile_bwd, 512))
        h = h.reshape(*x.shape[:-1], h.shape[-1])
    else:
        enc = nerf_encoding(x, POS_FREQS)
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


def _appearance_rows(params: Dict, camera_idx: jnp.ndarray, cfg: FieldConfig,
                     train: bool) -> jnp.ndarray | None:
    if not cfg.appearance_embedding_dim:
        return None
    app_table = params["appearance"]
    if train:
        return app_table[camera_idx]
    if cfg.use_average_appearance_embedding:
        return jnp.broadcast_to(jnp.mean(app_table, axis=0),
                                (camera_idx.shape[0], app_table.shape[1]))
    return jnp.zeros((camera_idx.shape[0], app_table.shape[1]))


def vanilla_field_all(params: Dict, positions: jnp.ndarray,
                      directions: jnp.ndarray, camera_idx: jnp.ndarray,
                      cfg: FieldConfig, train: bool,
                      pass_sem_grads: bool = False,
                      aabb: jnp.ndarray | None = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(density, rgb, semantic logits) in one pass.

    With ``mlp_impl="pallas-fused"`` on TPU this is ONE kernel (PE encode +
    trunk + colour head + semantic head, ops/pallas/fused_pe_field.py
    ``fused_pe_nerf``): geo features never touch HBM and the colour concat
    never exists.  Otherwise composes the three split functions — identical
    math either way (≙ tcnn's fused field pipeline, fruit_field.py:125-167).
    """
    if cfg.mlp_impl != "pallas-fused":
        density, geo = vanilla_field_density(params, positions, cfg, aabb)
        rgb = vanilla_field_rgb(params, geo, directions, camera_idx, cfg,
                                train)
        sem = vanilla_field_semantics(params, geo, cfg, pass_sem_grads)
        return density, rgb, sem

    from ..ops.pallas.fused_pe_field import fused_pe_nerf, pe_selector_matrix
    if cfg.use_contraction:
        unit = spatial.contracted_to_unit(positions)
    else:
        assert aabb is not None
        unit = spatial.aabb_to_unit(positions, aabb)
    selector = spatial.unit_selector(unit)
    unit = unit * selector[..., None]
    x = unit * 2.0 - 1.0
    batch_shape = x.shape[:-1]

    # per-ray colour-head extras (direction encoding ‖ appearance rows),
    # pre-broadcast over samples — the kernel's one O(N·De) input
    enc_d = nerf_encoding(directions, DIR_FREQS)
    app = _appearance_rows(params, camera_idx, cfg, train)
    ray_extras = (jnp.concatenate([enc_d, app], axis=-1)
                  if app is not None else enc_d)
    extras = jnp.broadcast_to(ray_extras[..., None, :],
                              batch_shape + (ray_extras.shape[-1],))

    G = cfg.geo_feat_dim
    base, top = params["mlp_base"], params["mlp_top"]
    base_wbs, top_wbs = [], []
    for w, b in zip(base["w"], base["b"]):
        base_wbs += [w, b.reshape(1, -1)]
    for w, b in zip(top["w"], top["b"]):
        top_wbs += [w, b.reshape(1, -1)]
    color, semp = params["mlp_color"], params["mlp_semantic"]
    # head layer-0 weights: zero-pad a top row so the kernel contracts the
    # full trunk output [density_raw | geo] (jnp.pad autodiff slices back)
    wc0 = color["w"][0]
    color_wbs = [jnp.pad(wc0[:G], ((1, 0), (0, 0))), wc0[G:],
                 color["b"][0].reshape(1, -1)]
    for w, b in zip(color["w"][1:], color["b"][1:]):
        color_wbs += [w, b.reshape(1, -1)]
    sem_wbs = [jnp.pad(semp["w"][0], ((1, 0), (0, 0))),
               semp["b"][0].reshape(1, -1)]
    for w, b in zip(semp["w"][1:], semp["b"][1:]):
        sem_wbs += [w, b.reshape(1, -1)]

    s = jnp.asarray(pe_selector_matrix(POS_FREQS))
    t, rgb_raw, sem_raw = fused_pe_nerf(
        x.reshape(-1, 3), extras.reshape(-1, extras.shape[-1]), s,
        base_wbs, top_wbs, color_wbs, sem_wbs, POS_FREQS, pass_sem_grads,
        cfg.fused_tile, False, 3, cfg.fused_tile_bwd)
    t = t.reshape(*batch_shape, t.shape[-1])
    density = trunc_exp(t[..., 0]) * selector
    rgb = jax.nn.sigmoid(rgb_raw).reshape(*batch_shape, rgb_raw.shape[-1])
    sem = sem_raw.reshape(*batch_shape, sem_raw.shape[-1])
    return density, rgb, sem
