"""Proposal density fields: small hash grid + tiny MLP → density.

Equivalent of nerfstudio ``HashMLPDensityField`` as configured at
/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:118-142 (two nets, 5
levels, 2^17 table, max_res 128/256, hidden 16).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core import spatial
from ..ops.activations import trunc_exp
from ..ops.hashgrid import (hashgrid_encode, hashgrid_init,
                            hashgrid_init_packed, level_resolutions)
from ..ops.mlp import mlp_apply, mlp_init
from .config import ProposalFieldConfig


def proposal_init(key: jax.Array, cfg: ProposalFieldConfig) -> Dict:
    k_grid, k_mlp = jax.random.split(key)
    num_layers = 1 if cfg.use_linear else cfg.num_layers
    if cfg.field_type == "pe":
        # gather-free PE-MLP density net (MXU-only; TPU-native flagship)
        pe_dim = 3 * (2 * cfg.pe_freqs + 1)
        return {"mlp": mlp_init(k_mlp, pe_dim, cfg.hidden_dim, 1,
                                max(num_layers, 2))}
    g = cfg.grid
    grid_dim = g.num_levels * g.features_per_level
    res = level_resolutions(g.num_levels, g.min_res, g.max_res)
    grid = (hashgrid_init_packed(k_grid, res, g.features_per_level,
                                 g.log2_hashmap_size)
            if g.layout == "packed"
            else hashgrid_init(k_grid, g.num_levels, g.features_per_level,
                               g.log2_hashmap_size))
    return {
        "grid": grid,
        "mlp": mlp_init(k_mlp, grid_dim, cfg.hidden_dim, 1, num_layers),
    }


def proposal_density(params: Dict, positions: jnp.ndarray,
                     cfg: ProposalFieldConfig, use_contraction: bool = True,
                     aabb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """positions [..., 3] world → density [...]."""
    if use_contraction:
        unit = spatial.contracted_to_unit(positions)
    else:
        assert aabb is not None
        unit = spatial.aabb_to_unit(positions, aabb)
    selector = spatial.unit_selector(unit)
    unit = unit * selector[..., None]
    if cfg.field_type == "pe":
        x = unit * 2.0 - 1.0
        if cfg.mlp_impl == "pallas-fused":
            # one kernel: encode + MLP (ops/pallas/fused_pe_field.py).  The
            # narrow net makes VMEM use tiny → large tile amortises grid
            # overhead (the reason the split fused-MLP kernel lost here)
            from ..ops.pallas.fused_pe_field import (fused_pe_mlp,
                                                     pe_selector_matrix)
            s = jnp.asarray(pe_selector_matrix(cfg.pe_freqs))
            wbs = []
            for w, b in zip(params["mlp"]["w"], params["mlp"]["b"]):
                wbs += [w, b.reshape(1, -1)]
            h = fused_pe_mlp(x.reshape(-1, 3), s, wbs, cfg.pe_freqs)
            h = h.reshape(*x.shape[:-1], h.shape[-1])
        else:
            from ..ops.posenc import nerf_encoding
            enc = nerf_encoding(x, cfg.pe_freqs)
            h = mlp_apply(params["mlp"], enc, impl=cfg.mlp_impl)
        return trunc_exp(h[..., 0]) * selector
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
    h = mlp_apply(params["mlp"], feats, impl=cfg.mlp_impl)
    return trunc_exp(h[..., 0]) * selector
