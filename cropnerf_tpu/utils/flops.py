"""Analytic matmul-FLOP accounting for the train step (MFU auditing).

Counts the model's matmul FLOPs per optimizer step from the config alone —
2·d_in·d_out per weight matrix per sample, encode selector-matmuls included,
elementwise work (activations, sin/cos, render weights, losses) excluded —
so ``bench.py`` can report TFLOP/s and MFU against the box's measured bf16
matmul peak (100.7 TFLOP/s on v5e, benchmarks/mfu_ceiling.py) and the
per-shape ceilings of the model's own skinny matmuls (SHAPE_CEILINGS).

Conventions (the standard MFU bookkeeping, e.g. PaLM appendix B):
  * backward = 2x forward for every matmul that receives gradients
    (dgrad + wgrad); optimizer/update FLOPs ignored.
  * *model* FLOPs, not *executed* FLOPs: rematerialised recomputes (the
    fused PE-field kernels' recompute backward, ``ModelConfig.remat``) are
    NOT counted — MFU measured this way understates hardware utilisation
    on remat paths, which is the honest direction.
  * with ``proposal_no_grad_schedule`` the proposal backward only runs
    every ``proposal_update_every`` steps; its backward FLOPs are
    amortised accordingly.
  * hash-grid table gathers are memory ops, not FLOPs; reported separately
    as ``table_rows_per_step`` (the v5e random-access wall is ~6-8 ns/row,
    ops/hashgrid.py).

Reference anchor: the reference never reports FLOPs/MFU at all (torch +
tcnn black boxes); SURVEY §6's north star "rays/s per chip at
speed-of-light" needs this denominator to be auditable.
"""
from __future__ import annotations

from typing import Dict, List

from ..models.config import FieldConfig, ProposalFieldConfig, TrainConfig

# measured on this box (benchmarks/mfu_ceiling.py, 2026-08-21): the
# realistic matmul ceiling, not the paper peak (v5e paper peak is
# 197 TFLOP/s bf16; an 8-deep 4096² relu-chain with the device-get sync
# protocol reaches 100.7 — the earlier 80 came from a single plain 4096³
# probe).  NOT the right roofline for the model's own skinny shapes: see
# SHAPE_CEILINGS below and the per-component rows in bench.py --breakdown.
MEASURED_BF16_PEAK_TFLOPS = 100.7

# per-shape XLA bf16 chain ceilings measured by benchmarks/mfu_ceiling.py
# on v5e (workload-shaped: N=196608 trunk rows, M=1048576 prop samples).
# The fused PE-field kernel EXCEEDS trunk256 (54.1 measured fwd+bwd,
# bench.py --breakdown) because it also absorbs the 63-wide input and
# narrow head layers that drag an unfused chain down.
SHAPE_CEILINGS_TFLOPS = {
    "square4096": 100.7,
    "trunk256": 43.6,        # [196608,256]@[256,256] relu chain
    "trunk_in63": 24.0,      # [196608,63]@[63,256] PE input layer
    "prop64": 12.6,          # [1M,33]@[33,64]→[64,64]→[64,1] (shipped)
    "prop128": 9.1,          # [1M,33]@[33,128]→[128,1] (A/B'd, killed)
}

_POS_FREQS = 10   # models/vanilla.py POS_FREQS
_DIR_FREQS = 4    # models/vanilla.py DIR_FREQS


def _mlp_dims(in_dim: int, hidden: int, out: int, n_layers: int) -> List[int]:
    """Mirror of ops/mlp.py ``mlp_init`` layer layout."""
    return [in_dim] + [hidden] * (n_layers - 1) + [out]


def _mlp_flops(dims: List[int]) -> int:
    """Forward matmul FLOPs per sample: 2·d_in·d_out per weight matrix."""
    return sum(2 * dims[i] * dims[i + 1] for i in range(len(dims) - 1))


def field_flops_per_sample(cfg: FieldConfig) -> int:
    """Forward matmul FLOPs per field sample (density+rgb+semantics)."""
    if cfg.field_type == "vanilla":
        pos_dim = 3 * (2 * _POS_FREQS + 1)
        dir_dim = 3 * (2 * _DIR_FREQS + 1)
        hidden = max(cfg.hidden_dim, 64)
        f = 2 * 3 * pos_dim                       # PE selector matmul
        f += _mlp_flops(_mlp_dims(pos_dim, hidden, hidden, 4))      # base
        f += _mlp_flops(_mlp_dims(hidden + pos_dim, hidden,
                                  1 + cfg.geo_feat_dim, 4))         # top
        f += _mlp_flops(_mlp_dims(
            cfg.geo_feat_dim + dir_dim + cfg.appearance_embedding_dim,
            cfg.hidden_dim_color, 3, 2))                            # color
        f += _mlp_flops(_mlp_dims(cfg.geo_feat_dim,
                                  cfg.hidden_dim_semantics,
                                  cfg.num_semantic_classes,
                                  cfg.num_layers_semantic))         # semantic
        return f
    # hash field (models/field.py field_init)
    grid_dim = cfg.grid.num_levels * cfg.grid.features_per_level
    color_in = (cfg.sh_levels ** 2 + cfg.geo_feat_dim
                + cfg.appearance_embedding_dim)
    f = _mlp_flops(_mlp_dims(grid_dim, cfg.hidden_dim,
                             1 + cfg.geo_feat_dim, cfg.num_layers))
    f += _mlp_flops(_mlp_dims(cfg.geo_feat_dim, cfg.hidden_dim_semantics,
                              cfg.hidden_dim_semantics,
                              cfg.num_layers_semantic))
    f += 2 * cfg.hidden_dim_semantics * cfg.num_semantic_classes  # sem head
    f += _mlp_flops(_mlp_dims(color_in, cfg.hidden_dim_color, 3,
                              cfg.num_layers_color))
    return f


def prop_flops_per_sample(cfg: ProposalFieldConfig) -> int:
    """Forward matmul FLOPs per proposal-net sample."""
    n_layers = 1 if cfg.use_linear else cfg.num_layers
    if cfg.field_type == "pe":
        pe_dim = 3 * (2 * cfg.pe_freqs + 1)
        return (2 * 3 * pe_dim
                + _mlp_flops(_mlp_dims(pe_dim, cfg.hidden_dim, 1,
                                       max(n_layers, 2))))
    grid_dim = cfg.grid.num_levels * cfg.grid.features_per_level
    return _mlp_flops(_mlp_dims(grid_dim, cfg.hidden_dim, 1, n_layers))


def train_step_flops(cfg: TrainConfig) -> Dict[str, float]:
    """Per-step matmul-FLOP breakdown for one optimizer step.

    Returns forward FLOPs per component, the fwd+bwd total
    (``model_flops_per_step``) and hash-table gather rows.
    """
    m = cfg.model
    R = cfg.train_num_rays_per_batch
    field_fwd = R * m.num_nerf_samples_per_ray * field_flops_per_sample(
        m.field)
    prop_fwd = sum(
        R * n * prop_flops_per_sample(p)
        for p, n in zip(m.proposal_fields, m.num_proposal_samples_per_ray))
    # backward multiplier: dgrad + wgrad = 2x fwd.  Proposal backward is
    # amortised when the no-grad schedule skips it between update steps
    # (models/model.py prop_update lax.cond).
    prop_bwd_mult = (2.0 / m.proposal_update_every
                     if m.proposal_no_grad_schedule else 2.0)
    total = field_fwd * 3.0 + prop_fwd * (1.0 + prop_bwd_mult)
    return {
        "field_fwd_flops": float(field_fwd),
        "prop_fwd_flops": float(prop_fwd),
        "fwd_flops": float(field_fwd + prop_fwd),
        "model_flops_per_step": float(total),
        "table_rows_per_step": float(_table_rows_per_step(cfg)),
    }


def _table_rows_per_step(cfg: TrainConfig) -> int:
    m = cfg.model
    R = cfg.train_num_rays_per_batch
    rows = 0
    if m.field.field_type == "hash":
        rows += (R * m.num_nerf_samples_per_ray
                 * m.field.grid.num_levels * 8)
    for p, n in zip(m.proposal_fields, m.num_proposal_samples_per_ray):
        if p.field_type == "hash":
            rows += R * n * p.grid.num_levels * 8
    return rows


def mfu(model_flops_per_step: float, step_seconds: float,
        peak_tflops: float = MEASURED_BF16_PEAK_TFLOPS) -> Dict[str, float]:
    """TFLOP/s and MFU for a measured step time."""
    tflops_per_s = model_flops_per_step / step_seconds / 1e12
    return {
        "tflops_per_s": tflops_per_s,
        "mfu_vs_measured_peak": tflops_per_s / peak_tflops,
    }


def _component_ceiling_tflops(hidden_dim: int) -> float:
    """Shape-specific ceiling for a component whose matmuls are
    ``hidden_dim`` wide; dims without a measured ceiling fall back to the
    square peak (a conservative over-estimate → a lower SOL fraction)."""
    if hidden_dim >= 256:
        return SHAPE_CEILINGS_TFLOPS["trunk256"]
    if hidden_dim == 128:
        return SHAPE_CEILINGS_TFLOPS["prop128"]
    if hidden_dim == 64:
        return SHAPE_CEILINGS_TFLOPS["prop64"]
    return SHAPE_CEILINGS_TFLOPS["square4096"]


def speed_of_light(cfg: TrainConfig) -> Dict[str, float]:
    """Per-shape roofline speed-of-light (SOL) step time.

    Each component's fwd+bwd matmul FLOPs divided by the measured XLA
    chain ceiling for its own matmul width (benchmarks/mfu_ceiling.py):
    the step time if every matmul ran at the best rate this hardware has
    demonstrated *for that shape*.  Elementwise and sampling work is
    excluded from the numerator, so ``measured_ms / sol_ms`` charges that
    time as inefficiency — a conservative utilization figure (and the
    fused field kernel has measured ABOVE its unfused chain ceiling, so
    fractions slightly over the per-component bound are possible).
    """
    fl = train_step_flops(cfg)
    field = 3.0 * fl["field_fwd_flops"]
    prop = fl["model_flops_per_step"] - field
    field_ceiling = _component_ceiling_tflops(cfg.model.field.hidden_dim)
    prop_dims = {p.hidden_dim for p in cfg.model.proposal_fields}
    prop_ceiling = min((_component_ceiling_tflops(d) for d in prop_dims),
                       default=SHAPE_CEILINGS_TFLOPS["square4096"])
    sol_s = (field / (field_ceiling * 1e12) + prop / (prop_ceiling * 1e12))
    return {
        "sol_ms": sol_s * 1e3,
        "field_ceiling_tflops": field_ceiling,
        "prop_ceiling_tflops": prop_ceiling,
    }
