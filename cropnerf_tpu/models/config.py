"""Typed model/config tree with named presets.

Equivalent of the reference's dataclass config tree + ``MethodSpecification``
presets (/root/reference/crop_nerf/fruit_nerf/fruit_nerf_config.py:29-172 and
``FruitNerfModelConfig`` at fruit_nerf.py:59-68).  Static Python dataclasses
(hashable, compile-time constants) — the jitted step closes over them, so
field counts/sample counts are baked into the XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    min_res: int = 16
    max_res: int = 2048
    # "xla" (default; gathers at roofline on v5e) or "pallas" (fused
    # VMEM-resident kernel, ops/pallas/hash_encode.py)
    impl: str = "xla"
    # "packed" (tcnn parity: dense coarse levels allocate exactly (res+1)^3
    # rows — the base field table shrinks 16.8M → 12.2M params, cutting
    # optimizer/scatter HBM traffic ~27%) or "dense" ([L, T, F]; required
    # by impl="pallas")
    layout: str = "packed"
    # route dense (collision-free) levels through the cell-packed view:
    # one wide [8F] row gather/scatter per sample instead of 8 narrow
    # gathers + 8F flat scatter elements — v5e random HBM access costs
    # ~6-8 ns per ROW regardless of width (ops/hashgrid.py _dense_cell_view).
    # Measured 2256 → 1390 ms/step (1.62x) on the base hash preset
    # (benchmarks/ab_cellpack.py, v5e 2026-08-20); value/grad-identical
    # (tests/test_ops.py TestCellPack)
    cell_pack: bool = True


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """CropField = hash grid + base/semantic/color MLPs + appearance embedding
    (fruit_field.py:44-302 defaults).  ``field_type="vanilla"`` selects the
    positional-encoding MLP variant (≙ SemanticNeRFField,
    fruit_field.py:311-411)."""
    field_type: str = "hash"            # "hash" | "vanilla"
    grid: HashGridConfig = HashGridConfig()
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_semantic: int = 2
    hidden_dim_semantics: int = 64
    num_semantic_classes: int = 1
    # "xla" (each layer one MXU matmul, XLA-fused), "pallas" (fully-fused
    # MLP kernel, activations resident in VMEM — ops/pallas/fused_mlp.py),
    # or "pallas-fused" (vanilla field only: PE encode + base + skip + top
    # in ONE kernel, ops/pallas/fused_pe_field.py; heads use the plain
    # fused kernel).  A/B'd on v5e in benchmarks/README.md
    mlp_impl: str = "xla"
    # row-tile sizes for the fused PE-field kernels (mlp_impl="pallas-fused"):
    # forward tile and the (smaller) recompute-backward tile, both bounded by
    # the 16 MB scoped-vmem stack limit (see ops/pallas/fused_pe_field.py;
    # A/B'd on v5e in benchmarks/README.md)
    fused_tile: int = 1024
    fused_tile_bwd: int = 768
    appearance_embedding_dim: int = 32
    use_average_appearance_embedding: bool = True
    sh_levels: int = 4
    use_contraction: bool = True


@dataclasses.dataclass(frozen=True)
class ProposalFieldConfig:
    """HashMLPDensityField args (nerfacto proposal_net_args_list defaults,
    inherited by the base preset; big/huge override, fruit_nerf_config.py:90-97,147-155).

    ``field_type="pe"`` swaps the hash grid for a positional-encoding MLP
    density net — gather-free, all MXU matmuls (the TPU-native choice; v5e
    random-access gathers cost ~7 ns/row, see ops/hashgrid.py)."""
    field_type: str = "hash"            # "hash" | "pe"
    grid: HashGridConfig = HashGridConfig(num_levels=5, log2_hashmap_size=17,
                                          max_res=128)
    hidden_dim: int = 16
    num_layers: int = 2
    use_linear: bool = False
    pe_freqs: int = 5
    # "xla" or "pallas" (fused VMEM-resident MLP) — the proposal nets see
    # 5x more samples than the final field (256+96 vs 48 per ray), so the
    # narrow density MLP is HBM-bound under XLA; see benchmarks/README.md
    mlp_impl: str = "xla"


@dataclasses.dataclass(frozen=True)
class CameraOptConfig:
    mode: str = "SO3xR3"           # "off" | "SO3xR3"
    trans_l2_penalty: float = 1e-2
    rot_l2_penalty: float = 1e-3


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """FruitNerfModelConfig equivalent (fruit_nerf.py:59-68 + nerfacto
    defaults it inherits)."""
    field: FieldConfig = FieldConfig()
    proposal_fields: Tuple[ProposalFieldConfig, ...] = (
        ProposalFieldConfig(grid=HashGridConfig(num_levels=5, log2_hashmap_size=17, max_res=128)),
        ProposalFieldConfig(grid=HashGridConfig(num_levels=5, log2_hashmap_size=17, max_res=256)),
    )
    num_nerf_samples_per_ray: int = 48
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    use_single_jitter: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    # skip the proposal-net backward on non-update steps via lax.cond
    # (≙ nerfstudio's no_grad between update steps, fruit_nerf.py:144-149);
    # gradient-identical to gating the interlevel loss, cheaper
    proposal_no_grad_schedule: bool = True
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    semantic_loss_weight: float = 1.0
    pass_semantic_gradients: bool = False
    # nerfacto's near-camera floater fix ("Floaters No More"): scale field-
    # output gradients by clamp(t², 0, 1); off by default like the reference
    # (fruit_nerf.py:432-434 behind config.use_gradient_scaling)
    use_gradient_scaling: bool = False
    camera_opt: CameraOptConfig = CameraOptConfig()
    # rematerialise per-sample field evals in the backward pass: the hash
    # gathers are recomputed instead of stored, cutting peak HBM by ~10x at
    # large ray batches (jax.checkpoint; the TPU analogue of not caching
    # tcnn's forward activations)
    remat: bool = True
    # remat ONLY the proposal density nets (independent of ``remat``): the
    # prop nets see 5x more samples than the field, so storing their
    # [N, enc..hidden] residuals for backward is HBM-traffic-bound while the
    # recompute is cheap MXU work — measured on v5e (benchmarks/README.md)
    remat_props: bool = False

    @property
    def num_proposal_iterations(self) -> int:
        return len(self.num_proposal_samples_per_ray)


# ---------------------------------------------------------------------------
# Named presets (≙ MethodSpecifications fruit_nerf / _big / _huge,
# fruit_nerf_config.py:29-172)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = ModelConfig()
    max_num_iterations: int = 40_000
    train_num_rays_per_batch: int = 4096
    eval_num_rays_per_batch: int = 4096
    eval_num_rays_per_chunk: int = 1 << 15
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 500
    # full-eval pass over every eval image (≙ get_average_eval_image_metrics
    # cadence, nerfstudio steps_per_eval_all_images default; also runs at
    # train end, fruit_pipeline.py:178-229)
    steps_per_eval_all_images: int = 25_000
    steps_per_save: int = 2000
    # optimizer (fruit_nerf_config.py:45-60; big/huge :100-114,158-166)
    optimizer: str = "adam"                 # "adam" | "radam"
    learning_rate: float = 1e-2             # "fields" group
    adam_eps: float = 1e-15
    lr_final: Optional[float] = 1e-4        # None → constant lr
    lr_decay_max_steps: int = 200_000
    prop_learning_rate: float = 1e-2        # "proposal_networks" group
    prop_lr_final: Optional[float] = 1e-4
    prop_lr_decay_max_steps: int = 200_000
    camera_opt_optimizer: str = "adam"      # huge uses radam (:133-137)
    camera_opt_lr: float = 1e-3
    camera_opt_eps: float = 1e-15
    camera_opt_weight_decay: float = 0.0
    camera_opt_lr_final: Optional[float] = 1e-4
    camera_opt_decay_steps: int = 5000
    seed: int = 42


def _big_model() -> ModelConfig:
    return ModelConfig(
        field=FieldConfig(
            grid=HashGridConfig(log2_hashmap_size=21, max_res=4096),
            hidden_dim=128, hidden_dim_color=128, hidden_dim_semantics=128,
            num_layers_semantic=3, appearance_embedding_dim=128,
            geo_feat_dim=30),
        proposal_fields=(
            ProposalFieldConfig(grid=HashGridConfig(num_levels=5, log2_hashmap_size=17, max_res=128)),
            ProposalFieldConfig(grid=HashGridConfig(num_levels=5, log2_hashmap_size=17, max_res=256)),
        ),
        num_nerf_samples_per_ray=128,
        num_proposal_samples_per_ray=(512, 256),
        proposal_weights_anneal_max_num_iters=5000,
    )


def _huge_model() -> ModelConfig:
    return ModelConfig(
        field=FieldConfig(
            grid=HashGridConfig(log2_hashmap_size=21, max_res=8192),
            hidden_dim=256, hidden_dim_color=256, hidden_dim_semantics=128,
            num_layers_semantic=3, geo_feat_dim=30),
        proposal_fields=(
            ProposalFieldConfig(grid=HashGridConfig(num_levels=5, log2_hashmap_size=17, max_res=512),
                                hidden_dim=16),
            ProposalFieldConfig(grid=HashGridConfig(num_levels=7, log2_hashmap_size=17, max_res=2048),
                                hidden_dim=16),
        ),
        num_nerf_samples_per_ray=64,
        num_proposal_samples_per_ray=(512, 512),
        proposal_weights_anneal_max_num_iters=5000,
    )


def model_config_from_dict(d: dict) -> ModelConfig:
    """Rebuild a ModelConfig from ``dataclasses.asdict`` output (checkpoint
    run_config.json round-trip)."""
    return ModelConfig(
        field=FieldConfig(**{**d["field"],
                             "grid": HashGridConfig(**d["field"]["grid"])}),
        proposal_fields=tuple(
            ProposalFieldConfig(**{**p, "grid": HashGridConfig(**p["grid"])})
            for p in d["proposal_fields"]),
        camera_opt=CameraOptConfig(**d["camera_opt"]),
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in d.items()
           if k not in ("field", "proposal_fields", "camera_opt")})


def train_config_from_dict(d: dict) -> "TrainConfig":
    """Rebuild a TrainConfig from ``dataclasses.asdict`` output."""
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        kwargs[k] = model_config_from_dict(v) if k == "model" else v
    return TrainConfig(**kwargs)


PRESETS = {
    # ≙ fruit_nerf (fruit_nerf_config.py:29-65).  remat off: at 4096 rays ×
    # ~400 samples the stored activations fit HBM comfortably; with remat
    # the backward would redo the hash gathers, which dominate this preset
    # on v5e (benchmarks/README.md "random-access wall").
    "cropnerf": TrainConfig(model=ModelConfig(remat=False)),
    # ≙ fruit_nerf_big (:68-119): RAdam, prop nets at constant lr
    # (scheduler=None, :101-103), fields decay to 1e-4 over 50k (:104-106)
    "cropnerf-big": TrainConfig(
        model=_big_model(), max_num_iterations=100_000,
        train_num_rays_per_batch=8192, eval_num_rays_per_batch=4096,
        optimizer="radam", lr_decay_max_steps=50_000, prop_lr_final=None),
    # ≙ fruit_nerf_huge (:121-172): as big, plus RAdam camera-opt with
    # weight decay (fruit_nerf_config.py:133-137)
    "cropnerf-huge": TrainConfig(
        model=_huge_model(), max_num_iterations=100_000,
        train_num_rays_per_batch=16384, eval_num_rays_per_batch=4096,
        optimizer="radam", lr_decay_max_steps=50_000, prop_lr_final=None,
        camera_opt_optimizer="radam", camera_opt_lr=6e-4,
        camera_opt_eps=1e-8, camera_opt_weight_decay=1e-3,
        camera_opt_lr_final=6e-5, camera_opt_decay_steps=50_000),
    # ≙ the legacy positional-encoding SemanticNeRFField variant
    # (fruit_field.py:311-411, FruitModelMLP stub fruit_nerf.py:705-706)
    "semantic-nerf": TrainConfig(
        model=ModelConfig(field=FieldConfig(field_type="vanilla"))),
    # TPU-native flagship: gather-free MXU field.  v5e has no vectorized
    # gather (random HBM access ≈ 7 ns/row; the base hash preset's 166M
    # accesses/step floor at ~1 s/step, benchmarks/README.md), so the
    # performance preset replaces hash tables with positional-encoding
    # MLPs end-to-end — every FLOP a dense matmul the MXU tiles.  Same
    # sampling, renderer, losses, heads, and pipeline as `cropnerf`.
    # mlp_impl="pallas-fused": ONE kernel for PE encode + trunk + colour +
    # semantic heads (ops/pallas/fused_pe_field.py) — full-step A/B on v5e
    # 2026-08-19: 21.5 ms (pallas-fused) vs 24.5 (split pallas kernels) vs
    # 33.1 (XLA).  Falls back to an equivalent jnp path off-TPU.
    "cropnerf-mxu": TrainConfig(
        model=ModelConfig(
            field=FieldConfig(field_type="vanilla", hidden_dim=256,
                              geo_feat_dim=15, hidden_dim_color=64,
                              hidden_dim_semantics=64,
                              mlp_impl="pallas-fused"),
            proposal_fields=(
                ProposalFieldConfig(field_type="pe", hidden_dim=64,
                                    num_layers=3, pe_freqs=5),
                ProposalFieldConfig(field_type="pe", hidden_dim=64,
                                    num_layers=3, pe_freqs=6),
            ),
            # measured on v5e (benchmarks/profile_components.py): the
            # lax.cond dispatch costs ~0.7 ms/step MORE than the PE prop-net
            # backward it skips — worthwhile only for hash prop nets
            proposal_no_grad_schedule=False,
            remat=False,
        ),
        # PE-MLP stability: the hash presets' Adam(1e-2, eps 1e-15) diverges
        # on deep PE MLPs (measured on-chip); mip-NeRF-class settings
        learning_rate=1e-3, lr_final=1e-5, lr_decay_max_steps=50_000,
        prop_learning_rate=1e-3, prop_lr_final=1e-5,
        prop_lr_decay_max_steps=50_000, adam_eps=1e-8),
    # Opt-in quality tier of the flagship: MXU-tile-aligned 3x128 prop
    # nets (two 128-wide hidden layers, full MXU tile occupancy vs the
    # half-tile 64-wide shipped shape).  Measured on v5e
    # (benchmarks/ab_propshape.py, 2026-08-21, sphere fixture):
    # +2.3 dB PSNR @1000 steps (26.12 vs 23.84) at +26% step time
    # (25.0 vs 20.4 ms; 164 k rays/s).  NOT the default: the cheaper
    # 2x128 shape regressed 2.0 dB on the textured orchard scene, so the
    # shipped flagship stays at the reference-shaped 3x64; this tier is
    # for quality-bound runs that can spend the extra step time.
    "cropnerf-mxu-q": TrainConfig(
        model=ModelConfig(
            field=FieldConfig(field_type="vanilla", hidden_dim=256,
                              geo_feat_dim=15, hidden_dim_color=64,
                              hidden_dim_semantics=64,
                              mlp_impl="pallas-fused"),
            proposal_fields=(
                ProposalFieldConfig(field_type="pe", hidden_dim=128,
                                    num_layers=3, pe_freqs=5),
                ProposalFieldConfig(field_type="pe", hidden_dim=128,
                                    num_layers=3, pe_freqs=6),
            ),
            proposal_no_grad_schedule=False,
            remat=False,
        ),
        learning_rate=1e-3, lr_final=1e-5, lr_decay_max_steps=50_000,
        prop_learning_rate=1e-3, prop_lr_final=1e-5,
        prop_lr_decay_max_steps=50_000, adam_eps=1e-8),
    # TPU-native big/huge tiers: the fruit_nerf_big/_huge scale ladder
    # (fruit_nerf_config.py:68-172 — rays, samples, head widths, anneal,
    # camera-opt settings) applied to the gather-free mxu family.  The PE
    # trunk stays 8x256 (it replaces the hash TABLE, not the hash-MLP, so
    # the reference's hidden_dim ladder maps to the heads); prop PE freqs
    # step up with the tiers' max_res.  fused_tile_bwd=512: these batches
    # are 2^20 samples, which 768 does not divide.
    # Optimizer block DELIBERATELY follows the mxu flagship's PE-stability
    # regime (Adam 1e-3 / eps 1e-8), NOT cropnerf-big/-huge's RAdam ladder:
    # the reference's RAdam(1e-2, eps 1e-15) settings diverge on deep PE
    # MLPs (measured on-chip — see the flagship comment).  PSNR-parity runs
    # of mxu tiers vs hash tiers therefore compare field+optimizer regimes
    # as shipped, not the field swap in isolation.
    "cropnerf-mxu-big": TrainConfig(
        model=ModelConfig(
            field=FieldConfig(field_type="vanilla", hidden_dim=256,
                              geo_feat_dim=30, hidden_dim_color=128,
                              hidden_dim_semantics=128,
                              num_layers_semantic=3,
                              appearance_embedding_dim=128,
                              mlp_impl="pallas-fused", fused_tile_bwd=512),
            proposal_fields=(
                ProposalFieldConfig(field_type="pe", hidden_dim=64,
                                    num_layers=3, pe_freqs=6),
                ProposalFieldConfig(field_type="pe", hidden_dim=64,
                                    num_layers=3, pe_freqs=7),
            ),
            num_nerf_samples_per_ray=128,
            num_proposal_samples_per_ray=(512, 256),
            proposal_weights_anneal_max_num_iters=5000,
            proposal_no_grad_schedule=False, remat=False),
        max_num_iterations=100_000,
        train_num_rays_per_batch=8192, eval_num_rays_per_batch=4096,
        learning_rate=1e-3, lr_final=1e-5, lr_decay_max_steps=100_000,
        prop_learning_rate=1e-3, prop_lr_final=1e-5,
        prop_lr_decay_max_steps=100_000, adam_eps=1e-8),
    "cropnerf-mxu-huge": TrainConfig(
        model=ModelConfig(
            field=FieldConfig(field_type="vanilla", hidden_dim=256,
                              geo_feat_dim=30, hidden_dim_color=256,
                              hidden_dim_semantics=128,
                              num_layers_semantic=3,
                              mlp_impl="pallas-fused", fused_tile_bwd=512),
            proposal_fields=(
                ProposalFieldConfig(field_type="pe", hidden_dim=64,
                                    num_layers=3, pe_freqs=7),
                ProposalFieldConfig(field_type="pe", hidden_dim=64,
                                    num_layers=3, pe_freqs=8),
            ),
            num_nerf_samples_per_ray=64,
            num_proposal_samples_per_ray=(512, 512),
            proposal_weights_anneal_max_num_iters=5000,
            proposal_no_grad_schedule=False, remat=False),
        max_num_iterations=100_000,
        train_num_rays_per_batch=16384, eval_num_rays_per_batch=4096,
        learning_rate=1e-3, lr_final=1e-5, lr_decay_max_steps=100_000,
        prop_learning_rate=1e-3, prop_lr_final=1e-5,
        prop_lr_decay_max_steps=100_000, adam_eps=1e-8,
        camera_opt_optimizer="radam", camera_opt_lr=6e-4,
        camera_opt_eps=1e-8, camera_opt_weight_decay=1e-3,
        camera_opt_lr_final=6e-5, camera_opt_decay_steps=50_000),
    # tiny CPU-runnable preset for tests / CI (no reference analogue)
    "cropnerf-tiny": TrainConfig(
        model=ModelConfig(
            field=FieldConfig(grid=HashGridConfig(num_levels=4, log2_hashmap_size=12, max_res=64),
                              hidden_dim=16, hidden_dim_color=16,
                              hidden_dim_semantics=16, geo_feat_dim=7,
                              appearance_embedding_dim=4),
            proposal_fields=(
                ProposalFieldConfig(grid=HashGridConfig(num_levels=3, log2_hashmap_size=10, max_res=32),
                                    hidden_dim=8),
            ),
            num_nerf_samples_per_ray=16,
            num_proposal_samples_per_ray=(32,),
            proposal_weights_anneal_max_num_iters=50,
            remat=False,
        ),
        max_num_iterations=200, train_num_rays_per_batch=256,
        eval_num_rays_per_batch=256, eval_num_rays_per_chunk=1024),
}
