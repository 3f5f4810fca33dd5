"""All presets construct, initialise, and run a (tiny-batch) forward."""
import jax
import jax.numpy as jnp
import pytest

from cropnerf_tpu.core.cameras import near_far_collider
from cropnerf_tpu.core.rays import RayBundle
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.models.model import forward, model_init


def tiny_bundle(R=4):
    dirs = jax.random.normal(jax.random.PRNGKey(0), (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((R, 3)) + jnp.array([0.0, 0, 1.5]),
                   directions=dirs, nears=jnp.zeros((R,)),
                   fars=jnp.ones((R,)),
                   camera_idx=jnp.zeros((R,), jnp.int32))
    return near_far_collider(rb, 0.05, 1000.0)


@pytest.mark.parametrize("name", list(PRESETS))
def test_preset_constructs_and_forwards(name):
    cfg = PRESETS[name]
    params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
    out = forward(params, tiny_bundle(), cfg.model,
                  key=jax.random.PRNGKey(1), train=True)
    assert out["rgb"].shape == (4, 3)
    assert out["semantics"].shape == (4, cfg.model.field.num_semantic_classes)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    assert len(out["weights_list"]) == cfg.model.num_proposal_iterations + 1


def test_preset_hyperparams_match_reference():
    """Spot-check the headline numbers against fruit_nerf_config.py."""
    base = PRESETS["cropnerf"]
    assert base.max_num_iterations == 40_000
    assert base.train_num_rays_per_batch == 4096
    assert base.model.num_nerf_samples_per_ray == 48
    assert base.model.num_proposal_samples_per_ray == (256, 96)
    assert base.model.field.grid.log2_hashmap_size == 19
    assert base.model.field.grid.max_res == 2048
    assert base.learning_rate == 1e-2 and base.adam_eps == 1e-15

    big = PRESETS["cropnerf-big"]
    assert big.max_num_iterations == 100_000
    assert big.train_num_rays_per_batch == 8192
    assert big.model.num_nerf_samples_per_ray == 128
    assert big.model.num_proposal_samples_per_ray == (512, 256)
    assert big.model.field.grid.log2_hashmap_size == 21
    assert big.model.field.grid.max_res == 4096
    assert big.model.field.hidden_dim == 128
    assert big.model.field.geo_feat_dim == 30

    huge = PRESETS["cropnerf-huge"]
    assert huge.train_num_rays_per_batch == 16384
    assert huge.model.num_proposal_samples_per_ray == (512, 512)
    assert huge.model.field.grid.max_res == 8192
    assert huge.model.field.hidden_dim == 256


class TestConfigRoundtrip:
    @pytest.mark.parametrize("name", list(PRESETS))
    def test_asdict_roundtrip(self, name):
        import dataclasses
        import json
        from cropnerf_tpu.models.config import train_config_from_dict
        cfg = PRESETS[name]
        d = json.loads(json.dumps(dataclasses.asdict(cfg)))
        cfg2 = train_config_from_dict(d)
        assert cfg2 == cfg


def test_mxu_tier_presets_mirror_reference_ladder():
    """The TPU-native mxu family carries the fruit_nerf_big/_huge scale
    ladder (rays, samples, head widths, anneal; fruit_nerf_config.py:68-172)
    with gather-free PE fields; fused-kernel tiles must divide the
    2^20-sample batches."""
    for name, rays, nerf_s, prop_s in (
            ("cropnerf-mxu-big", 8192, 128, (512, 256)),
            ("cropnerf-mxu-huge", 16384, 64, (512, 512))):
        cfg = PRESETS[name]
        m = cfg.model
        assert cfg.train_num_rays_per_batch == rays
        assert m.num_nerf_samples_per_ray == nerf_s
        assert m.num_proposal_samples_per_ray == prop_s
        assert cfg.max_num_iterations == 100_000
        assert m.proposal_weights_anneal_max_num_iters == 5000
        assert m.field.field_type == "vanilla"
        assert all(p.field_type == "pe" for p in m.proposal_fields)
        n = rays * nerf_s
        assert n % m.field.fused_tile == 0
        assert n % m.field.fused_tile_bwd == 0
    assert PRESETS["cropnerf-mxu-big"].model.field.geo_feat_dim == 30
    assert PRESETS["cropnerf-mxu-huge"].model.field.hidden_dim_color == 256
    assert PRESETS["cropnerf-mxu-huge"].camera_opt_optimizer == "radam"


def test_mxu_quality_preset_is_flagship_with_3x128_props():
    """cropnerf-mxu-q == the flagship with the measured 3x128 prop arm
    (benchmarks/ab_propshape.py): everything else must stay identical so
    the A/B numbers keep describing the preset."""
    import dataclasses
    base = PRESETS["cropnerf-mxu"]
    q = PRESETS["cropnerf-mxu-q"]
    for p in q.model.proposal_fields:
        assert p.field_type == "pe"
        assert p.hidden_dim == 128 and p.num_layers == 3
    assert tuple(p.pe_freqs for p in q.model.proposal_fields) == \
        tuple(p.pe_freqs for p in base.model.proposal_fields)
    # same model apart from the prop shape, same optimizer regime
    norm = dataclasses.replace(
        q, model=dataclasses.replace(
            q.model, proposal_fields=base.model.proposal_fields))
    assert norm == base
