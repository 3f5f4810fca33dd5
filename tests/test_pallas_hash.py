"""Pallas hash-encode kernel vs the jnp reference (interpreter mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.ops.hashgrid import (hashgrid_encode, hashgrid_init,
                                       level_resolutions)
from cropnerf_tpu.ops.pallas.hash_encode import hashgrid_encode_pallas


class TestPallasHashEncode:
    def test_forward_matches_reference(self):
        table = hashgrid_init(jax.random.PRNGKey(0), 4, 2, 10)
        res = level_resolutions(4, 4, 32)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
        ref = hashgrid_encode(table, pos, res)
        out = hashgrid_encode_pallas(table, pos, res, 128, True)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_batched_shape(self):
        table = hashgrid_init(jax.random.PRNGKey(0), 2, 2, 8)
        res = level_resolutions(2, 4, 8)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 3))
        out = hashgrid_encode_pallas(table, pos, res, 128, True)
        assert out.shape == (16, 16, 4)

    def test_ragged_falls_back(self):
        table = hashgrid_init(jax.random.PRNGKey(0), 2, 2, 8)
        res = level_resolutions(2, 4, 8)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
        ref = hashgrid_encode(table, pos, res)
        out = hashgrid_encode_pallas(table, pos, res, 128, True)
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_gradients_match(self):
        table = hashgrid_init(jax.random.PRNGKey(0), 2, 2, 8)
        res = level_resolutions(2, 4, 8)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (128, 3)) * 0.9 + 0.05

        def loss_p(t, p):
            return jnp.sum(hashgrid_encode_pallas(t, p, res, 128, True) ** 2)

        def loss_r(t, p):
            return jnp.sum(hashgrid_encode(t, p, res) ** 2)

        gt_p, gp_p = jax.grad(loss_p, argnums=(0, 1))(table, pos)
        gt_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(table, pos)
        np.testing.assert_allclose(gt_p, gt_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gp_p, gp_r, rtol=1e-5, atol=1e-5)


class TestPallasFieldIntegration:
    def test_field_forward_with_pallas_grid(self):
        """The full field runs with grid impl='pallas' (interpret on CPU is
        implicit since pallas_call(interpret=False) still runs via the CPU
        lowering in jax's CPU backend? — no: use a tiny direct density call
        with interpret mode through the kernel API instead)."""
        import dataclasses
        from cropnerf_tpu.models.config import FieldConfig, HashGridConfig
        from cropnerf_tpu.models.field import field_density, field_init
        cfg = FieldConfig(grid=HashGridConfig(num_levels=2,
                                              log2_hashmap_size=8,
                                              max_res=16, impl="pallas",
                                              layout="dense"),
                          hidden_dim=8, geo_feat_dim=3,
                          hidden_dim_semantics=8, hidden_dim_color=8,
                          appearance_embedding_dim=2)
        params = field_init(jax.random.PRNGKey(0), cfg, num_images=1)
        pos = jax.random.normal(jax.random.PRNGKey(1), (128, 4, 3)) * 0.3
        density, geo = field_density(params, pos, cfg)
        assert density.shape == (128, 4)
        assert bool(jnp.all(jnp.isfinite(density)))
