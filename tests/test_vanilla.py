"""Vanilla (positional-encoding) field family tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cropnerf_tpu.core.cameras import near_far_collider
from cropnerf_tpu.core.rays import RayBundle
from cropnerf_tpu.models.config import (FieldConfig, HashGridConfig,
                                        ModelConfig, PRESETS,
                                        ProposalFieldConfig)
from cropnerf_tpu.models.model import forward, model_init
from cropnerf_tpu.ops.posenc import nerf_encoding

TINY_VANILLA = ModelConfig(
    field=FieldConfig(field_type="vanilla", hidden_dim=32,
                      hidden_dim_color=16, hidden_dim_semantics=16,
                      geo_feat_dim=8),
    proposal_fields=(
        ProposalFieldConfig(grid=HashGridConfig(num_levels=3,
                                                log2_hashmap_size=10,
                                                max_res=32), hidden_dim=8),),
    num_nerf_samples_per_ray=8,
    num_proposal_samples_per_ray=(16,),
)


class TestPosEnc:
    def test_shape(self):
        x = jnp.zeros((5, 3))
        assert nerf_encoding(x, 10).shape == (5, 3 * 21)
        assert nerf_encoding(x, 4, include_input=False).shape == (5, 24)

    def test_values(self):
        x = jnp.array([[0.5, 0.0, 0.0]])
        enc = nerf_encoding(x, 1, include_input=True)
        np.testing.assert_allclose(
            enc[0], [0.5, 0, 0, np.sin(0.5), 0, 0, np.cos(0.5), 1, 1],
            atol=1e-6)


class TestVanillaModel:
    def test_forward_and_grads(self):
        params = model_init(jax.random.PRNGKey(0), TINY_VANILLA, num_images=2)
        R = 8
        dirs = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rb = RayBundle(origins=jnp.zeros((R, 3)) + jnp.array([0., 0, 1.5]),
                       directions=dirs, nears=jnp.zeros((R,)),
                       fars=jnp.ones((R,)),
                       camera_idx=jnp.zeros((R,), jnp.int32))
        rb = near_far_collider(rb, 0.05, 10.0)
        out = forward(params, rb, TINY_VANILLA,
                      key=jax.random.PRNGKey(2), train=True)
        assert out["rgb"].shape == (R, 3)
        assert out["semantics"].shape == (R, 1)
        assert bool(jnp.all(jnp.isfinite(out["rgb"])))

        def loss(p):
            o = forward(p, rb, TINY_VANILLA, key=jax.random.PRNGKey(2),
                        train=True)
            return jnp.sum(o["rgb"] ** 2) + jnp.sum(o["semantics"] ** 2)

        g = jax.grad(loss)(params)
        total = np.sum([np.abs(l).sum() for l in jax.tree.leaves(g["field"])])
        assert total > 0

    def test_preset_exists(self):
        assert PRESETS["semantic-nerf"].model.field.field_type == "vanilla"
