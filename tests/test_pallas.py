"""Pallas kernel tests (interpreter mode on CPU) vs jnp references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.ops import render as render_ops
from cropnerf_tpu.ops.pallas.fused_mlp import fused_mlp
from cropnerf_tpu.ops.pallas.transmittance import render_weights_pallas


def mlp_ref(x, wbs):
    """Same math as the kernel: bf16 matmuls, fp32 accum."""
    h = x.astype(jnp.bfloat16)
    n = len(wbs) // 2
    for i in range(n):
        h = jnp.dot(h, wbs[2 * i].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + wbs[2 * i + 1]
        if i < n - 1:
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    return h.astype(jnp.float32)


def make_wbs(key, dims):
    wbs = []
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        wbs.append(jax.random.normal(k1, (dims[i], dims[i + 1]),
                                     dtype=jnp.float32) * 0.3)
        wbs.append(jnp.zeros((1, dims[i + 1]), jnp.float32))
    return wbs


class TestTransmittancePallas:
    def test_matches_jnp(self):
        key = jax.random.PRNGKey(0)
        density = jax.random.uniform(key, (256, 48)) * 5
        deltas = jax.random.uniform(key, (256, 48)) * 0.1
        ref = render_ops.render_weights(density, deltas)
        out = render_weights_pallas(density, deltas, tile_r=64,
                                    interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_ragged_fallback(self):
        density = jnp.ones((7, 16))
        deltas = jnp.ones((7, 16)) * 0.1
        ref = render_ops.render_weights(density, deltas)
        out = render_weights_pallas(density, deltas, tile_r=4, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-5)


class TestFusedMLP:
    @pytest.mark.parametrize("dims", [(32, 64, 16), (64, 64, 64, 3)])
    def test_forward_matches(self, dims):
        key = jax.random.PRNGKey(0)
        wbs = make_wbs(key, dims)
        x = jax.random.normal(jax.random.PRNGKey(1), (256, dims[0]))
        ref = mlp_ref(x, wbs)
        out = fused_mlp(x, wbs, 128, True)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def test_backward_matches(self):
        dims = (16, 32, 8)
        wbs = make_wbs(jax.random.PRNGKey(0), dims)
        x = jax.random.normal(jax.random.PRNGKey(1), (128, dims[0]))

        def loss_pallas(x, wbs):
            return jnp.sum(fused_mlp(x, wbs, 64, True) ** 2)

        def loss_ref(x, wbs):
            return jnp.sum(mlp_ref(x, wbs) ** 2)

        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, wbs)
        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wbs)
        np.testing.assert_allclose(gx_p, gx_r, rtol=5e-2, atol=5e-2)
        for a, b in zip(gw_p, gw_r):
            np.testing.assert_allclose(a, b, rtol=5e-2, atol=0.5)

    def test_ragged_fallback(self):
        dims = (8, 16, 4)
        wbs = make_wbs(jax.random.PRNGKey(0), dims)
        x = jax.random.normal(jax.random.PRNGKey(1), (100, dims[0]))
        ref = mlp_ref(x, wbs)
        out = fused_mlp(x, wbs, 64, True)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
