"""Finite-difference gradient checks for the core differentiable ops
(SURVEY §4 test-strategy item (b))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.ops import losses as loss_ops
from cropnerf_tpu.ops import render as render_ops
from cropnerf_tpu.ops.hashgrid import hashgrid_encode, hashgrid_init, level_resolutions


def fd_grad(f, x, eps=1e-4):
    """Central finite differences over a flat float array."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.ravel()
    gflat = g.ravel()
    for i in range(flat.size):
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        gflat[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * eps)
    return g


class TestRenderWeightsGrad:
    def test_matches_fd(self):
        rng = np.random.RandomState(0)
        density = rng.rand(2, 6).astype(np.float64) * 2
        deltas = jnp.asarray(rng.rand(2, 6).astype(np.float32) * 0.3 + 0.05)

        def loss_np(d):
            w = render_ops.render_weights(jnp.asarray(d, jnp.float32), deltas)
            return float(jnp.sum(w ** 2))

        g_fd = fd_grad(loss_np, density, eps=1e-3)
        g_ad = jax.grad(lambda d: jnp.sum(
            render_ops.render_weights(d, deltas) ** 2))(
                jnp.asarray(density, jnp.float32))
        np.testing.assert_allclose(g_ad, g_fd, rtol=2e-2, atol=2e-3)


class TestHashGridGrad:
    def test_table_grad_matches_fd(self):
        table = np.asarray(hashgrid_init(jax.random.PRNGKey(0), 2, 2, 6),
                           np.float64)
        res = level_resolutions(2, 4, 8)
        pos = jnp.asarray(np.random.RandomState(1).rand(5, 3), jnp.float32)

        def loss_np(t):
            out = hashgrid_encode(jnp.asarray(t, jnp.float32), pos, res)
            return float(jnp.sum(out ** 2))

        g_ad = np.asarray(jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, pos, res) ** 2))(
                jnp.asarray(table, jnp.float32)))
        # check only the touched entries (finite differences over the full
        # 2*64*2 table would be slow); sample 20 nonzero-grad entries
        idx = np.argwhere(np.abs(g_ad) > 1e-8)
        rng = np.random.RandomState(2)
        sel = idx[rng.choice(len(idx), size=min(20, len(idx)), replace=False)]
        eps = 1e-3
        for i in sel:
            tp = table.copy(); tp[tuple(i)] += eps
            tm = table.copy(); tm[tuple(i)] -= eps
            fd = (loss_np(tp) - loss_np(tm)) / (2 * eps)
            assert g_ad[tuple(i)] == pytest.approx(fd, rel=3e-2, abs=1e-4)


class TestDistortionGrad:
    def test_matches_fd(self):
        rng = np.random.RandomState(3)
        sdist = jnp.asarray(np.sort(rng.rand(2, 7), axis=-1), jnp.float32)
        w0 = rng.rand(2, 6) * 0.3

        def loss_np(w):
            return float(loss_ops.distortion_loss(
                jnp.asarray(w, jnp.float32), sdist))

        g_fd = fd_grad(loss_np, w0, eps=1e-3)
        g_ad = jax.grad(lambda w: loss_ops.distortion_loss(w, sdist))(
            jnp.asarray(w0, jnp.float32))
        np.testing.assert_allclose(g_ad, g_fd, rtol=2e-2, atol=2e-3)


class TestInterlevelGrad:
    def test_prop_weights_receive_grad(self):
        sdist = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
        w_final = jnp.ones((2, 8)) / 8
        w_prop0 = jnp.concatenate([jnp.ones((2, 4)) / 4, jnp.zeros((2, 4))],
                                  -1)

        def loss(wp):
            return loss_ops.interlevel_loss([wp, w_final], [sdist, sdist])

        g = jax.grad(loss)(w_prop0)
        assert float(jnp.abs(g).sum()) > 0
        # final-level weights are detached
        g_final = jax.grad(lambda wf: loss_ops.interlevel_loss(
            [w_prop0, wf], [sdist, sdist]))(w_final)
        assert float(jnp.abs(g_final).sum()) == pytest.approx(0.0, abs=1e-12)
