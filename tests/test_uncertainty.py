"""BayesRays uncertainty tests (tiny model, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.core.cameras import near_far_collider
from cropnerf_tpu.core.rays import RayBundle
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.models.model import model_init
from cropnerf_tpu.uncertainty.bayesrays import (ComputeUncertainty,
                                                grid_corner_indices,
                                                render_uncertainty,
                                                uncertainty_at)

CFG = PRESETS["cropnerf-tiny"]


def make_bundle(R=16, seed=0):
    key = jax.random.PRNGKey(seed)
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((R, 3)) + jnp.array([0.0, 0, 1.5]),
                   directions=dirs, nears=jnp.zeros((R,)),
                   fars=jnp.ones((R,)),
                   camera_idx=jnp.zeros((R,), jnp.int32))
    return near_far_collider(rb, 0.05, 10.0)


class TestGridIndices:
    def test_coeffs_sum_to_one(self):
        pos = jax.random.uniform(jax.random.PRNGKey(0), (64, 3)) * 0.98 + 0.01
        sel = jnp.ones((64,))
        inds, coeffs = grid_corner_indices(pos, sel, lod=3)
        np.testing.assert_allclose(jnp.sum(coeffs, axis=0), 1.0, rtol=1e-5)
        side = 2 ** 3 + 1
        assert int(inds.max()) < side ** 3

    def test_exact_lattice_point(self):
        # a point exactly on a lattice vertex gets weight 1 on that corner
        pos = jnp.array([[0.25, 0.5, 0.75]])   # lattice of lod=2 (res 4)
        sel = jnp.ones((1,))
        inds, coeffs = grid_corner_indices(pos, sel, lod=2)
        assert float(coeffs.max()) == pytest.approx(1.0, abs=1e-5)
        side = 5
        expect = (1 * side * side + 2 * side + 3)
        assert int(inds[np.argmax(coeffs)][0]) == expect

    def test_selector_zeroes_outside(self):
        pos = jnp.array([[0.5, 0.5, 0.5]])
        sel = jnp.zeros((1,))
        _, coeffs = grid_corner_indices(pos, sel, lod=2)
        np.testing.assert_allclose(coeffs, 0.0)


class TestHessian:
    def test_accumulates_nonnegative(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        comp = ComputeUncertainty(params, CFG.model, lod=4)
        h = comp.run([make_bundle(16, s) for s in range(2)])
        assert h.shape == ((2 ** 4 + 1) ** 3,)
        assert (h >= 0).all()
        assert h.sum() > 0           # some gradient mass lands in the grid

    def test_uncertainty_lower_where_observed(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        comp = ComputeUncertainty(params, CFG.model, lod=4)
        h = comp.run([make_bundle(32, s) for s in range(3)])
        # cells with accumulated Hessian mass must have lower uncertainty
        # than untouched cells
        hot = np.argsort(h)[-10:]
        cold = np.where(h == 0)[0][:10]
        n = 3 * 32
        unc = 1.0 / (h / n + 1e-4)
        assert unc[hot].mean() < unc[cold].mean()

    def test_render_uncertainty_shape(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        comp = ComputeUncertainty(params, CFG.model, lod=4)
        h = comp.run([make_bundle(16)])
        rb = make_bundle(8, seed=5)
        u = render_uncertainty(params, rb, CFG.model, jnp.asarray(h), lod=4,
                               n_samples=16)
        assert u.shape == (8,)
        assert bool(jnp.all(jnp.isfinite(u)))

    def test_uncertainty_at_range(self):
        h = jnp.ones(((2 ** 3 + 1) ** 3,))
        pts = jax.random.normal(jax.random.PRNGKey(0), (32, 3)) * 0.3
        u = uncertainty_at(pts, h, CFG.model, lod=3, n_samples=10)
        assert float(u.min()) >= 0.0 and float(u.max()) <= 1.0
