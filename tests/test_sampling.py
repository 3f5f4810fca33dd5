"""Tests for spaced / PDF samplers and camera ray generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.core.cameras import (Cameras, generate_rays,
                                       near_far_collider, ray_aabb_intersect)
from cropnerf_tpu.core.rays import RayBundle
from cropnerf_tpu.ops import pdf as pdf_ops


def make_bundle(R=8, near=0.1, far=10.0):
    key = jax.random.PRNGKey(0)
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.zeros((R, 3)), directions=dirs,
        nears=jnp.full((R,), near), fars=jnp.full((R,), far),
        camera_idx=jnp.zeros((R,), jnp.int32))


class TestSpacedSampler:
    def test_uniform_eval_bins(self):
        rb = make_bundle(R=4, near=1.0, far=5.0)
        s = pdf_ops.sample_spaced(None, rb, 8, pdf_ops.spacing_uniform(),
                                  train=False)
        np.testing.assert_allclose(s.starts[:, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(s.ends[:, -1], 5.0, atol=1e-6)
        np.testing.assert_allclose(s.deltas, 0.5, atol=1e-6)

    def test_train_jitter_within_bounds(self):
        rb = make_bundle(R=16, near=0.5, far=2.0)
        s = pdf_ops.sample_spaced(jax.random.PRNGKey(1), rb, 8,
                                  pdf_ops.spacing_uniform(), train=True)
        assert float(jnp.min(s.starts)) >= 0.5 - 1e-5
        assert float(jnp.max(s.ends)) <= 2.0 + 1e-5
        assert bool(jnp.all(s.ends > s.starts))

    def test_piecewise_spacing_roundtrip(self):
        fn, inv = pdf_ops.spacing_piecewise()
        t = jnp.array([0.1, 0.5, 1.0, 2.0, 100.0])
        np.testing.assert_allclose(inv(fn(t)), t, rtol=1e-5)

    def test_piecewise_half_near(self):
        # s=0.5 maps to t=1 → half the samples land in [near, 1)
        fn, inv = pdf_ops.spacing_piecewise()
        assert float(inv(jnp.array(0.5))) == pytest.approx(1.0)


class TestPDFSampler:
    def test_concentrates_samples(self):
        rb = make_bundle(R=2, near=0.0, far=1.0)
        bins = jnp.linspace(0, 1, 17)[None].repeat(2, 0)
        w = jnp.zeros((2, 16)).at[:, 8].set(1.0)   # all mass in bin 8
        s = pdf_ops.sample_pdf(None, rb, bins, w, 15,
                               pdf_ops.spacing_uniform(), train=False,
                               histogram_padding=0.0)
        mids = np.asarray(s.spacing_midpoints)
        # most of the new samples should be inside bin 8 = [0.5, 0.5625]
        frac_in = np.mean((mids >= 0.5) & (mids <= 0.5625))
        assert frac_in > 0.8

    def test_searchsorted_equivalence(self):
        cdf = np.sort(np.random.RandomState(0).rand(4, 9), axis=-1)
        cdf[:, 0] = 0.0
        u = np.random.RandomState(1).rand(4, 5)
        ours = np.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)
        for r in range(4):
            ref = np.searchsorted(cdf[r], u[r], side="right")
            np.testing.assert_array_equal(ours[r], ref)

    def test_uniform_weights_give_uniform_samples(self):
        rb = make_bundle(R=1, near=0.0, far=1.0)
        bins = jnp.linspace(0, 1, 33)[None]
        w = jnp.ones((1, 32))
        s = pdf_ops.sample_pdf(None, rb, bins, w, 31,
                               pdf_ops.spacing_uniform(), train=False)
        mids = np.asarray(s.spacing_midpoints[0])
        diffs = np.diff(mids)
        assert np.std(diffs) < 0.01


class TestCameras:
    def _cameras(self, n=2):
        c2w = jnp.tile(jnp.eye(3, 4)[None], (n, 1, 1))
        return Cameras(
            c2w=c2w, fx=jnp.full((n,), 100.0), fy=jnp.full((n,), 100.0),
            cx=jnp.full((n,), 50.0), cy=jnp.full((n,), 50.0),
            width=jnp.full((n,), 100, jnp.int32),
            height=jnp.full((n,), 100, jnp.int32))

    def test_center_pixel_points_forward(self):
        cams = self._cameras()
        # pixel center at the principal point → straight down -Z
        o, d = generate_rays(cams, jnp.array([0]), jnp.array([49]),
                             jnp.array([49]))
        np.testing.assert_allclose(o[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-2)

    def test_directions_unit_norm(self):
        cams = self._cameras()
        o, d = generate_rays(cams, jnp.zeros((10,), jnp.int32),
                             jnp.arange(10), jnp.arange(10) * 3)
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, rtol=1e-6)

    def test_aabb_intersect(self):
        aabb = jnp.array([[-1.0, -1, -1], [1, 1, 1]])
        origins = jnp.array([[0.0, 0, 5], [0, 0, 5], [5, 5, 5]])
        dirs = jnp.array([[0.0, 0, -1], [0, 0, 1], [0, 0, -1]])
        nears, fars, hit = ray_aabb_intersect(origins, dirs, aabb)
        assert hit[0] == 1.0 and nears[0] == pytest.approx(4.0) \
            and fars[0] == pytest.approx(6.0)
        assert hit[1] == 0.0      # pointing away
        assert hit[2] == 0.0      # misses box laterally

    def test_collider(self):
        rb = make_bundle()
        rb = near_far_collider(rb, 0.05, 1000.0)
        assert float(rb.nears[0]) == pytest.approx(0.05)
        assert float(rb.fars[0]) == pytest.approx(1000.0)


class TestPDFTorchGolden:
    def test_matches_torch_reimplementation(self):
        """Deterministic (eval-mode) inverse-CDF resampling vs an
        independent torch implementation of the same spec (histogram
        padding, clamped cdf, midpoint queries, linear interp)."""
        import torch

        R, S, NB = 4, 16, 9          # NB bins → NB-1=8 samples requested
        rng = np.random.RandomState(0)
        bins_np = np.sort(rng.rand(R, S + 1), axis=-1).astype(np.float32)
        w_np = rng.rand(R, S).astype(np.float32)
        pad = 0.01

        # --- torch reference (written from the sampler spec) ---
        w = torch.tensor(w_np) + pad
        pdf = w / w.sum(dim=-1, keepdim=True)
        cdf = torch.cumsum(pdf, dim=-1)
        cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], dim=-1)
        cdf = torch.clamp(cdf, max=1.0)
        u = torch.linspace(0, 1 - 1 / NB, NB).expand(R, NB) + 0.5 / NB
        inds = torch.searchsorted(cdf, u.contiguous(), right=True)
        below = torch.clamp(inds - 1, 0, S)
        above = torch.clamp(inds, 0, S)
        cdf_g0 = torch.gather(cdf, 1, below)
        cdf_g1 = torch.gather(cdf, 1, above)
        b = torch.tensor(bins_np)
        bins_g0 = torch.gather(b, 1, below)
        bins_g1 = torch.gather(b, 1, above)
        denom = cdf_g1 - cdf_g0
        t = torch.where(denom > 1e-10, (u - cdf_g0) / denom.clamp(min=1e-10),
                        torch.zeros_like(denom)).clamp(0, 1)
        ref_bins = (bins_g0 + t * (bins_g1 - bins_g0)).numpy()

        # --- ours ---
        rb = make_bundle(R=R, near=0.0, far=1.0)
        s = pdf_ops.sample_pdf(None, rb, jnp.asarray(bins_np),
                               jnp.asarray(w_np), NB - 1,
                               pdf_ops.spacing_uniform(), train=False,
                               histogram_padding=pad)
        ours = np.concatenate(
            [np.asarray(s.spacing_starts), np.asarray(s.spacing_ends[:, -1:])],
            axis=-1)
        np.testing.assert_allclose(ours, ref_bins, rtol=1e-5, atol=1e-6)
