"""LPIPS (local-weights gate) and profiling-utils tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from cropnerf_tpu.ops.lpips import load_weights, lpips
from cropnerf_tpu.utils.profiling import StepTimer


class TestLpips:
    def test_none_without_weights(self, tmp_path):
        assert load_weights(tmp_path / "missing.npz") is None
        a = jnp.zeros((16, 16, 3))
        assert lpips(a, a, None) is None

    def test_with_tiny_weights(self, tmp_path):
        rng = np.random.RandomState(0)
        w = {
            "conv0_w": rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1,
            "conv0_b": np.zeros(8, np.float32),
            "lin0": np.abs(rng.randn(8).astype(np.float32)),
            "conv1_w": rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1,
            "conv1_b": np.zeros(8, np.float32),
            "lin1": np.abs(rng.randn(8).astype(np.float32)),
        }
        np.savez(tmp_path / "w.npz", **w)
        weights = load_weights(tmp_path / "w.npz")
        a = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
        d_same = float(lpips(a, a, weights))
        d_diff = float(lpips(a, b, weights))
        assert d_same == pytest.approx(0.0, abs=1e-6)
        assert d_diff > d_same


class TestStepTimer:
    def test_counters(self):
        import time
        t = StepTimer(rays_per_step=1000)
        t.tick()
        time.sleep(0.01)
        out = t.tick()
        assert out["rays_per_s"] > 0
        assert t.mean_rays_per_s > 0
        assert 5 < out["step_time_ms"] < 500
