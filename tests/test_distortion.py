"""Camera distortion handling vs OpenCV's reference undistortion."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.core.cameras import Cameras, _undistort, generate_rays


class TestUndistortion:
    def test_matches_cv2(self):
        k1, k2, p1, p2 = 0.1, -0.05, 0.001, -0.002
        rng = np.random.RandomState(0)
        pts = rng.uniform(-0.4, 0.4, (50, 2)).astype(np.float64)

        # distort forward (OpenCV model)
        x, y = pts[:, 0], pts[:, 1]
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 ** 2
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y

        coeffs = jnp.tile(jnp.array([[k1, k2, 0, 0, p1, p2]]), (50, 1))
        xu, yu = _undistort(jnp.asarray(xd), jnp.asarray(yd), coeffs, iters=5)
        np.testing.assert_allclose(xu, x, atol=2e-4)
        np.testing.assert_allclose(yu, y, atol=2e-4)

        # and against cv2.undistortPoints on the same inputs
        dist = np.array([k1, k2, p1, p2], np.float64)
        und = cv2.undistortPoints(
            np.stack([xd, yd], -1).reshape(-1, 1, 2),
            np.eye(3), dist).reshape(-1, 2)
        np.testing.assert_allclose(np.stack([xu, yu], -1), und, atol=5e-4)

    def test_ray_generation_uses_distortion(self):
        n = 1
        cams_d = Cameras(
            c2w=jnp.eye(3, 4)[None], fx=jnp.array([100.0]),
            fy=jnp.array([100.0]), cx=jnp.array([50.0]), cy=jnp.array([50.0]),
            width=jnp.array([100]), height=jnp.array([100]),
            distortion=jnp.array([[0.2, 0.0, 0, 0, 0, 0]]))
        cams_n = cams_d.replace(distortion=None)
        idx = jnp.zeros((1,), jnp.int32)
        _, d1 = generate_rays(cams_d, idx, jnp.array([80]), jnp.array([20]))
        _, d2 = generate_rays(cams_n, idx, jnp.array([80]), jnp.array([20]))
        # distorted camera bends the off-center ray
        assert float(jnp.abs(d1 - d2).max()) > 1e-3
