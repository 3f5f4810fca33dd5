"""Web viewer server test: serve a tiny model, fetch /render over HTTP."""
import io
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.models.model import model_init
from cropnerf_tpu.viewer.server import ViewerServer, make_model_renderer


class TestViewer:
    def test_serves_page_and_renders(self):
        cfg = PRESETS["cropnerf-tiny"]
        params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
        render_image = make_model_renderer(params, cfg, size=32, focal=40.0)
        server = ViewerServer(render_image, host="127.0.0.1", port=0)
        server.start_background()
        try:
            base = f"http://127.0.0.1:{server.port}"
            page = urllib.request.urlopen(base + "/", timeout=30).read()
            assert b"cropnerf viewer" in page
            png = urllib.request.urlopen(
                base + "/render?theta=0.3&phi=0.2&r=1.2&channel=rgb",
                timeout=120).read()
            img = np.asarray(Image.open(io.BytesIO(png)))
            assert img.shape == (32, 32, 3)
            png2 = urllib.request.urlopen(
                base + "/render?channel=semantics_colormap",
                timeout=120).read()
            assert len(png2) > 0
        finally:
            server.shutdown()


class TestViewerUncertainty:
    def test_uncertainty_channel(self):
        import numpy as np
        cfg = PRESETS["cropnerf-tiny"]
        params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
        lod = 3
        hessian = np.abs(np.random.RandomState(0).randn((2 ** lod + 1) ** 3))
        render_image = make_model_renderer(params, cfg, size=24, focal=30.0,
                                           hessian=hessian,
                                           uncertainty_lod=lod,
                                           uncertainty_n_samples=10)
        img = render_image(theta=0.0, phi=0.2, radius=1.2,
                           channel="uncertainty")
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all()

    def test_filter_slider_suppresses_density(self):
        """filter=0 zeroes every sample (all uncertainty > 0) → empty
        accumulation; filter=1 keeps the unfiltered render (the reference
        viewer's slider, run_viewer_u.py:49-120)."""
        cfg = PRESETS["cropnerf-tiny"]
        params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
        lod = 3
        hessian = np.abs(np.random.RandomState(0).randn((2 ** lod + 1) ** 3))
        render_image = make_model_renderer(params, cfg, size=16, focal=20.0,
                                           hessian=hessian,
                                           uncertainty_lod=lod,
                                           uncertainty_n_samples=10)
        acc_open = render_image(theta=0.0, phi=0.2, radius=1.2,
                                channel="accumulation", unc_filter=1.0)
        acc_shut = render_image(theta=0.0, phi=0.2, radius=1.2,
                                channel="accumulation", unc_filter=-1.0)
        assert float(np.abs(acc_shut).max()) == 0.0
        assert float(acc_open.max()) > 0.0


class TestViewerInstances:
    def test_instances_channel_overlays_points(self):
        """The 'instances' channel splats instance-coloured points at their
        projected pixel locations over a dimmed rgb render (≙ the
        reference's cluster debug viewers, segmenter.py:187-204)."""
        cfg = PRESETS["cropnerf-tiny"]
        params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
        # a red instance blob at the scene center: the camera looks at the
        # origin, so its splat must land near the image center
        pts = np.zeros((50, 3), np.float32) + np.random.RandomState(
            0).randn(50, 3).astype(np.float32) * 0.01
        cols = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (50, 1))
        aabbs = np.array([[[-0.2, -0.2, -0.2], [0.2, 0.2, 0.2]]])
        render_image = make_model_renderer(params, cfg, size=48, focal=60.0,
                                           instances=(pts, cols),
                                           aabbs=aabbs)
        img = render_image(theta=0.3, phi=0.2, radius=1.2,
                           channel="instances")
        assert img.shape == (48, 48, 3)
        c = img[16:32, 16:32]              # center crop
        red = (c[..., 0] > 0.9) & (c[..., 1] < 0.1) & (c[..., 2] < 0.1)
        assert red.any(), "instance splat not visible at image center"
        # white AABB wireframe pixels exist somewhere
        white = (img > 0.99).all(axis=-1)
        assert white.any(), "AABB wireframe not drawn"

    def test_instances_channel_without_artifacts_is_rgb(self):
        cfg = PRESETS["cropnerf-tiny"]
        params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
        render_image = make_model_renderer(params, cfg, size=16, focal=20.0)
        a = render_image(theta=0.0, phi=0.2, radius=1.2, channel="instances")
        b = render_image(theta=0.0, phi=0.2, radius=1.2, channel="rgb")
        np.testing.assert_allclose(a, b)
