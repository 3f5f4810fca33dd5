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
