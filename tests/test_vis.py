"""Headless visualisation tests (PNG outputs exist and are valid images)."""
import numpy as np
from PIL import Image

from cropnerf_tpu.evaluation.vis import (save_affinity_graph,
                                         save_cluster_views,
                                         save_instance_views,
                                         save_projection_overlay)


class TestVis:
    def test_cluster_views(self, tmp_path):
        pts = np.random.RandomState(0).randn(500, 3).astype(np.float32)
        labels = np.random.RandomState(1).randint(-1, 3, 500)
        p = save_cluster_views(pts, labels, tmp_path / "clusters.png")
        img = Image.open(p)
        assert img.width > 100

    def test_instance_views(self, tmp_path):
        info = [{"pcd": {0: np.random.randn(50, 3), 1: np.random.randn(50, 3)}}]
        p = save_instance_views(info, [np.array([1, 2])],
                                tmp_path / "instances.png")
        assert p.exists()

    def test_affinity_graph(self, tmp_path):
        aff = np.array([[0, 2.0, -1.0], [2.0, 0, 0], [-1.0, 0, 0]])
        p = save_affinity_graph(aff, tmp_path / "graph.png",
                                labels=np.array([1, 1, 2]))
        assert p.exists()

    def test_projection_overlay(self, tmp_path):
        lab = np.zeros((32, 32), np.uint8)
        lab[4:12, 4:12] = 1
        proj = np.zeros((32, 32), np.uint8)
        proj[6:14, 6:14] = 255
        p = save_projection_overlay(lab, proj, tmp_path / "overlay.png")
        img = np.asarray(Image.open(p))
        assert img.shape == (32, 32, 3)
        assert img.max() > 0
