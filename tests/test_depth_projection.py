"""Depth-based projection + merger variant and depth point-cloud export."""
import numpy as np
import pytest

from cropnerf_tpu.counting.depth_projection import (
    DepthMergerConfig, DepthProjectionConfig, count_instances_depth,
    project_super_clusters_for_camera, projection_matrix, project_points,
    zbuffer)


def look_at_camera(eye, center=(0, 0, 0)):
    eye = np.asarray(eye, np.float64)
    ctr = np.asarray(center, np.float64)
    fwd = ctr - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    R = np.stack([right, true_up, -fwd], axis=1)
    return np.concatenate([R, eye[:, None]], axis=1)


class TestProjectionMath:
    def test_center_point_projects_to_principal_point(self):
        c2w = look_at_camera([0, -2.0, 0])
        P = projection_matrix(100, 100, 64, 48, c2w)
        ys, xs, z = project_points(P, np.array([[0.0, 0, 0]]))
        assert z[0] == pytest.approx(2.0)
        assert ys[0] == 64 and xs[0] == 48

    def test_depth_ordering(self):
        c2w = look_at_camera([0, -2.0, 0])
        P = projection_matrix(100, 100, 64, 48, c2w)
        _, _, z = project_points(P, np.array([[0.0, 0, 0], [0.0, -1.0, 0]]))
        assert z[1] < z[0]

    def test_zbuffer_keeps_nearest(self):
        c2w = look_at_camera([0, -2.0, 0])
        P = projection_matrix(100, 100, 64, 48, c2w)
        pts = np.array([[0.0, 0, 0], [0.0, -1.0, 0]])   # same pixel
        buf = zbuffer(pts, P, 96, 128)
        assert buf[48, 64] == pytest.approx(1.0)


class TestDepthPipeline:
    def _scene(self):
        """Two small point blobs; blob B sits between the camera and blob A
        (occluding it)."""
        rng = np.random.RandomState(0)
        blob_a = rng.randn(400, 3) * 0.02 + np.array([0, 0.5, 0])
        blob_b = rng.randn(400, 3) * 0.02 + np.array([0, -0.5, 0])
        return blob_a.astype(np.float64), blob_b.astype(np.float64)

    def test_occlusion(self, tmp_path):
        blob_a, blob_b = self._scene()
        full = np.concatenate([blob_a, blob_b])
        info = np.array([{
            "aabb": np.stack([np.stack([b.min(0), b.max(0)])
                              for b in (blob_a, blob_b)]),
            "pcd": {0: blob_a, 1: blob_b},
        }], dtype=object)
        cam = {"fx": 300.0, "fy": 300.0, "cx": 160.0, "cy": 120.0,
               "c2w": look_at_camera([0, -3.0, 0]), "index": 0}
        cfg = DepthProjectionConfig(height=240, width=320)
        project_super_clusters_for_camera(cam, info, full, tmp_path, cfg)
        import cv2
        occ0 = cv2.imread(str(tmp_path / "super_cluster_0/cam_0/occ_free_0.png"),
                          cv2.IMREAD_GRAYSCALE)
        vis = cv2.imread(str(tmp_path / "super_cluster_0/cam_0/visible_label.png"),
                         cv2.IMREAD_GRAYSCALE)
        # blob A (behind) projects somewhere but is mostly occluded by B
        assert (occ0 > 0).sum() > 0
        n_vis_a = (vis == 1).sum()
        n_vis_b = (vis == 2).sum()
        assert n_vis_b > 0
        assert n_vis_a < 0.3 * n_vis_b    # A hidden behind B

    def test_count_with_labels(self, tmp_path):
        blob_a, blob_b = self._scene()
        # separate them laterally so both are visible
        blob_b = blob_b + np.array([0.8, 1.0, 0.0])
        full = np.concatenate([blob_a, blob_b])
        info = np.array([{
            "aabb": np.stack([np.stack([b.min(0), b.max(0)])
                              for b in (blob_a, blob_b)]),
            "pcd": {0: blob_a, 1: blob_b},
        }], dtype=object)
        cfg = DepthProjectionConfig(height=240, width=320)
        import cv2
        for ci, eye in enumerate([[0, -3.0, 0], [0.5, -3.0, 0.3]]):
            cam = {"fx": 300.0, "fy": 300.0, "cx": 160.0, "cy": 120.0,
                   "c2w": look_at_camera(eye), "index": ci}
            project_super_clusters_for_camera(cam, info, full, tmp_path, cfg)
        # GT labels: different instances → should NOT merge
        for cam_dir in (tmp_path / "super_cluster_0").glob("cam_*"):
            vis = cv2.imread(str(cam_dir / "visible_label.png"),
                             cv2.IMREAD_GRAYSCALE)
            gt = np.zeros_like(vis)
            gt[vis == 1] = 1
            gt[vis == 2] = 2
            cv2.imwrite(str(cam_dir / "label_gt.png"), gt)
        mcfg = DepthMergerConfig(frame_sampling_interval=1,
                                 binary_threshold=100,
                                 graph_partition="community")
        result = count_instances_depth(tmp_path, info, mcfg)
        assert result.total_count == 2
        # single-supercluster debug mode (≙ --super_cluster_idx)
        r0 = count_instances_depth(
            tmp_path, info,
            DepthMergerConfig(frame_sampling_interval=1,
                              binary_threshold=100,
                              graph_partition="community",
                              super_cluster_idx=0))
        assert r0.total_count == 2 and r0.per_super_cluster == [2]
        import pytest
        with pytest.raises(ValueError):
            count_instances_depth(
                tmp_path, info,
                DepthMergerConfig(super_cluster_idx=3))


class TestDepthPointcloudExport:
    def test_export_from_trained_tiny(self, tmp_path):
        import dataclasses
        import jax
        from cropnerf_tpu.data.databank import build_pixel_bank
        from cropnerf_tpu.export.pointcloud import generate_point_cloud
        from cropnerf_tpu.models.config import PRESETS
        from cropnerf_tpu.train.state import create_train_state
        from cropnerf_tpu.train.step import make_train_step
        from synthetic import render_synthetic_images, ring_cameras

        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=256)
        cams = ring_cameras(n=4, height=32, width=32, focal=40.0)
        images, masks = render_synthetic_images(cams, 32, 32,
                                                sphere_radius=0.35)
        bank = build_pixel_bank(images, masks, cams)
        state = create_train_state(jax.random.PRNGKey(0), cfg, 4)
        step = make_train_step(cfg, donate=False)
        key = jax.random.PRNGKey(1)
        for _ in range(150):
            key, sub = jax.random.split(key)
            state, _ = step(state, bank, sub)
        pts, cols = generate_point_cloud(
            state.params, cfg.model, bank, num_points=2000,
            rays_per_batch=1024, semantic_threshold=0.5,
            accumulation_threshold=0.3, max_batches=20,
            remove_outliers=False)
        assert len(pts) > 100
        # crop points concentrate near the sphere (radius 0.35 at origin);
        # loose bound — 150 steps of the tiny preset is only half-converged
        radii = np.linalg.norm(pts, axis=1)
        assert np.median(radii) < 0.8
