"""End-to-end pipeline test on a synthetic scene with a known crop count
(SURVEY §4 items (c) and (e) combined): train a tiny semantic NeRF on an
analytically ray-traced sphere ('one crop'), export the semantic volume,
segment it, render per-subcluster projections, and count — expecting 1.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cropnerf_tpu.counting.merger import MergerConfig, count_instances
from cropnerf_tpu.counting.segmenter import build_super_cluster_info
from cropnerf_tpu.data.databank import build_pixel_bank
from cropnerf_tpu.export.volume import sample_volume
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.projection.project import run_projections
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_render_fn, make_train_step

from synthetic import render_synthetic_images, ring_cameras


@pytest.fixture(scope="module")
def trained():
    cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                              train_num_rays_per_batch=512)
    cams = ring_cameras(n=6, height=48, width=48, focal=60.0)
    images, masks = render_synthetic_images(cams, 48, 48, sphere_radius=0.35)
    bank = build_pixel_bank(images, masks, cams)
    state = create_train_state(jax.random.PRNGKey(0), cfg,
                               num_images=bank.num_images)
    step = make_train_step(cfg, donate=False)
    key = jax.random.PRNGKey(1)
    for _ in range(400):
        key, sub = jax.random.split(key)
        state, metrics = step(state, bank, sub)
    return cfg, cams, images, masks, bank, state, metrics


class TestEndToEnd:
    def test_training_converged(self, trained):
        cfg, cams, images, masks, bank, state, metrics = trained
        assert float(metrics["psnr"]) > 16.0, float(metrics["psnr"])

    def test_rendered_semantics_match_mask(self, trained):
        cfg, cams, images, masks, bank, state, metrics = trained
        render = make_render_fn(cfg)
        out = render(state.params, cams, jnp.int32(0), 48, 48)
        sem = np.asarray(out["semantics_colormap"][..., 0])
        pred = sem > 0.5
        gt = masks[0] > 0
        inter = (pred & gt).sum()
        union = (pred | gt).sum()
        assert inter / max(union, 1) > 0.5, inter / max(union, 1)

    def test_export_segment_project_count(self, trained, tmp_path_factory):
        cfg, cams, images, masks, bank, state, metrics = trained
        tmp = tmp_path_factory.mktemp("pipeline")

        # --- export (relaxed thresholds: the tiny model's density scale is
        # far below the production 70 threshold) ---
        aabb = np.array([[-0.6, -0.6, -0.6], [0.6, 0.6, 0.6]], np.float32)
        clouds = sample_volume(state.params, cfg.model, aabb,
                               num_points_per_side=24, rays_per_batch=128,
                               num_samples=24,
                               semantic_threshold=0.5,
                               density_threshold=5.0,
                               colormap_threshold=0.6)
        pts = clouds["semantic"].points
        assert len(pts) > 50, f"export produced only {len(pts)} points"
        # exported crop points should concentrate near the sphere
        radii = np.linalg.norm(pts, axis=1)
        assert np.median(radii) < 0.5

        # --- segment ---
        info = build_super_cluster_info(pts, k=2, vx_size=0.01)
        assert len(info) >= 1
        info = np.array(info[:1], dtype=object)     # largest supercluster

        # --- project ---
        proj_dir = tmp / "projection"
        label_dir = tmp / "labels"
        label_dir.mkdir()
        label_paths = []
        for i, m in enumerate(masks):
            p = label_dir / f"frame_{i:04d}.png"
            Image.fromarray((m > 0).astype(np.uint8)).save(p)   # instance 1
            label_paths.append(p)
        run_projections(state.params, cfg.model, cams, 48, 48, info,
                        proj_dir, label_paths=label_paths)
        # wo-occ projections of the sphere should be non-empty somewhere
        import cv2
        total = 0
        for p in proj_dir.glob("super_cluster_0/cam_*/wo_occ_cluster_*.png"):
            img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
            total += (img > 100).sum()
        assert total > 0

        # --- count: one sphere = one instance ---
        mcfg = MergerConfig(frame_sampling_interval=1, binary_threshold=100)
        result = count_instances(proj_dir, info, mcfg)
        assert result.total_count == 1, result
