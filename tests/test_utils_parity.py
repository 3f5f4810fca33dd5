"""Tests for the small parity utilities that back the reference's one-off
tools: preprocess helpers (utils/rescale.py, thick_contour_extractor.py,
cotton_dataset mask threshold), the clustering variants
(segmentation/clustering.py), and the parallel/profiling helpers."""
import numpy as np
import pytest

from cropnerf_tpu.counting.clustering import kmeans_elbow, spectral_clustering
from cropnerf_tpu.counting.segmenter import bounds_as_sorted_list
from cropnerf_tpu.data.preprocess import (binary_mask_from_instance_img,
                                          boundary_mask, rescale_images)


class TestPreprocessUtils:
    def test_binary_mask_threshold(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[2:4, 2:4] = [9, 0, 0]      # gray mean 3 → NOT above threshold 3
        img[5:7, 5:7] = [30, 30, 30]   # gray 30 → crop
        m = binary_mask_from_instance_img(img)
        assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 255}
        assert (m[5:7, 5:7] == 255).all()
        assert (m[2:4, 2:4] == 0).all()      # mean exactly 3 is background
        # grayscale input path
        m2 = binary_mask_from_instance_img(img.mean(-1).astype(np.uint8))
        np.testing.assert_array_equal(m, m2)

    def test_boundary_mask_ring(self):
        lab = np.zeros((16, 16), np.uint8)
        lab[4:12, 4:12] = 1
        b = boundary_mask(lab, thickness=3)
        assert b[4, 4] > 0 and b[11, 11] > 0        # edges marked
        assert b[7, 7] == 0 and b[8, 8] == 0        # interior empty
        assert b[0, 0] == 0                          # background empty

    def test_rescale_images(self, tmp_path):
        from PIL import Image
        src, dst = tmp_path / "src", tmp_path / "dst"
        src.mkdir()
        lab = np.zeros((16, 20), np.uint8)
        lab[:8] = 7
        Image.fromarray(lab).save(src / "label_a.png")
        n = rescale_images(src, dst, factor=2, nearest=True)
        assert n == 1
        out = np.asarray(Image.open(dst / "label_a.png"))
        assert out.shape == (8, 10)
        # nearest keeps exact label values (no interpolated 3s/4s)
        assert set(np.unique(out)) == {0, 7}

    def test_rescale_cli(self, tmp_path, capsys):
        from PIL import Image
        from cropnerf_tpu import cli
        src, dst = tmp_path / "s", tmp_path / "d"
        src.mkdir()
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(src / "x.png")
        cli.main(["rescale", "--src-dir", str(src), "--dst-dir", str(dst),
                  "--factor", "2", "--nearest"])
        assert (dst / "x.png").exists()
        assert np.asarray(Image.open(dst / "x.png")).shape == (4, 4)


class TestAutoSeg:
    """Fallback mask segmenter (data/autoseg.py) — the dependency-free
    stand-in for the reference's GroundedSAM step
    (fruit_nerf_dataset.py:51-198): binary mask format, >20% drop rule,
    transforms.json semantic_path wiring."""

    def _scene(self, h=64, w=64):
        """Black background + two red discs + one green distractor."""
        img = np.zeros((h, w, 3), np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        gt = np.zeros((h, w), bool)
        for cy, cx, r in ((18, 18, 7), (44, 40, 9)):
            d = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            img[d] = [200, 30, 30]
            gt |= d
        img[(yy - 50) ** 2 + (xx - 12) ** 2 <= 16] = [30, 180, 30]
        return img, gt

    def _iou(self, a, b):
        return (a & b).sum() / max(1, (a | b).sum())

    def test_color_prior_recovers_discs(self):
        from cropnerf_tpu.data.autoseg import AutoSegConfig, segment_image
        img, gt = self._scene()
        m = segment_image(img, AutoSegConfig(color=(200, 30, 30), k=1,
                                             morph_radius=0))
        assert self._iou(m, gt) > 0.95
        assert not m[50, 12]                      # distractor excluded

    def test_kmeans_color_prior(self):
        from cropnerf_tpu.data.autoseg import AutoSegConfig, segment_image
        img, gt = self._scene()
        m = segment_image(img, AutoSegConfig(color=(255, 0, 0), k=3,
                                             color_tol=90.0, morph_radius=0))
        assert self._iou(m, gt) > 0.9

    def test_priorless_border_background(self):
        from cropnerf_tpu.data.autoseg import AutoSegConfig, segment_image
        img, gt = self._scene()
        m = segment_image(img, AutoSegConfig(k=3, morph_radius=0))
        # priorless mode keeps every non-background cluster: both discs AND
        # the distractor count as foreground
        assert (m & gt).sum() / gt.sum() > 0.95
        assert m[50, 12]

    def test_oversized_component_dropped(self):
        """A component covering >20%% of the image is dropped — the
        reference's post-SAM rule (fruit_nerf_dataset.py:172-177)."""
        from cropnerf_tpu.data.autoseg import AutoSegConfig, segment_image
        img, gt = self._scene()
        img[:30, :] = [200, 30, 30]               # giant foreground slab
        m = segment_image(img, AutoSegConfig(color=(200, 30, 30), k=1,
                                             morph_radius=0))
        assert not m[:30].any()                   # slab dropped
        assert m[44, 40]                          # small disc survives

    def test_segment_dir_and_transforms_wiring(self, tmp_path):
        import json
        from PIL import Image
        from cropnerf_tpu.data.autoseg import AutoSegConfig, segment_dir
        img, gt = self._scene()
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        for name in ("frame_000", "frame_001"):
            Image.fromarray(img).save(img_dir / f"{name}.png")
        tf = tmp_path / "transforms.json"
        tf.write_text(json.dumps({"frames": [
            {"file_path": "images/frame_000.png"},
            {"file_path": "images/frame_001.png"}]}))
        n = segment_dir(img_dir, tmp_path / "masks",
                        AutoSegConfig(color=(200, 30, 30), k=1),
                        transforms_path=tf)
        assert n == 2
        m = np.asarray(Image.open(tmp_path / "masks" / "mask_frame_000.png"))
        assert set(np.unique(m)) <= {0, 255}       # binary format parity
        assert self._iou(m > 0, gt) > 0.9
        meta = json.loads(tf.read_text())
        assert meta["frames"][0]["semantic_path"] == "masks/mask_frame_000.png"
        assert "semantics" in meta

    def test_masks_feed_the_dataparser(self, tmp_path):
        """End-to-end builder contract: segment-masks over a dataset's
        images + --update-transforms must produce semantic_path entries
        the dataparser actually loads (the per-frame override branch,
        dataparser.py) and masks that agree with the ground truth."""
        from PIL import Image
        from test_trainer import write_synthetic_dataset
        from cropnerf_tpu import cli
        from cropnerf_tpu.data.dataparser import (DataparserConfig,
                                                  parse_transforms)
        root = write_synthetic_dataset(tmp_path / "ds", n=4, size=40)
        gt = {p.name: np.asarray(Image.open(p)) > 0
              for p in sorted((root / "semantics").glob("*.png"))}
        # white background touches every border → priorless kmeans mode;
        # the sphere can exceed 20% of a 40px frame, so lift the drop rule
        cli.main(["segment-masks", "--image-dir", str(root / "images"),
                  "--out-dir", str(root / "auto_masks"), "--k", "2",
                  "--max-mask-fraction", "0.9",
                  "--update-transforms", str(root / "transforms.json")])
        out = parse_transforms(
            DataparserConfig(data_dir=root, train_split_fraction=1.0))
        assert all("auto_masks/mask_" in str(p) for p in out.semantic_paths)
        for p in out.semantic_paths:
            assert p.exists()
            m = np.asarray(Image.open(p)) > 0
            g = gt[p.name.replace("mask_", "")]
            iou = (m & g).sum() / max(1, (m | g).sum())
            assert iou > 0.8, f"{p.name}: IoU {iou:.2f}"

    def test_cli_segment_masks(self, tmp_path, capsys):
        from PIL import Image
        from cropnerf_tpu import cli
        img, _ = self._scene()
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        Image.fromarray(img).save(img_dir / "a.png")
        cli.main(["segment-masks", "--image-dir", str(img_dir),
                  "--out-dir", str(tmp_path / "masks"),
                  "--color", "200,30,30", "--k", "1"])
        assert (tmp_path / "masks" / "mask_a.png").exists()
        out = capsys.readouterr().out
        assert '"segmented": 1' in out


class TestClusteringVariants:
    def _blobs(self, k, n=40, spread=0.02, dist=2.0, seed=0):
        rng = np.random.RandomState(seed)
        return np.concatenate([
            rng.randn(n, 3) * spread + np.array([i * dist, 0, 0])
            for i in range(k)])

    def test_kmeans_elbow_finds_k(self):
        pts = self._blobs(3)
        labels = kmeans_elbow(pts, k_max=8, inertia_delta=0.5)
        assert len(np.unique(labels)) == 3
        # blob members agree on a label
        for i in range(3):
            assert len(np.unique(labels[i * 40:(i + 1) * 40])) == 1

    def test_spectral_partitions_blobs(self):
        pts = self._blobs(2)
        labels = spectral_clustering(pts, k=2)
        assert len(np.unique(labels)) == 2
        assert len(np.unique(labels[:40])) == 1
        assert labels[0] != labels[40]

    def test_bounds_sorted_by_size(self):
        rng = np.random.RandomState(1)
        big = rng.rand(100, 3) + 10.0
        small = rng.rand(20, 3)
        pts = np.concatenate([small, big])
        labels = np.array([0] * 20 + [1] * 100)
        boxes = bounds_as_sorted_list(pts, labels)
        assert len(boxes) == 2
        # largest cluster first (segmenter.py:102-112)
        assert boxes[0][0, 0] >= 9.0       # big cluster's min corner
        assert boxes[1][1, 0] <= 1.5       # small cluster's max corner


class TestPlyAndNormals:
    def test_estimate_normals_plane(self):
        from cropnerf_tpu.export.pointcloud import estimate_normals
        rng = np.random.RandomState(0)
        pts = np.zeros((200, 3), np.float32)
        pts[:, :2] = rng.rand(200, 2)          # z=0 plane
        nrm = estimate_normals(pts, k=8,
                               orient_towards=np.array([0.5, 0.5, 1.0]))
        # all normals ≈ +z (oriented towards the viewpoint above the plane)
        assert (nrm[:, 2] > 0.99).all()
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                                   rtol=1e-5)

    def test_estimate_normals_scales(self):
        """The vectorised path must not fall back to per-point Python work:
        50k points should run in well under a second-per-thousand."""
        import time
        from cropnerf_tpu.export.pointcloud import estimate_normals
        rng = np.random.RandomState(1)
        pts = rng.rand(50_000, 3).astype(np.float32)
        t0 = time.perf_counter()
        nrm = estimate_normals(pts, k=10)
        dt = time.perf_counter() - t0
        assert nrm.shape == pts.shape and np.isfinite(nrm).all()
        assert dt < 30.0, f"normals took {dt:.1f}s for 50k points"

    def test_ply_vertex_count_header_only(self, tmp_path):
        from cropnerf_tpu.export.ply import ply_vertex_count, write_ply
        pts = np.random.RandomState(0).rand(37, 3).astype(np.float32)
        p = tmp_path / "c.ply"
        write_ply(p, pts, normals=np.ones_like(pts))
        assert ply_vertex_count(p) == 37

    def test_write_read_roundtrip_with_normals(self, tmp_path):
        from cropnerf_tpu.export.ply import read_ply, write_ply
        pts = np.random.RandomState(2).rand(11, 3).astype(np.float32)
        cols = np.random.RandomState(3).randint(0, 255, (11, 3), np.uint8)
        nrm = np.tile(np.array([[0, 0, 1.0]], np.float32), (11, 1))
        p = tmp_path / "n.ply"
        write_ply(p, pts, cols, normals=nrm)
        rp, rc = read_ply(p)
        np.testing.assert_allclose(rp, pts, rtol=1e-6)
        np.testing.assert_array_equal(rc, cols)


class TestParallelHelpers:
    def test_pad_to_multiple(self):
        from cropnerf_tpu.parallel.mesh import pad_to_multiple
        assert pad_to_multiple(10, 8) == 16
        assert pad_to_multiple(16, 8) == 16
        assert pad_to_multiple(1, 8) == 8

    def test_make_mesh_all_devices(self):
        import jax
        from cropnerf_tpu.parallel.mesh import DATA_AXIS, make_mesh
        mesh = make_mesh()
        assert mesh.axis_names == (DATA_AXIS,)
        assert mesh.devices.size == len(jax.devices())

    def test_single_host_slice_and_info(self):
        from cropnerf_tpu.parallel.dist import local_batch_slice, process_info
        info = process_info()
        assert info["process_count"] == 1 and info["process_index"] == 0
        assert local_batch_slice(64) == slice(0, 64)

    def test_device_trace_writes(self, tmp_path):
        import jax.numpy as jnp
        from cropnerf_tpu.utils.profiling import device_trace
        with device_trace(tmp_path / "trace"):
            _ = (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
        files = list((tmp_path / "trace").rglob("*"))
        assert files, "profiler trace produced no files"


class TestFlopsAccounting:
    """utils/flops.py: the MFU denominator must be auditable by hand."""

    def test_tiny_mlp_hand_count(self):
        from cropnerf_tpu.utils.flops import _mlp_dims, _mlp_flops
        # [4 -> 8 -> 2]: 2*(4*8) + 2*(8*2) = 96
        assert _mlp_flops(_mlp_dims(4, 8, 2, 2)) == 96
        # single layer [5 -> 3]: 2*15 = 30
        assert _mlp_flops(_mlp_dims(5, 0, 3, 1)) == 30

    def test_flagship_field_hand_count(self):
        from cropnerf_tpu.models.config import PRESETS
        from cropnerf_tpu.utils.flops import field_flops_per_sample
        f = PRESETS["cropnerf-mxu"].model.field
        # vanilla 8x256 trunk: encode 2*3*63; base [63,256,256,256,256];
        # top [256+63,256,256,256,16]; color [15+27+32,64,3];
        # sem [15,64,1]
        expect = (2 * 3 * 63
                  + 2 * (63 * 256 + 256 * 256 * 3)
                  + 2 * (319 * 256 + 256 * 256 * 2 + 256 * 16)
                  + 2 * (74 * 64 + 64 * 3)
                  + 2 * (15 * 64 + 64 * 1))
        assert field_flops_per_sample(f) == expect

    def test_table_rows_hash_preset(self):
        from cropnerf_tpu.models.config import PRESETS
        from cropnerf_tpu.utils.flops import train_step_flops
        d = train_step_flops(PRESETS["cropnerf"])
        # 4096 rays * (48*16*8 field + (256+96)*5*8 props) corner gathers
        assert d["table_rows_per_step"] == 4096 * (48 * 16 * 8
                                                   + (256 + 96) * 5 * 8)

    def test_no_grad_schedule_amortises_prop_bwd(self):
        import dataclasses
        from cropnerf_tpu.models.config import PRESETS
        from cropnerf_tpu.utils.flops import train_step_flops
        cfg = PRESETS["cropnerf"]
        on = train_step_flops(cfg)  # schedule on (update_every=5)
        off = train_step_flops(dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, proposal_no_grad_schedule=False)))
        assert on["model_flops_per_step"] < off["model_flops_per_step"]
        delta = off["model_flops_per_step"] - on["model_flops_per_step"]
        assert abs(delta - on["prop_fwd_flops"] * (2 - 2 / 5)) < 1.0

    def test_mfu_math(self):
        from cropnerf_tpu.utils.flops import mfu
        m = mfu(80e12 * 0.010, 0.010, peak_tflops=80.0)
        assert abs(m["tflops_per_s"] - 80.0) < 1e-9
        assert abs(m["mfu_vs_measured_peak"] - 1.0) < 1e-9

    def test_speed_of_light_flagship(self):
        """SOL = fwd+bwd FLOPs at each component's own shape ceiling:
        field (trunk256, 43.6 TFLOP/s) + prop (prop64, 12.6) must
        reproduce the hand sum, and the q-preset's 128-wide props must
        pick the prop128 ceiling."""
        from cropnerf_tpu.models.config import PRESETS
        from cropnerf_tpu.utils.flops import (speed_of_light,
                                              train_step_flops)
        cfg = PRESETS["cropnerf-mxu"]
        fl = train_step_flops(cfg)
        sol = speed_of_light(cfg)
        field = 3.0 * fl["field_fwd_flops"]
        prop = fl["model_flops_per_step"] - field
        hand_ms = (field / 43.6e12 + prop / 12.6e12) * 1e3
        assert abs(sol["sol_ms"] - hand_ms) < 1e-9
        assert sol["field_ceiling_tflops"] == 43.6
        assert sol["prop_ceiling_tflops"] == 12.6
        q = speed_of_light(PRESETS["cropnerf-mxu-q"])
        assert q["prop_ceiling_tflops"] == 9.1
