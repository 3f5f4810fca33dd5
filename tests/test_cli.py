"""CLI surface test: train → export → segment → count via cli.main()."""
import json

import numpy as np
import pytest

from cropnerf_tpu import cli

from test_trainer import write_synthetic_dataset


class TestCli:
    def test_train_export_segment(self, tmp_path, capsys):
        ds = write_synthetic_dataset(tmp_path / "ds", n=6, size=32)
        run = tmp_path / "run"
        cli.main(["train", "--method", "cropnerf-tiny", "--data", str(ds),
                  "--output", str(run), "--max-steps", "25",
                  "--train-split-fraction", "0.8"])
        out = capsys.readouterr().out
        assert (run / "run_config.json").exists()
        assert (run / "checkpoints").exists()
        metrics = json.loads(out.strip().splitlines()[-1])
        assert np.isfinite(metrics["loss"])

        cli.main(["export", "--run-dir", str(run),
                  "--num-points-per-side", "12", "--rays-per-batch", "16"])
        out = capsys.readouterr().out
        paths = json.loads(out.strip().splitlines()[-1])
        assert set(paths) == {"semantic", "semantic_colormap", "density"}

        # depth-based export (≙ ns-export pointcloud, README.md:125)
        cli.main(["export-pointcloud", "--run-dir", str(run),
                  "--num-points", "200", "--rays-per-batch", "256",
                  "--all-points", "--accumulation-threshold", "0.1",
                  "--keep-outliers", "--normals-k", "5"])
        out = capsys.readouterr().out
        res = json.loads(out.strip().splitlines()[-1])
        pc = run / "exports" / "semantics_pc.ply"
        assert res["semantics_pc"] == str(pc) and pc.exists()
        from cropnerf_tpu.export.ply import read_ply
        pts, _ = read_ply(pc)
        assert len(pts) == res["num_points"] > 0
        header = pc.read_bytes()[:400].decode("ascii", "ignore")
        assert "property float nx" in header   # normals written

        # orbit render + camera-pose export (≙ ns-render / ExportCameraPoses)
        cli.main(["render", "--run-dir", str(run), "--n-frames", "2",
                  "--size", "24", "--export-cameras"])
        out = capsys.readouterr().out.strip().splitlines()
        campaths = json.loads(out[0])
        for split in ("train", "eval"):
            tj = json.loads(open(campaths[split]).read())
            assert len(tj["frames"]) > 0
            mat = np.array(tj["frames"][0]["transform"])
            assert mat.shape == (4, 4) and np.isfinite(mat).all()
        from pathlib import Path as _P
        orbit = _P(out[-1])
        assert orbit.exists()   # mp4, or PNG frame dir fallback

        # synthesise a cloud so segment has something regardless of the
        # 25-step model's export quality
        from cropnerf_tpu.export.ply import write_ply
        rng = np.random.RandomState(0)
        pts = np.concatenate([
            rng.randn(400, 3).astype(np.float32) * 0.01,
            rng.randn(400, 3).astype(np.float32) * 0.01 + 0.5])
        write_ply(run / "exports" / "semantic.ply", pts)
        cli.main(["segment", "--pcd-dir", str(run / "exports"),
                  "--vx-size", "0.01"])
        assert (run / "exports" / "all_super_cluster_info_nsub_2.npy").exists()
        info = np.load(run / "exports" / "all_super_cluster_info_nsub_2.npy",
                       allow_pickle=True)
        assert len(info) == 2

    def test_process_labels(self, tmp_path, capsys):
        from PIL import Image
        seg = tmp_path / "seg"
        seg.mkdir()
        img = np.zeros((16, 16, 3), np.uint8)
        img[2:6, 2:6] = [255, 0, 0]
        img[10:14, 10:14] = [0, 255, 0]
        Image.fromarray(img).save(seg / "frame_0000.png")
        out = tmp_path / "labels"
        cli.main(["process-labels", "--seg-dir", str(seg),
                  "--out-dir", str(out)])
        lab = np.asarray(Image.open(out / "label_frame_0000.png"))
        assert set(np.unique(lab)) == {0, 1, 2}
