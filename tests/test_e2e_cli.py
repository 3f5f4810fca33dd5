"""Real-data dress rehearsal (VERDICT r1 #10): the full CLI chain a 3DCotton
run takes — import-colmap → train → export → segment → project → count —
driven through subprocesses exactly as a user would
(≙ README.md:112-137 end-to-end flow)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from synthetic import render_synthetic_images, ring_cameras  # noqa: E402

from cropnerf_tpu.data.colmap import rotmat_to_qvec  # noqa: E402


def c2w_to_colmap(c2w34: np.ndarray):
    """Invert data/colmap.py colmap_pose_to_c2w: OpenGL c2w → COLMAP
    (qvec, tvec) so the synthetic scene round-trips through a real COLMAP
    sparse model."""
    c2w = np.eye(4)
    c2w[:3, :4] = c2w34
    c2w[2, :] *= -1                      # undo nerfstudio world rotation
    c2w = c2w[np.array([1, 0, 2, 3]), :]  # row swap is an involution
    c2w[0:3, 1:3] *= -1                  # OpenGL → OpenCV camera axes
    w2c = np.linalg.inv(c2w)
    return rotmat_to_qvec(w2c[:3, :3]), w2c[:3, 3]


def write_colmap_scene(root: Path, n=8, size=40, focal=40.0):
    """images/ + semantics/ + a COLMAP text sparse model of the synthetic
    single-sphere scene, plus label images derived from the masks."""
    from PIL import Image
    root.mkdir(parents=True, exist_ok=True)
    (root / "images").mkdir()
    (root / "semantics").mkdir()
    (root / "labels").mkdir()
    cams = ring_cameras(n=n, height=size, width=size, focal=focal)
    images, masks = render_synthetic_images(cams, size, size)
    c2w = np.asarray(cams.c2w)
    img_lines = ["# images"]
    for i in range(n):
        name = f"frame_{i:04d}.png"
        Image.fromarray(images[i]).save(root / "images" / name)
        Image.fromarray(masks[i] * 255).save(root / "semantics" / name)
        Image.fromarray((masks[i] > 0).astype(np.uint8)).save(
            root / "labels" / f"label_{name}")
        q, t = c2w_to_colmap(c2w[i])
        img_lines.append(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                         f"{t[0]} {t[1]} {t[2]} 1 {name}")
        img_lines.append("")
    (root / "images.txt").write_text("\n".join(img_lines) + "\n")
    (root / "cameras.txt").write_text(
        "# cameras\n"
        f"1 PINHOLE {size} {size} {focal} {focal} {size / 2} {size / 2}\n")
    return root


def run_cli(*args):
    env = {**os.environ, "CROPNERF_PLATFORM": "cpu"}
    r = subprocess.run([sys.executable, "-m", "cropnerf_tpu.cli", *args],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout}\nSTDERR:{r.stderr}"
    return r.stdout


@pytest.mark.slow
class TestCliDressRehearsal:
    def test_colmap_to_count(self, tmp_path):
        ds = write_colmap_scene(tmp_path / "ds")
        run = tmp_path / "run"

        run_cli("import-colmap", "--colmap-dir", str(ds),
                "--output", str(ds / "transforms.json"),
                "--semantic-rel-dir", "semantics", "--semantic-ext", ".png")
        meta = json.loads((ds / "transforms.json").read_text())
        assert len(meta["frames"]) == 8

        run_cli("train", "--method", "cropnerf-tiny", "--data", str(ds),
                "--output", str(run), "--max-steps", "120",
                "--train-split-fraction", "0.8")
        assert (run / "checkpoints").exists()
        assert (run / "run_config.json").exists()
        # (eval-image PNG artifacts appear at steps_per_eval_image=500 —
        # beyond this 120-step smoke; covered by test_trainer.py)

        run_cli("export", "--run-dir", str(run),
                "--num-points-per-side", "24", "--rays-per-batch", "64",
                "--semantic-threshold", "1.0", "--density-threshold", "5.0",
                "--colormap-threshold", "0.7")
        run_cli("segment", "--pcd-dir", str(run / "exports"),
                "--vx-size", "0.01")
        run_cli("project", "--run-dir", str(run),
                "--pcd-dir", str(run / "exports"),
                "--label-dir", str(ds / "labels"))
        out = run_cli("count", "--projection-dir", str(run / "projection"),
                      "--pcd-dir", str(run / "exports"),
                      "--frame-sampling-interval", "1",
                      "--binary-threshold", "50", "--attach-unlabeled",
                      "--overlays")
        result = json.loads(out.strip().splitlines()[-1])
        # single synthetic sphere → one instance
        assert result["total_count"] == 1, out
        assert (run / "projection" / "super_cluster_0" / "overlay").exists()
