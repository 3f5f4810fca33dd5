"""COLMAP model → transforms.json converter (data/colmap.py, ≙ the
reference dataset builder's COLMAP step, fruit_nerf_dataset.py:342-378)."""
import json
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from cropnerf_tpu.data.colmap import (APPLIED_TRANSFORM, colmap_pose_to_c2w,
                                      colmap_to_transforms, qvec_to_rotmat,
                                      read_model, rotmat_to_qvec)


def random_pose(rng):
    """Random world→camera rotation+translation (COLMAP convention)."""
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.randn(3)
    return Q, t


def write_text_model(d: Path, poses, intr=(100.0, 120.0, 32.0, 24.0)):
    fx, fy, cx, cy = intr
    (d / "cameras.txt").write_text(
        "# cameras\n"
        f"1 OPENCV 64 48 {fx} {fy} {cx} {cy} 0.01 -0.002 0.0 0.0\n")
    lines = ["# images"]
    for i, (R, t) in enumerate(poses):
        q = rotmat_to_qvec(R)
        lines.append(
            f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
            f"{t[0]} {t[1]} {t[2]} 1 frame_{i:04d}.png")
        lines.append("")  # empty 2D-points line
    (d / "images.txt").write_text("\n".join(lines) + "\n")


def write_binary_model(d: Path, poses, intr=(100.0, 120.0, 32.0, 24.0)):
    fx, fy, cx, cy = intr
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 4, 64, 48))      # OPENCV model id 4
        f.write(struct.pack("<8d", fx, fy, cx, cy, 0.01, -0.002, 0.0, 0.0))
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(poses)))
        for i, (R, t) in enumerate(poses):
            q = rotmat_to_qvec(R)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"frame_{i:04d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))                 # 2 dummy 2D points
            f.write(struct.pack("<ddq", 0.0, 0.0, -1) * 2)


class TestQuaternions:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            R, _ = random_pose(rng)
            np.testing.assert_allclose(qvec_to_rotmat(rotmat_to_qvec(R)), R,
                                       atol=1e-10)


class TestPoseConversion:
    def test_camera_center_preserved_up_to_world_rotation(self):
        rng = np.random.RandomState(1)
        R, t = random_pose(rng)
        c2w = colmap_pose_to_c2w(rotmat_to_qvec(R), t)
        center_colmap = -R.T @ t
        A = np.concatenate([APPLIED_TRANSFORM, [[0, 0, 0, 1]]], 0)
        np.testing.assert_allclose(c2w[:3, 3], (A[:3, :3] @ center_colmap),
                                   atol=1e-10)

    def test_opengl_axes(self):
        """COLMAP camera z looks forward (OpenCV); after conversion the
        camera -z must look the same world direction (OpenGL)."""
        rng = np.random.RandomState(2)
        R, t = random_pose(rng)
        c2w = colmap_pose_to_c2w(rotmat_to_qvec(R), t)
        look_cv = R.T @ np.array([0, 0, 1.0])       # world forward, colmap
        A = np.concatenate([APPLIED_TRANSFORM, [[0, 0, 0, 1]]], 0)
        look_gl = c2w[:3, :3] @ np.array([0, 0, -1.0])
        np.testing.assert_allclose(look_gl, A[:3, :3] @ look_cv, atol=1e-10)


class TestModelIO:
    @pytest.mark.parametrize("writer", [write_text_model, write_binary_model])
    def test_read_model_roundtrip(self, tmp_path, writer):
        rng = np.random.RandomState(3)
        poses = [random_pose(rng) for _ in range(4)]
        writer(tmp_path, poses)
        cams, images = read_model(tmp_path)
        assert len(cams) == 1 and len(images) == 4
        assert cams[1].model == "OPENCV"
        np.testing.assert_allclose(cams[1].params[:4],
                                   [100.0, 120.0, 32.0, 24.0])
        for i, (R, t) in enumerate(poses):
            img = images[i + 1]
            np.testing.assert_allclose(qvec_to_rotmat(img.qvec), R, atol=1e-9)
            np.testing.assert_allclose(img.tvec, t, atol=1e-12)
            assert img.name == f"frame_{i:04d}.png"

    def test_text_binary_identical_transforms(self, tmp_path):
        rng = np.random.RandomState(4)
        poses = [random_pose(rng) for _ in range(3)]
        dt, db = tmp_path / "text", tmp_path / "bin"
        dt.mkdir(), db.mkdir()
        write_text_model(dt, poses)
        write_binary_model(db, poses)
        mt = colmap_to_transforms(dt, tmp_path / "t.json")
        mb = colmap_to_transforms(db, tmp_path / "b.json")
        for ft, fb in zip(mt["frames"], mb["frames"]):
            np.testing.assert_allclose(ft["transform_matrix"],
                                       fb["transform_matrix"], atol=1e-9)


class TestTransformsOutput:
    def test_dataparser_consumes_output(self, tmp_path):
        """The emitted transforms.json parses through the 3DCotton
        dataparser with per-frame intrinsics/distortion intact."""
        from PIL import Image
        from cropnerf_tpu.data.dataparser import (DataparserConfig,
                                                  parse_transforms)
        rng = np.random.RandomState(5)
        poses = [random_pose(rng) for _ in range(6)]
        write_text_model(tmp_path, poses)
        (tmp_path / "images").mkdir()
        (tmp_path / "semantics").mkdir()
        for i in range(6):
            img = Image.fromarray(np.zeros((48, 64, 3), np.uint8))
            img.save(tmp_path / "images" / f"frame_{i:04d}.png")
        meta = colmap_to_transforms(
            tmp_path, tmp_path / "transforms.json",
            semantic_rel_dir="semantics", semantic_classes=["stuff", "cotton"])
        assert meta["semantics"] == ["stuff", "cotton"]
        assert all("semantic_path" in f for f in meta["frames"])
        out = parse_transforms(
            DataparserConfig(data_dir=tmp_path, train_split_fraction=0.99),
            "train")
        assert len(out.image_paths) >= 5
        np.testing.assert_allclose(out.fx[0], 100.0)
        np.testing.assert_allclose(out.fy[0], 120.0)
        assert np.abs(out.distortion).max() > 0          # k1/k2 threaded

    def test_cli_import_colmap(self, tmp_path):
        rng = np.random.RandomState(6)
        write_text_model(tmp_path, [random_pose(rng) for _ in range(2)])
        out = tmp_path / "transforms.json"
        r = subprocess.run(
            [sys.executable, "-m", "cropnerf_tpu.cli", "import-colmap",
             "--colmap-dir", str(tmp_path), "--output", str(out),
             "--semantic-rel-dir", "semantics", "--semantic-ext", ".png"],
            capture_output=True, text=True,
            env={**__import__("os").environ, "CROPNERF_PLATFORM": "cpu"})
        assert r.returncode == 0, r.stderr
        meta = json.loads(out.read_text())
        assert len(meta["frames"]) == 2
        assert meta["frames"][0]["semantic_path"].startswith("semantics/")
