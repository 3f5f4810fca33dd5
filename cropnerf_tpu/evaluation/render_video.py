"""Orbit-camera video rendering + camera-pose export.

Equivalents of /root/reference/crop_nerf/evaluation/generate_video.py:17-158
(orbit mp4 writer) and export/exporter_utils_nerfacto.py:290-357
(``collect_camera_poses`` with camera-optimizer-adjusted transforms →
transforms_train/eval.json).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.cameras import Cameras
from ..models.camera_opt import exp_so3
from ..models.config import TrainConfig
from ..train.step import make_render_fn


def orbit_cameras(n_frames: int, radius: float = 1.2, height: float = 0.3,
                  center=(0.0, 0.0, 0.0), focal: float = 400.0,
                  width: int = 400, image_height: int = 400) -> Cameras:
    """Cameras on a circle looking at ``center`` (OpenGL convention)."""
    c2ws = []
    ctr = np.asarray(center, np.float64)
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        eye = ctr + np.array([radius * np.cos(theta),
                              radius * np.sin(theta), height])
        fwd = ctr - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        R = np.stack([right, true_up, -fwd], axis=1)
        c2ws.append(np.concatenate([R, eye[:, None]], axis=1))
    n = n_frames
    return Cameras(
        c2w=jnp.asarray(np.stack(c2ws), jnp.float32),
        fx=jnp.full((n,), focal), fy=jnp.full((n,), focal),
        cx=jnp.full((n,), width / 2.0), cy=jnp.full((n,), image_height / 2.0),
        width=jnp.full((n,), width, jnp.int32),
        height=jnp.full((n,), image_height, jnp.int32))


def render_orbit_video(params, cfg: TrainConfig, output_path: Path,
                       n_frames: int = 60, radius: float = 1.2,
                       center=(0.0, 0.0, 0.0), size: int = 400,
                       focal: float = 400.0, fps: int = 24,
                       channel: str = "rgb") -> Path:
    """Render an orbit around the scene → mp4 (falls back to a PNG frame
    directory if no video backend is available)."""
    cams = orbit_cameras(n_frames, radius=radius, center=center,
                         focal=focal, width=size, image_height=size)
    render = make_render_fn(cfg)
    frames = []
    for i in range(n_frames):
        out = render(params, cams, jnp.int32(i), size, size)
        img = np.asarray(out[channel])
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(output_path, frames, fps=fps)
    except Exception:
        frame_dir = output_path.with_suffix("")
        frame_dir.mkdir(parents=True, exist_ok=True)
        from PIL import Image
        for i, f in enumerate(frames):
            Image.fromarray(f).save(frame_dir / f"frame_{i:04d}.png")
        return frame_dir
    return output_path


def collect_camera_poses(cameras: Cameras,
                         pose_adjustment: Optional[jnp.ndarray] = None
                         ) -> list:
    """Per-frame camera-to-world transforms with the trained pose deltas
    applied (exporter_utils_nerfacto.py:290-357)."""
    c2w = np.asarray(cameras.c2w)
    n = c2w.shape[0]
    if pose_adjustment is not None:
        adj = np.asarray(pose_adjustment)[:n]
        R = np.asarray(exp_so3(jnp.asarray(adj[:, 3:])))
        c2w = c2w.copy()
        c2w[:, :, :3] = np.einsum("nij,njk->nik", R, c2w[:, :, :3])
        c2w[:, :, 3] = c2w[:, :, 3] + adj[:, :3]
    frames = []
    for i in range(n):
        mat = np.eye(4)
        mat[:3, :4] = c2w[i]
        frames.append({"file_path": f"frame_{i:05d}",
                       "transform": mat.tolist()})
    return frames


def export_camera_poses(run_dir: Path, cameras_train: Cameras,
                        cameras_eval: Cameras,
                        pose_adjustment: Optional[jnp.ndarray] = None
                        ) -> Dict[str, Path]:
    """Write transforms_train.json / transforms_eval.json
    (debug/exporter_nerfacto.py:151-176)."""
    run_dir = Path(run_dir)
    out = {}
    for split, cams in (("train", cameras_train), ("eval", cameras_eval)):
        frames = collect_camera_poses(
            cams, pose_adjustment if split == "train" else None)
        p = run_dir / f"transforms_{split}.json"
        p.write_text(json.dumps({"frames": frames}, indent=2))
        out[split] = p
    return out
