"""Per-subcluster semantic projections: occlusion-free + visibility passes.

Equivalent of the reference's projection stage
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:254-344 +
scripts/semantic_projection.py:100-171):

  for supercluster s, camera c, subcluster i:
    * rays clipped to the subcluster AABB; fewer than 10 hits → zero images;
    * WO-OCC pass: render the semantic output of the clipped rays (black
      background) → ``wo_occ_cluster_i.png`` (the reference saves the raw
      accumulated logits clamped to [0,1] via torchvision save_image —
      reproduced here);
    * VISIBILITY pass: rays from the camera to the box entry
      (fars ← nears, nears ← 0); accumulated density weight >= 0.5 marks the
      pixel occluded and zeroes it → ``visible_cluster_i.png``;
    * the GT instance-label image is copied into the camera directory.

TPU-first design: instead of the reference's jagged valid-ray gathering, the
AABB is projected to a pixel-space crop rectangle (padded to 128-multiples so
XLA sees a small, bucketed set of static shapes), and the whole crop is
rendered dense with a hit mask — no recompile per cluster, no host-side ray
compaction.
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.cameras import Cameras, generate_rays, ray_aabb_intersect
from ..core.rays import RayBundle
from ..models.config import ModelConfig
from ..models.model import forward, forward_accumulation

OCCLUSION_THRESHOLD = 0.5   # fruit_nerf.py:313
MIN_VALID_RAYS = 10         # fruit_nerf.py:293


def _project_aabb_to_crop(cameras: Cameras, cam_idx: int, aabb: np.ndarray,
                          height: int, width: int, pad: int = 8
                          ) -> Optional[Tuple[int, int, int, int]]:
    """Conservative pixel bbox of the AABB in the image (host-side)."""
    c2w = np.asarray(cameras.c2w[cam_idx])
    fx = float(cameras.fx[cam_idx]); fy = float(cameras.fy[cam_idx])
    cx = float(cameras.cx[cam_idx]); cy = float(cameras.cy[cam_idx])
    corners = np.array([[aabb[i][0], aabb[j][1], aabb[k][2]]
                        for i in range(2) for j in range(2) for k in range(2)])
    R, t = c2w[:, :3], c2w[:, 3]
    cam_pts = (corners - t) @ R          # world → camera (R orthonormal)
    z = -cam_pts[:, 2]
    if np.all(z <= 1e-6):
        return None
    z = np.maximum(z, 1e-6)
    xs = cam_pts[:, 0] / z * fx + cx
    ys = -cam_pts[:, 1] / z * fy + cy
    x0 = max(0, int(np.floor(xs.min())) - pad)
    x1 = min(width, int(np.ceil(xs.max())) + pad)
    y0 = max(0, int(np.floor(ys.min())) - pad)
    y1 = min(height, int(np.ceil(ys.max())) + pad)
    if x1 <= x0 or y1 <= y0:
        return None
    return x0, y0, x1, y1


def _bucket(n: int, q: int = 128) -> int:
    return max(q, ((n + q - 1) // q) * q)


class ClusterProjector:
    """Jit-cached projector over bucketed crop shapes."""

    def __init__(self, params, model_cfg: ModelConfig, cameras: Cameras,
                 height: int, width: int,
                 occlusion_threshold: float = OCCLUSION_THRESHOLD):
        self.params = params
        self.cfg = model_cfg
        self.cameras = cameras
        self.height = height
        self.width = width
        self.occlusion_threshold = occlusion_threshold
        self._fns = {}

    def _get_fn(self, n: int):
        """Jitted dual-pass render over a flat padded ray batch of size n."""
        if n in self._fns:
            return self._fns[n]
        cfg = self.cfg
        occ_thresh = self.occlusion_threshold

        @jax.jit
        def run(params, cameras, cam_idx, px, py, aabb):
            origins, dirs = generate_rays(cameras, cam_idx, px, py)
            nears, fars, hit = ray_aabb_intersect(origins, dirs, aabb)
            rb = RayBundle(origins=origins, directions=dirs, nears=nears,
                           fars=fars, camera_idx=cam_idx, mask=hit)
            out = forward(params, rb, cfg, key=None, train=False,
                          background="black")
            semantics = out["semantics"][..., 0] * hit
            # visibility pass: camera → box entry
            rb_vis = rb.replace(nears=jnp.zeros_like(nears),
                                fars=jnp.maximum(nears, 1e-4))
            acc = forward_accumulation(params, rb_vis, cfg)
            occluded = (acc >= occ_thresh) & (hit > 0)
            return semantics, occluded, hit

        self._fns[n] = run
        return run

    def project(self, cam_idx: int, aabb: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (wo_occ [H,W], visible [H,W]) float images in [0,1]."""
        H, W = self.height, self.width
        wo_occ = np.zeros((H, W), np.float32)
        visible = np.zeros((H, W), np.float32)
        crop = _project_aabb_to_crop(self.cameras, cam_idx, aabb, H, W)
        if crop is None:
            return wo_occ, visible
        x0, y0, x1, y1 = crop
        cw, ch = x1 - x0, y1 - y0
        n = _bucket(cw * ch)
        ys, xs = np.meshgrid(np.arange(y0, y1), np.arange(x0, x1),
                             indexing="ij")
        px = np.full((n,), x0, np.int32)
        py = np.full((n,), y0, np.int32)
        px[:cw * ch] = xs.ravel()
        py[:cw * ch] = ys.ravel()

        run = self._get_fn(n)
        cam = jnp.full((n,), cam_idx, jnp.int32)
        sem, occ, hit = jax.device_get(run(
            self.params, self.cameras, cam, jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(aabb, jnp.float32)))
        if hit[:cw * ch].sum() < MIN_VALID_RAYS:
            return wo_occ, visible
        sem_img = sem[:cw * ch].reshape(ch, cw)
        occ_img = occ[:cw * ch].reshape(ch, cw)
        # reference saves raw logits through save_image → clamp [0,1]
        sem_img = np.clip(sem_img, 0.0, 1.0)
        wo_occ[y0:y1, x0:x1] = sem_img
        vis_img = np.where(occ_img, 0.0, sem_img)
        visible[y0:y1, x0:x1] = vis_img
        return wo_occ, visible


def _save_gray(path: Path, img: np.ndarray) -> None:
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def run_projections(params, model_cfg: ModelConfig, cameras: Cameras,
                    height: int, width: int,
                    super_cluster_info: np.ndarray,
                    output_dir: Path,
                    label_paths: Optional[list] = None,
                    camera_indices: Optional[list] = None,
                    occlusion_threshold: float = OCCLUSION_THRESHOLD) -> Path:
    """Write the full projection tree
    ``super_cluster_{s}/cam_{c}/{wo_occ,visible}_cluster_{i}.png``
    (+ copied GT label images) consumed by the merger."""
    output_dir = Path(output_dir)
    n_cams = cameras.num_cameras
    cam_ids = camera_indices if camera_indices is not None else range(n_cams)
    projector = ClusterProjector(params, model_cfg, cameras, height,
                                 width, occlusion_threshold)

    for s, info in enumerate(super_cluster_info):
        aabbs = info["aabb"]
        for c in cam_ids:
            cam_dir = output_dir / f"super_cluster_{s}" / f"cam_{c}"
            cam_dir.mkdir(parents=True, exist_ok=True)
            for i in range(aabbs.shape[0]):
                wo_occ, visible = projector.project(int(c), aabbs[i])
                _save_gray(cam_dir / f"wo_occ_cluster_{i}.png", wo_occ)
                _save_gray(cam_dir / f"visible_cluster_{i}.png", visible)
            if label_paths is not None:
                lp = Path(label_paths[c])
                if lp.exists():
                    name = (lp.name if lp.name.startswith("label_")
                            else f"label_{lp.name}")
                    shutil.copy(lp, cam_dir / name)
    return output_dir
