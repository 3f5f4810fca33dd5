"""Depth-based point-cloud export from rendered training rays.

Equivalent of the reference's nerfacto-style exporter
(/root/reference/crop_nerf/fruit_nerf/export/exporter_utils_nerfacto.py:83-227
+ debug/exporter_nerfacto.py:99-146, the ``ns-export pointcloud
--num-points 10000000`` path of README.md:125): render random training-view
ray batches, place a point at origin + direction * depth, keep rays whose
semantic colormap is positive when ``only_semantics``, then remove
statistical outliers.  Normals (estimate/reorient) are PCA over k-NN.

TPU-first: ray batches are sampled and rendered fully on device via the same
jitted forward as training; only surviving points stream to the host.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import generate_rays, near_far_collider
from ..core.rays import RayBundle
from ..counting.clustering import statistical_outlier_removal
from ..data.databank import PixelBank, decode_pixel_index
from ..models.config import ModelConfig
from ..models.model import forward
from .ply import write_ply


def generate_point_cloud(params, model_cfg: ModelConfig, bank: PixelBank,
                         num_points: int = 1_000_000,
                         rays_per_batch: int = 16384,
                         only_semantics: bool = True,
                         semantic_threshold: float = 0.5,
                         accumulation_threshold: float = 0.5,
                         remove_outliers: bool = True,
                         std_ratio: float = 10.0,
                         seed: int = 0,
                         max_batches: int = 2000,
                         mesh=None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (points [N,3], colors [N,3] float) in the dataparser frame.

    ``mesh`` (1-D ``data`` axis): each batch's rays shard over the mesh —
    same contract as the other mesh-sharded inference paths."""

    def shard_rays(x):
        if mesh is None:
            return x
        if x.shape[0] % mesh.size != 0:
            from ..parallel.mesh import warn_unsharded
            warn_unsharded("export-pointcloud", x.shape[0], mesh.size)
            return x
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data")))

    @jax.jit
    def run_batch(params, key):
        idx = shard_rays(
            jax.random.randint(key, (rays_per_batch,), 0, bank.num_pixels))
        cam, px, py = decode_pixel_index(idx, bank.height, bank.width)
        origins, dirs = generate_rays(bank.cameras, cam, px, py)
        rb = RayBundle(origins=origins, directions=dirs,
                       nears=jnp.zeros((rays_per_batch,)),
                       fars=jnp.ones((rays_per_batch,)),
                       camera_idx=cam)
        rb = near_far_collider(rb, model_cfg.near_plane, model_cfg.far_plane)
        out = forward(params, rb, model_cfg, key=None, train=False)
        depth = out["depth"][..., 0]
        pts = origins + dirs * depth[..., None]
        keep = out["accumulation"][..., 0] > accumulation_threshold
        if only_semantics:
            keep = keep & (out["semantics_colormap"][..., 0]
                           > semantic_threshold)
        return pts, out["rgb"], keep

    key = jax.random.PRNGKey(seed)
    points, colors = [], []
    total = 0
    for _ in range(max_batches):
        key, sub = jax.random.split(key)
        pts, rgb, keep = jax.device_get(run_batch(params, sub))
        points.append(pts[keep])
        colors.append(rgb[keep])
        total += int(keep.sum())
        if total >= num_points:
            break
    if not points:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    pts = np.concatenate(points)[:num_points]
    cols = np.concatenate(colors)[:num_points]
    if remove_outliers and len(pts) > 50:
        keep = statistical_outlier_removal(pts, 20, std_ratio)
        pts, cols = pts[keep], cols[keep]
    return pts.astype(np.float32), cols.astype(np.float32)


def estimate_normals(points: np.ndarray, k: int = 10,
                     orient_towards: Optional[np.ndarray] = None
                     ) -> np.ndarray:
    """PCA normal estimation over k-NN (Open3D estimate_normals +
    orient_normals semantics, exporter_utils_nerfacto.py:203-225).

    Fully vectorised — one parallel KD-tree query, a batched covariance
    einsum and ONE stacked [N,3,3] eigendecomposition — so it scales to the
    10M-point exports the CLI documents (a per-point Python loop would take
    hours there)."""
    from scipy.spatial import cKDTree
    pts = np.asarray(points, np.float64)
    tree = cKDTree(pts)
    _, nbrs = tree.query(pts, k=k + 1, workers=-1)
    nb = pts[nbrs[:, 1:]]                       # [N, k, 3]
    nb = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nb, nb) / max(k - 1, 1)   # [N, 3, 3]
    _, vecs = np.linalg.eigh(cov)               # ascending eigenvalues
    normals = vecs[..., 0].astype(np.float32)   # smallest-variance axis
    if orient_towards is not None:
        to_view = orient_towards[None, :] - points
        flip = np.sum(normals * to_view, axis=1) < 0
        normals[flip] *= -1
    n = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.maximum(n, 1e-12)


def export_depth_pointcloud(params, model_cfg: ModelConfig, bank: PixelBank,
                            output_path: Path,
                            normals_k: Optional[int] = None,
                            scale_factor: float = 1.0,
                            **kwargs) -> Path:
    """Write ``semantics_pc.ply`` (debug/exporter_nerfacto.py:99-146).

    ``normals_k``: when set, estimate PCA normals over k-NN and store them
    as nx/ny/nz (exporter_utils_nerfacto.py:203-225 estimate/orient step;
    oriented towards the cloud centroid's +z viewpoint like the reference's
    camera-orient pass).  ``scale_factor`` multiplies points on write (the
    CLI passes 2/dataparser_scale for ``--unscale`` artifact parity)."""
    pts, cols = generate_point_cloud(params, model_cfg, bank, **kwargs)
    normals = None
    if normals_k:
        if len(pts) > normals_k + 1:
            centroid = (pts.mean(axis=0)
                        + np.array([0.0, 0.0, 1.0], np.float32))
            normals = estimate_normals(pts, k=normals_k,
                                       orient_towards=centroid)
        else:
            import warnings
            warnings.warn(
                f"normals requested (k={normals_k}) but the cloud has only "
                f"{len(pts)} points — writing the PLY WITHOUT nx/ny/nz",
                stacklevel=2)
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    write_ply(output_path, pts * scale_factor, cols, normals=normals)
    return output_path
