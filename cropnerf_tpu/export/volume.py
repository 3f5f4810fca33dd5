"""Orthographic semantic volume export → thresholded point clouds.

TPU-native equivalent of the reference's export path
(/root/reference/crop_nerf/fruit_nerf/scripts/exporter.py:65-122 +
export/exporter_utils.py:47-258 + data/fruit_datamanager.py:71-172 +
components/ray_generators.py:24-66):

  * a grid of parallel rays enters one AABB face and traverses the box
    (counts aspect-scaled per side, ``num_points_per_side`` on the constant
    axis);
  * each fixed-size ray batch is evaluated by the jitted raw-sample forward
    (:func:`cropnerf_tpu.models.model.forward_export` — uniform sampler with
    noise, AABB normalisation, no compositing);
  * per-sample thresholds select points (exporter_utils.py:110-114:
    semantic logit >= 3 ∧ density >= 70 → semantic.ply; sigmoid >= 0.999 ∧
    density → semantic_colormap.ply; density alone → density.ply);
  * device does dense evaluation + masking; only the (small) surviving
    points cross to the host each batch.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import RayBundle
from ..models.config import ModelConfig
from ..models.model import forward_export
from .ply import write_ply

# exporter_utils.py:110-114 thresholds.  The reference's per-sample
# ``semantics_colormap`` is ALREADY binarised at sigmoid>=0.9
# (heaviside, fruit_nerf.py:488-491), so its ``>= 0.999`` filter on that
# binary map is equivalent to sigmoid >= 0.9 on the raw logits — which is
# what we apply here.
SEMANTIC_LOGIT_THRESHOLD = 3.0
DENSITY_THRESHOLD = 70.0
COLORMAP_THRESHOLD = 0.9


def orthographic_ray_grid(aabb: np.ndarray, n_per_side: int, axis: int = 2
                          ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Parallel-ray grid entering the ``axis``-min face of the AABB.

    Returns (origins [M,3], direction [3], far).  Ray counts on the two free
    axes are aspect-scaled: count_i = extent_i / extent_axis * n
    (fruit_datamanager.py:96-104).
    """
    aabb = np.asarray(aabb, np.float32)
    extent = aabb[1] - aabb[0]
    free = [i for i in range(3) if i != axis]
    counts = [max(2, int(extent[i] / extent[axis] * n_per_side)) for i in free]
    lin = [np.linspace(aabb[0][i], aabb[1][i], c, dtype=np.float32)
           for i, c in zip(free, counts)]
    g0, g1 = np.meshgrid(lin[0], lin[1], indexing="ij")
    origins = np.zeros((g0.size, 3), np.float32)
    origins[:, free[0]] = g0.ravel()
    origins[:, free[1]] = g1.ravel()
    origins[:, axis] = aabb[0][axis]
    direction = np.zeros((3,), np.float32)
    direction[axis] = 1.0
    return origins, direction, float(extent[axis])


@dataclasses.dataclass
class ExportedCloud:
    points: np.ndarray
    colors: np.ndarray
    alpha: np.ndarray


def sample_volume(params, model_cfg: ModelConfig, aabb: np.ndarray,
                  num_points_per_side: int = 3000,
                  rays_per_batch: int = 512,
                  num_samples: Optional[int] = None,
                  render_rgb: bool = False,
                  axis: int = 2,
                  seed: int = 0,
                  semantic_threshold: float = SEMANTIC_LOGIT_THRESHOLD,
                  density_threshold: float = DENSITY_THRESHOLD,
                  colormap_threshold: float = COLORMAP_THRESHOLD
                  ) -> Dict[str, ExportedCloud]:
    """Dense volume sampling → {"semantic", "semantic_colormap", "density"}
    clouds in the dataparser (scaled) frame."""
    num_samples = num_samples or num_points_per_side
    origins_np, dir_np, far = orthographic_ray_grid(aabb, num_points_per_side,
                                                    axis)
    aabb_j = jnp.asarray(aabb, jnp.float32)
    B = rays_per_batch

    @jax.jit
    def run_chunk(origins, key):
        rb = RayBundle(
            origins=origins,
            directions=jnp.broadcast_to(jnp.asarray(dir_np), origins.shape),
            nears=jnp.zeros((B,)), fars=jnp.full((B,), far),
            camera_idx=jnp.zeros((B,), jnp.int32))
        out = forward_export(params, rb, model_cfg, num_samples, aabb_j,
                             key=key, render_rgb_samples=render_rgb)
        density = out["density"].reshape(-1)
        sem = out["semantics"].reshape(-1)
        pts = out["point_location"].reshape(-1, 3)
        rgb = (out["rgb"].reshape(-1, 3) if render_rgb
               else jnp.zeros((pts.shape[0], 3)))
        sig = jax.nn.sigmoid(sem)
        mask_den = density >= density_threshold
        return {
            "pts": pts, "rgb": rgb, "sig": sig,
            "mask_semantic": (sem >= semantic_threshold) & mask_den,
            "mask_colormap": (sig >= colormap_threshold) & mask_den,
            "mask_density": mask_den,
        }

    clouds = {k: {"points": [], "colors": [], "alpha": []}
              for k in ("semantic", "semantic_colormap", "density")}
    key = jax.random.PRNGKey(seed)
    n_rays = origins_np.shape[0]
    for start in range(0, n_rays, B):
        chunk = origins_np[start:start + B]
        if chunk.shape[0] < B:               # pad the tail to the static size
            pad = np.repeat(chunk[-1:], B - chunk.shape[0], axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        key, sub = jax.random.split(key)
        out = jax.device_get(run_chunk(jnp.asarray(chunk), sub))
        for name, mask_key in (("semantic", "mask_semantic"),
                               ("semantic_colormap", "mask_colormap"),
                               ("density", "mask_density")):
            m = out[mask_key]
            if not m.any():
                continue
            clouds[name]["points"].append(out["pts"][m])
            color = out["rgb"][m] if render_rgb else np.repeat(
                out["sig"][m][:, None], 3, axis=1)
            clouds[name]["colors"].append(color)
            clouds[name]["alpha"].append(out["sig"][m])

    result = {}
    for name, acc in clouds.items():
        if acc["points"]:
            result[name] = ExportedCloud(
                points=np.concatenate(acc["points"]),
                colors=np.concatenate(acc["colors"]),
                alpha=np.concatenate(acc["alpha"]))
        else:
            result[name] = ExportedCloud(
                points=np.zeros((0, 3), np.float32),
                colors=np.zeros((0, 3), np.float32),
                alpha=np.zeros((0,), np.float32))
    return result


def unscale_points(points: np.ndarray, dataparser_scale: float,
                   factor: float = 2.0) -> np.ndarray:
    """Undo the dataparser pose scaling for exported clouds.

    The reference scales exported clouds by 1/scale and then by 2
    (exporter_utils.py:184-192) — the ×2 is part of its artifact convention
    and the downstream segmenter/merger operate in that frame, so we
    reproduce it for artifact parity.
    """
    return points * (factor / dataparser_scale)


def export_and_write(params, model_cfg: ModelConfig, aabb: np.ndarray,
                     output_dir: Path, dataparser_scale: float = 1.0,
                     **kwargs) -> Dict[str, Path]:
    """Sample the volume and write semantic.ply / semantic_colormap.ply /
    density.ply (scripts/exporter.py:115-122 artifact layout)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    clouds = sample_volume(params, model_cfg, aabb, **kwargs)
    paths = {}
    for name, cloud in clouds.items():
        p = output_dir / f"{name}.ply"
        pts = unscale_points(cloud.points, dataparser_scale)
        write_ply(p, pts, cloud.colors, cloud.alpha)
        paths[name] = p
    return paths
