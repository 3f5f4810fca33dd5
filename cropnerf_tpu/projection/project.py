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

Jobs are BATCHED per dispatch: all (supercluster, camera, subcluster) crops
sharing a bucket size render J-at-a-time as one flat ray batch (per-job
AABB clipping vmapped, the model forward sees one [J*n] bundle).  The
reference makes one model call + host transfer per job
(fruit_nerf.py:254-344 — thousands of round trips on real scenes); on a
tunneled TPU that is latency-bound, not compute-bound.
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

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


# Static geometric bucket ladder (~1.5x steps, all 128-multiples).  A full
# projection run compiles O(log) distinct crop shapes instead of one per
# 128-multiple of crop area — the remote-AOT compile tail dominated the
# dress-rehearsal projection stage (1392 s of 2174 s) when every (n, J)
# group compiled its own program (VERDICT r4 item 4).  Padding waste is
# bounded at 50% of rays (masked, hit=0).
_BUCKET_LADDER = (128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
                  6144, 8192, 12288, 16384, 24576, 32768, 49152, 65536,
                  98304, 131072)


def _bucket(n: int) -> int:
    for b in _BUCKET_LADDER:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128        # beyond the ladder (rare)


def _pow2_floor(x: int) -> int:
    return 1 << (max(x, 1).bit_length() - 1)


def _pow2_ceil(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length()


class ClusterProjector:
    """Jit-cached projector over bucketed crop shapes, batched per dispatch.

    ``rays_per_dispatch`` bounds J*n per device call: jobs sharing a bucket
    size n render ``J = max(1, rays_per_dispatch // n)`` at a time.  Each
    (n, J) pair compiles once per process (same count as the old per-n jit;
    the remote-AOT compile is the expensive part on tunneled setups).
    """

    def __init__(self, params, model_cfg: ModelConfig, cameras: Cameras,
                 height: int, width: int,
                 occlusion_threshold: float = OCCLUSION_THRESHOLD,
                 rays_per_dispatch: int = 262_144,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 max_samples_per_dispatch: int = 8_388_608):
        self.params = params
        self.cfg = model_cfg
        self.cameras = cameras
        self.height = height
        self.width = width
        self.occlusion_threshold = occlusion_threshold
        self.rays_per_dispatch = rays_per_dispatch
        # The REAL memory bound is samples, not rays: each ray evaluates
        # num_nerf + Σ proposal samples through the field, so a full-image
        # crop (e.g. 320x480 = 153.6k rays) at 400 samples/ray is 61M
        # samples — an HBM OOM on v5e (observed on the dress-rehearsal
        # scene).  Dispatches are bounded by max_samples_per_dispatch
        # (8M ≈ 1-2 GB of forward residuals) and crops larger than the
        # per-job ray cap are rendered in row segments and stitched.
        samples_per_ray = (model_cfg.num_nerf_samples_per_ray
                           + sum(model_cfg.num_proposal_samples_per_ray))
        self.max_rays_per_job = max(
            128, max_samples_per_dispatch // max(samples_per_ray, 1)
            // 128 * 128)
        # 1-D data mesh: the flat [J*n] ray batch of every dispatch shards
        # over it (params replicated) — bucket sizes are 128-multiples so
        # any power-of-two mesh divides them (third leg of VERDICT r3
        # item 5, after the render/export paths)
        self.mesh = mesh
        self._fns = {}

    def _get_fn(self, n: int, j: int):
        """Jitted dual-pass render over J stacked padded crops of n rays."""
        if (n, j) in self._fns:
            return self._fns[(n, j)]
        cfg = self.cfg
        occ_thresh = self.occlusion_threshold
        mesh = self.mesh

        def shard_rays(x):
            if mesh is None:
                return x
            if x.shape[0] % mesh.size != 0:
                from ..parallel.mesh import warn_unsharded
                warn_unsharded("project", x.shape[0], mesh.size)
                return x
            return jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")))

        @jax.jit
        def run(params, cameras, cam_idx, px, py, aabbs):
            # cam_idx/px/py: [J*n] flat; aabbs: [J, 2, 3]
            cam_idx, px, py = (shard_rays(cam_idx), shard_rays(px),
                               shard_rays(py))
            origins, dirs = generate_rays(cameras, cam_idx, px, py)
            nears, fars, hit = jax.vmap(ray_aabb_intersect)(
                origins.reshape(j, n, 3), dirs.reshape(j, n, 3), aabbs)
            nears, fars, hit = (nears.reshape(-1), fars.reshape(-1),
                                hit.reshape(-1))
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
            return (semantics.reshape(j, n), occluded.reshape(j, n),
                    hit.reshape(j, n))

        self._fns[(n, j)] = run
        return run

    def _j_cap(self, n: int) -> int:
        return _pow2_floor(max(1, min(self.rays_per_dispatch // n,
                                      self.max_rays_per_job // n)))

    def _j_for(self, n: int, count: int) -> int:
        """J is a power of two capped by the (static) dispatch budgets,
        shrunk only for small groups — so (n, J) comes from a small static
        set and recurring runs reuse cached compiles."""
        return min(self._j_cap(n), _pow2_ceil(count))

    def _plan(self, jobs: Sequence[Tuple[int, np.ndarray]]):
        """The SINGLE job-planning pass shared by ``precompile`` and
        ``iter_projections`` (keeping them bit-identical is what guarantees
        the warmup compiles exactly the programs the render loop runs):
        → (by_bucket {n: [(idx, cam, aabb, crop)...]}, oversized, zeros)."""
        H, W = self.height, self.width
        by_bucket, oversized, zeros = {}, [], []
        for idx, (cam_idx, aabb) in enumerate(jobs):
            crop = _project_aabb_to_crop(self.cameras, int(cam_idx),
                                         np.asarray(aabb), H, W)
            if crop is None:
                zeros.append(idx)
                continue
            x0, y0, x1, y1 = crop
            n_pix = (x1 - x0) * (y1 - y0)
            row = (idx, int(cam_idx), np.asarray(aabb, np.float32), crop)
            if n_pix > self.max_rays_per_job:
                oversized.append(row)
            else:
                # the ladder can overshoot the per-job ray cap near the
                # top; clamp to the (config-static, 128-multiple) cap so
                # the samples budget holds and the top bucket shares the
                # oversized program
                n = min(_bucket(n_pix), self.max_rays_per_job)
                by_bucket.setdefault(n, []).append(row)
        return by_bucket, oversized, zeros

    def precompile(self, jobs: Sequence[Tuple[int, np.ndarray]],
                   max_workers: int = 4) -> int:
        """AOT-compile every (n, J) program ``iter_projections(jobs)`` will
        need, issuing the lowers concurrently — the remote AOT service
        compiles independent programs in parallel, so a handful of threads
        collapses the serial compile tail into roughly one compile's
        latency.  Returns the number of distinct programs."""
        from concurrent.futures import ThreadPoolExecutor

        by_bucket, oversized, _ = self._plan(jobs)
        todo = [(n, self._j_for(n, len(group)))
                for n, group in by_bucket.items()]
        if oversized and (self.max_rays_per_job, 1) not in todo:
            todo.append((self.max_rays_per_job, 1))

        def _compile(nj):
            n, j = nj
            run = self._get_fn(n, j)
            # warmup must NEVER kill the run: remote compile services drop
            # connections transiently (observed: "response body closed
            # before all bytes were read" mid-fan-out) — retry, then fall
            # back to the render loop's lazy compile for that program
            import time as _t
            for attempt in range(3):
                try:
                    run.lower(
                        self.params, self.cameras,
                        jax.ShapeDtypeStruct((j * n,), jnp.int32),
                        jax.ShapeDtypeStruct((j * n,), jnp.int32),
                        jax.ShapeDtypeStruct((j * n,), jnp.int32),
                        jax.ShapeDtypeStruct((j, 2, 3),
                                             jnp.float32)).compile()
                    return
                except Exception as e:                # noqa: BLE001
                    if attempt == 2:
                        print(f"[project] warmup compile of (n={n}, J={j}) "
                              f"failed after 3 attempts ({e!r}) — the "
                              "render loop will compile it lazily",
                              flush=True)
                    else:
                        _t.sleep(2.0 * (attempt + 1))

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(_compile, todo))
        return len(todo)

    def iter_projections(self, jobs: Sequence[Tuple[int, np.ndarray]]
                         ) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        """Render ``(cam_idx, aabb)`` jobs, batched by bucket size.

        Yields ``(job_index, wo_occ [H,W], visible [H,W])`` exactly once per
        job, in batch-completion order (NOT input order) so the caller can
        stream results to disk without holding every full-size image.
        """
        H, W = self.height, self.width

        def _zero(idx):
            return idx, np.zeros((H, W), np.float32), \
                np.zeros((H, W), np.float32)

        by_bucket, oversized, zeros = self._plan(jobs)
        for idx in zeros:
            yield _zero(idx)

        for n, group in sorted(by_bucket.items()):
            J = self._j_for(n, len(group))
            run = self._get_fn(n, J)
            for at in range(0, len(group), J):
                batch = group[at:at + J]
                # pad the last batch by repeating its first job (discarded)
                padded = batch + [batch[0]] * (J - len(batch))
                px = np.zeros((J, n), np.int32)
                py = np.zeros((J, n), np.int32)
                cam = np.zeros((J, n), np.int32)
                boxes = np.zeros((J, 2, 3), np.float32)
                for b, (_, c, aabb, (x0, y0, x1, y1)) in enumerate(padded):
                    cw, ch = x1 - x0, y1 - y0
                    ys, xs = np.meshgrid(np.arange(y0, y1),
                                         np.arange(x0, x1), indexing="ij")
                    px[b, :] = x0
                    py[b, :] = y0
                    px[b, :cw * ch] = xs.ravel()
                    py[b, :cw * ch] = ys.ravel()
                    cam[b, :] = c
                    boxes[b] = aabb
                sem, occ, hit = jax.device_get(run(
                    self.params, self.cameras,
                    jnp.asarray(cam.reshape(-1)),
                    jnp.asarray(px.reshape(-1)), jnp.asarray(py.reshape(-1)),
                    jnp.asarray(boxes)))
                for b, (idx, _, _, (x0, y0, x1, y1)) in enumerate(batch):
                    cw, ch = x1 - x0, y1 - y0
                    if hit[b, :cw * ch].sum() < MIN_VALID_RAYS:
                        yield _zero(idx)
                        continue
                    sem_img = sem[b, :cw * ch].reshape(ch, cw)
                    occ_img = occ[b, :cw * ch].reshape(ch, cw)
                    # reference saves raw logits via save_image → clamp [0,1]
                    sem_img = np.clip(sem_img, 0.0, 1.0)
                    wo_occ = np.zeros((H, W), np.float32)
                    visible = np.zeros((H, W), np.float32)
                    wo_occ[y0:y1, x0:x1] = sem_img
                    visible[y0:y1, x0:x1] = np.where(occ_img, 0.0, sem_img)
                    yield idx, wo_occ, visible

        # Oversized crops (> max_rays_per_job pixels): render in row-major
        # pixel segments through one compiled (SEG, 1) program and stitch
        # host-side — keeps every dispatch under the samples budget no
        # matter how large a subcluster AABB projects.
        SEG = self.max_rays_per_job
        for idx, c, aabb, (x0, y0, x1, y1) in oversized:
            cw, ch = x1 - x0, y1 - y0
            n_pix = cw * ch
            ys, xs = np.meshgrid(np.arange(y0, y1), np.arange(x0, x1),
                                 indexing="ij")
            xs, ys = xs.ravel(), ys.ravel()
            sem_flat = np.zeros((n_pix,), np.float32)
            occ_flat = np.zeros((n_pix,), bool)
            hits = 0.0
            run = self._get_fn(SEG, 1)
            for at in range(0, n_pix, SEG):
                stop = min(at + SEG, n_pix)
                m = stop - at
                px = np.full((SEG,), x0, np.int32)
                py = np.full((SEG,), y0, np.int32)
                px[:m] = xs[at:stop]
                py[:m] = ys[at:stop]
                cam = np.full((SEG,), c, np.int32)
                sem, occ, hit = jax.device_get(run(
                    self.params, self.cameras, jnp.asarray(cam),
                    jnp.asarray(px), jnp.asarray(py),
                    jnp.asarray(aabb[None])))
                sem_flat[at:stop] = sem[0, :m]
                occ_flat[at:stop] = occ[0, :m]
                hits += float(hit[0, :m].sum())
            if hits < MIN_VALID_RAYS:
                yield _zero(idx)
                continue
            sem_img = np.clip(sem_flat.reshape(ch, cw), 0.0, 1.0)
            occ_img = occ_flat.reshape(ch, cw)
            wo_occ = np.zeros((H, W), np.float32)
            visible = np.zeros((H, W), np.float32)
            wo_occ[y0:y1, x0:x1] = sem_img
            visible[y0:y1, x0:x1] = np.where(occ_img, 0.0, sem_img)
            yield idx, wo_occ, visible

    def project(self, cam_idx: int, aabb: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (wo_occ [H,W], visible [H,W]) float images in [0,1]."""
        _, wo_occ, visible = next(self.iter_projections([(cam_idx, aabb)]))
        return wo_occ, visible


def _save_gray(path: Path, img: np.ndarray) -> None:
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def run_projections(params, model_cfg: ModelConfig, cameras: Cameras,
                    height: int, width: int,
                    super_cluster_info: np.ndarray,
                    output_dir: Path,
                    label_paths: Optional[list] = None,
                    camera_indices: Optional[list] = None,
                    occlusion_threshold: float = OCCLUSION_THRESHOLD,
                    mesh: Optional[jax.sharding.Mesh] = None) -> Path:
    """Write the full projection tree
    ``super_cluster_{s}/cam_{c}/{wo_occ,visible}_cluster_{i}.png``
    (+ copied GT label images) consumed by the merger."""
    output_dir = Path(output_dir)
    n_cams = cameras.num_cameras
    cam_ids = camera_indices if camera_indices is not None else range(n_cams)
    if label_paths is not None and len(label_paths) <= max(cam_ids, default=0):
        raise ValueError(
            f"label_paths has {len(label_paths)} entries but camera indices "
            f"go up to {max(cam_ids)} — expected one label image per camera "
            "(sorted order must match the training-split frame order; pass "
            "label_paths=None to skip GT label copying)")
    projector = ClusterProjector(params, model_cfg, cameras, height,
                                 width, occlusion_threshold, mesh=mesh)

    # Collect every (supercluster, camera, subcluster) job up front so the
    # projector can batch across ALL of them (crops of the same bucket size
    # share dispatches regardless of which supercluster/camera they belong
    # to), then stream results to disk as batches complete.
    jobs, dests = [], []
    for s, info in enumerate(super_cluster_info):
        aabbs = info["aabb"]
        for c in cam_ids:
            cam_dir = output_dir / f"super_cluster_{s}" / f"cam_{c}"
            cam_dir.mkdir(parents=True, exist_ok=True)
            for i in range(aabbs.shape[0]):
                jobs.append((int(c), aabbs[i]))
                dests.append((cam_dir, i))
            if label_paths is not None:
                lp = Path(label_paths[c])
                if lp.exists():
                    name = (lp.name if lp.name.startswith("label_")
                            else f"label_{lp.name}")
                    shutil.copy(lp, cam_dir / name)

    import time as _time
    t0 = _time.perf_counter()
    n_programs = projector.precompile(jobs)
    t_compile = _time.perf_counter() - t0
    print(f"[project] {len(jobs)} jobs → {n_programs} compiled programs "
          f"in {t_compile:.0f}s (static bucket ladder, concurrent AOT "
          "warmup)", flush=True)
    t0 = _time.perf_counter()
    t_io = 0.0
    for idx, wo_occ, visible in projector.iter_projections(jobs):
        cam_dir, i = dests[idx]
        t1 = _time.perf_counter()
        _save_gray(cam_dir / f"wo_occ_cluster_{i}.png", wo_occ)
        _save_gray(cam_dir / f"visible_cluster_{i}.png", visible)
        t_io += _time.perf_counter() - t1
    print(f"[project] render+stitch {_time.perf_counter() - t0 - t_io:.0f}s, "
          f"png io {t_io:.0f}s", flush=True)
    return output_dir
