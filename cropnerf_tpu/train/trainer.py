"""Training engine: loop, eval cadence, checkpointing, logging.

Equivalent of the nerfstudio ``Trainer`` as configured by the reference
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf_config.py:29-65: 40k steps,
eval every 500, save every 2000, mixed precision) — re-designed for TPU:
the whole step is one jitted XLA program (no AMP GradScaler; bf16 matmuls
need no loss scaling), metrics are fetched asynchronously, and checkpoints
are orbax pytrees with the reference's config-next-to-checkpoint convention
(SURVEY §5.4) so export/projection tools can bootstrap from a run directory.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Cameras
from ..data.databank import PixelBank, build_pixel_bank
from ..data.dataparser import DataparserConfig, DataparserOutputs, parse_transforms
from ..data.dataset import SEMANTIC_THRESHOLD, load_split
from ..models.config import PRESETS, TrainConfig
from ..ops import metrics as metric_ops
from .state import TrainState, create_train_state
from .step import make_eval_batch_fn, make_render_fn, make_train_step

# Bound on throughput-watchdog re-jits per run (see Trainer.min_rays_per_s)
_MAX_SLOW_RETRIES = 2


def cameras_from_outputs(out: DataparserOutputs) -> Cameras:
    return Cameras(
        c2w=jnp.asarray(out.c2w),
        fx=jnp.asarray(out.fx), fy=jnp.asarray(out.fy),
        cx=jnp.asarray(out.cx), cy=jnp.asarray(out.cy),
        width=jnp.asarray(out.width), height=jnp.asarray(out.height),
        distortion=(jnp.asarray(out.distortion)
                    if np.abs(out.distortion).max() > 0 else None))


class Trainer:
    """Single-host training driver.

    Multi-chip: pass ``mesh`` (1-D ``data`` axis over local/global devices);
    the train step shards the ray batch and XLA all-reduces gradients over
    ICI (the reference's DDP equivalent, fruit_pipeline.py:119-121).
    """

    def __init__(self, cfg: TrainConfig, data_config: DataparserConfig,
                 output_dir: Path, mesh: Optional[jax.sharding.Mesh] = None,
                 experiment_name: str = "cropnerf", resume: bool = False,
                 shard_bank: Optional[bool] = None,
                 steps_per_dispatch: int = 1,
                 num_images_override: Optional[int] = None,
                 semantic_threshold: "int | str" = SEMANTIC_THRESHOLD,
                 min_rays_per_s: Optional[float] = None):
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.data_config = data_config
        self.output_dir = Path(output_dir)
        self.mesh = mesh
        self.experiment_name = experiment_name
        # Sharded bank: default on multi-host (each host loads only its image
        # slice, the reference's per-rank datamanager, fruit_pipeline.py:100-
        # 102); opt-in on single host (HBM-bound datasets).
        if shard_bank is None:
            shard_bank = mesh is not None and jax.process_count() > 1
        self.shard_bank = bool(shard_bank and mesh is not None)

        self.semantic_threshold = semantic_threshold
        self.train_outputs = parse_transforms(data_config, "train")
        self.eval_outputs = parse_transforms(data_config, "eval")
        self.bank: PixelBank = self._build_train_bank()
        self.eval_images, self.eval_masks = load_split(
            self.eval_outputs, semantic_threshold=semantic_threshold)
        self.eval_cameras = cameras_from_outputs(self.eval_outputs)

        # eval ray-batch pipeline (≙ next_eval + eval-batch losses every
        # steps_per_eval_batch, fruit_nerf_config.py:31)
        self.eval_bank: PixelBank = build_pixel_bank(
            self.eval_images, self.eval_masks, self.eval_cameras)

        key = jax.random.PRNGKey(cfg.seed)
        # num_images_override: rebuild per-image params (appearance
        # embedding, camera-opt) at a run's original — possibly padded —
        # image count so orbax restore matches (a shard_bank run pads the
        # image count to the mesh size; run_config.json records it)
        self.num_train_images = int(num_images_override
                                    or self.bank.num_images)
        self.state: TrainState = create_train_state(
            key, cfg, num_images=self.num_train_images)
        # steps_per_dispatch > 1 fuses that many optimizer steps into one
        # XLA program (lax.scan) — one host→device dispatch per chunk, so
        # training stays compute-bound even when dispatch latency rivals the
        # sub-millisecond step. Logging/eval/save cadences must align.
        k = int(steps_per_dispatch)
        assert k >= 1
        for name, cadence in (("steps_per_eval_batch", cfg.steps_per_eval_batch),
                              ("steps_per_eval_image", cfg.steps_per_eval_image),
                              ("steps_per_save", cfg.steps_per_save)):
            assert cadence % k == 0, (
                f"{name}={cadence} must be a multiple of "
                f"steps_per_dispatch={k}")
        self.steps_per_dispatch = k
        if self.shard_bank:
            assert k == 1, "steps_per_dispatch>1 not wired for sharded banks"
        self.train_step = self._build_train_step()
        # Throughput watchdog (failure detection, SURVEY §5.5/§5.3): the
        # remote AOT compile service can nondeterministically emit a
        # ~1000x-slow executable for the same program (root-caused
        # 2026-08-17, CLAUDE.md).  When a post-compile logging window runs
        # below this floor, the trainer clears the JAX executable cache and
        # re-jits the train step (same params/state — a pure recompile),
        # bounded by _MAX_SLOW_RETRIES.  Off by default; bench.py applies
        # the same defense with a flagship-specific floor.
        self.min_rays_per_s = min_rays_per_s
        self._slow_retries = 0
        self._busy_windows = 0
        self._warned_busy_windows = False
        self.eval_batch_fn = make_eval_batch_fn(cfg)
        # renders shard each chunk's rays over the mesh too (train AND
        # render rays/s are the north star, BASELINE.md) — single-host
        # meshes only: on multi-host the render fn's plain jit cannot
        # constrain onto a non-fully-addressable global mesh, so eval
        # renders stay host-local there
        render_mesh = self.mesh if jax.process_count() == 1 else None
        self.render = make_render_fn(cfg, mesh=render_mesh)
        self._loop_key = jax.random.PRNGKey(cfg.seed + 1)

        self.ckpt_dir = self.output_dir / "checkpoints"
        self.output_dir.mkdir(parents=True, exist_ok=True)
        from ..utils.writer import MetricsWriter
        self.writer = MetricsWriter(self.output_dir / "logs")
        self._write_run_metadata()
        self._stop_requested = False
        if resume:
            ckpts = sorted(self.ckpt_dir.glob("step-*"))
            if ckpts:
                self.load_checkpoint(ckpts[-1])
                print(f"resumed from {ckpts[-1].name} "
                      f"(step {int(self.state.step)})", flush=True)

    def _build_train_step(self):
        if self.shard_bank:
            from .step import make_sharded_train_step
            return make_sharded_train_step(self.cfg, self.mesh)
        return make_train_step(self.cfg, mesh=self.mesh,
                               num_inner=self.steps_per_dispatch)

    def _build_train_bank(self) -> PixelBank:
        if not self.shard_bank:
            images, masks = load_split(
                self.train_outputs,
                semantic_threshold=self.semantic_threshold)
            return build_pixel_bank(
                images, masks, cameras_from_outputs(self.train_outputs))
        # Sharded bank: pad the frame list to the mesh size, load only this
        # process's contiguous slice, assemble the global pixel array.
        from ..data.databank import (build_sharded_pixel_bank, pad_cameras,
                                     padded_num_images, process_image_range)
        n = len(self.train_outputs.image_paths)
        n_pad = padded_num_images(n, self.mesh.size)
        sel = np.arange(n_pad) % n
        lo, hi = process_image_range(n_pad)
        images, masks = load_split(self.train_outputs, indices=sel[lo:hi],
                                   semantic_threshold=self.semantic_threshold)
        cams = pad_cameras(cameras_from_outputs(self.train_outputs),
                           self.mesh.size)
        return build_sharded_pixel_bank(images, masks, cams, self.mesh)

    def install_signal_handlers(self) -> None:
        """Graceful preemption: SIGTERM/SIGINT request a stop; the train
        loop checkpoints and returns instead of dying mid-step (the
        reference has no preemption handling, SURVEY §5.3 — manual restarts
        from the last periodic checkpoint)."""
        import signal

        def _handler(signum, frame):
            self._stop_requested = True
            print(f"signal {signum}: finishing step and checkpointing...",
                  flush=True)

        signal.signal(signal.SIGTERM, _handler)
        signal.signal(signal.SIGINT, _handler)

    # -- checkpointing (≙ nerfstudio config.yml + step-*.ckpt, SURVEY §5.4) --

    def _write_run_metadata(self) -> None:
        meta = {
            "experiment_name": self.experiment_name,
            "num_train_images": self.num_train_images,
            "shard_bank": self.shard_bank,
            "semantic_threshold": self.semantic_threshold,
            "config": dataclasses.asdict(self.cfg),
            "data_config": {k: str(v) for k, v in
                            dataclasses.asdict(self.data_config).items()},
            "dataparser_transform":
                self.train_outputs.dataparser_transform.tolist(),
            "dataparser_scale": self.train_outputs.dataparser_scale,
        }
        (self.output_dir / "run_config.json").write_text(
            json.dumps(meta, indent=2, default=str))
        # exporter-compatible transforms file (scripts/exporter.py:100-101)
        (self.output_dir / "dataparser_transforms.json").write_text(json.dumps({
            "transform": self.train_outputs.dataparser_transform.tolist(),
            "scale": self.train_outputs.dataparser_scale,
        }, indent=2))

    def save_checkpoint(self) -> None:
        import orbax.checkpoint as ocp
        step = int(self.state.step)
        path = (self.ckpt_dir / f"step-{step:09d}").absolute()
        ckptr = ocp.StandardCheckpointer()
        # full train state: params + optimizer moments + step (the reference
        # checkpoints optimizers too, SURVEY §5.4)
        ckptr.save(path, jax.device_get(
            {"params": self.state.params,
             "opt_state": self.state.opt_state,
             "step": self.state.step}))
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: Path) -> None:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        target = {"params": jax.device_get(self.state.params),
                  "opt_state": jax.device_get(self.state.opt_state),
                  "step": jax.device_get(self.state.step)}
        try:
            restored = ckptr.restore(Path(path).absolute(), target)
            opt_state = jax.tree.map(jnp.asarray, restored["opt_state"])
        except Exception:
            # older checkpoints without optimizer state: params-only resume
            restored = ckptr.restore(
                Path(path).absolute(),
                {"params": target["params"], "step": target["step"]})
            opt_state = self.state.opt_state
        # orbax returns host numpy arrays; put them back on device so jitted
        # consumers can index them with traced values
        params = jax.tree.map(jnp.asarray, restored["params"])
        self.state = self.state.replace(params=params, opt_state=opt_state,
                                        step=jnp.asarray(restored["step"]))

    # -- eval (≙ get_eval_image_metrics_and_images, fruit_nerf.py:647-702) --

    def eval_image(self, eval_idx: int = 0,
                   save_dir: Optional[Path] = None) -> Dict[str, float]:
        h = int(self.eval_cameras.height[eval_idx])
        w = int(self.eval_cameras.width[eval_idx])
        out = self.render(self.state.params, self.eval_cameras,
                          jnp.int32(eval_idx), h, w)
        gt = jnp.asarray(self.eval_images[eval_idx]).astype(jnp.float32) / 255.
        mask_gt = jnp.asarray(self.eval_masks[eval_idx]).astype(jnp.float32)
        m = {
            "eval_psnr": float(metric_ops.psnr(out["rgb"], gt)),
            "eval_ssim": float(metric_ops.ssim(out["rgb"], gt)),
            # reference IoU compares the 0.9-binarised semantic map
            # (fruit_nerf.py:696-700 via the heaviside colormap)
            "eval_iou": float(metric_ops.binary_iou(
                out["semantics_colormap"][..., 0], mask_gt,
                threshold=0.9)),
        }
        lp = self._lpips(out["rgb"], gt)
        if lp is not None:
            m["eval_lpips"] = lp
        if save_dir is not None:
            # eval-image artifacts (gt|pred strip, depth/accumulation
            # colormaps, semantic map + mask) — the reference's primary QC
            # channel (fruit_nerf.py:647-702)
            from ..evaluation.vis import save_eval_images
            save_eval_images(save_dir, jax.device_get(out),
                             np.asarray(self.eval_images[eval_idx]),
                             np.asarray(self.eval_masks[eval_idx]))
        return m

    def _lpips(self, pred, gt) -> Optional[float]:
        """LPIPS when weights are available; None (reported as unavailable)
        otherwise — never silently absent (fruit_nerf.py:183,699)."""
        from ..ops.lpips import lpips_available, lpips
        if not lpips_available():
            if not getattr(self, "_lpips_warned", False):
                print("eval: lpips unavailable (no VGG weights; set "
                      "CROPNERF_LPIPS_WEIGHTS) — reporting PSNR/SSIM/IoU "
                      "only", flush=True)
                self._lpips_warned = True
            return None
        return float(lpips(pred, gt))

    def eval_batch(self, seed: int = 0) -> Dict[str, float]:
        """Loss/PSNR on a random eval ray batch (≙ get_eval_loss_dict on
        next_eval batches)."""
        m = self.eval_batch_fn(self.state.params, self.eval_bank,
                               jax.random.PRNGKey(seed))
        return {f"eval_batch_{k}": float(v) for k, v in m.items()}

    def eval_all_images(self) -> Dict[str, float]:
        """Average metrics over every eval image (≙ VanillaPipeline
        ``get_average_eval_image_metrics``, fruit_pipeline.py:178-229)."""
        n = len(self.eval_images)
        acc: Dict[str, float] = {}
        for i in range(n):
            m = self.eval_image(i)
            for k, v in m.items():
                acc[k] = acc.get(k, 0.0) + v
        return {k: v / n for k, v in acc.items()}

    # -- main loop (≙ Trainer.train, SURVEY §3.1) --

    def train(self, num_steps: Optional[int] = None,
              log_every: int = 100) -> Dict[str, float]:
        cfg = self.cfg
        total = num_steps or cfg.max_num_iterations
        k = self.steps_per_dispatch
        assert total % k == 0, (f"num_steps={total} must be a multiple of "
                                f"steps_per_dispatch={k}")
        assert log_every % k == 0 or k == 1, (
            f"log_every={log_every} must be a multiple of "
            f"steps_per_dispatch={k}")
        last_metrics: Dict[str, float] = {}
        t0 = time.perf_counter()
        rays_done = 0
        # watchdog window state: the first window (and the one right after
        # a re-jit) includes a compile, so it never triggers the floor.
        # win_busy marks windows whose wall time includes eval/checkpoint
        # work (those blocks can themselves remote-AOT-compile) — such
        # windows are exempt from the floor check, and the window timer is
        # re-armed AFTER the eval/save blocks so their cost is never charged
        # to the next training window either.
        t_win, rays_win, win_has_compile, win_busy = t0, 0, True, False
        for i in range(total // k):
            if self._stop_requested:
                break
            self._loop_key, sub = jax.random.split(self._loop_key)
            self.state, metrics = self.train_step(self.state, self.bank, sub)
            rays_done += cfg.train_num_rays_per_batch * k
            rays_win += cfg.train_num_rays_per_batch * k
            step = int(self.state.step)
            did_log = step % log_every == 0 or i == total // k - 1
            if did_log:
                # float() pulls device values — a real sync point, so the
                # window rate below reflects executed (not queued) steps
                m = {k: float(v) for k, v in metrics.items()}
                now = time.perf_counter()
                m["rays_per_s"] = rays_done / max(now - t0, 1e-9)
                rate_win = rays_win / max(now - t_win, 1e-9)
                m["rays_per_s_window"] = rate_win
                m["step"] = step
                last_metrics = m
                self.writer.write(step, m)
                print(f"[step {step}] loss={m['loss']:.4f} "
                      f"psnr={m['psnr']:.2f} rays/s={m['rays_per_s']:.0f}",
                      flush=True)
                window_clean = not win_has_compile and not win_busy
                if self.min_rays_per_s is not None:
                    # eval/save cadence at or below the logging cadence can
                    # busy-exempt EVERY window, silently disabling the
                    # watchdog (advisor r4) — warn once after 10 in a row
                    self._busy_windows = (self._busy_windows + 1 if win_busy
                                          else 0)
                    if (self._busy_windows == 10
                            and not self._warned_busy_windows):
                        self._warned_busy_windows = True
                        print("[watchdog] NOTE: the last 10 logging windows "
                              "all contained eval/save work and were "
                              "exempted from the throughput floor — the "
                              "slow-executable defense is effectively "
                              "disabled at this eval/log cadence; raise "
                              "log_every or lower the eval cadence to "
                              "re-arm it", flush=True)
                if (self.min_rays_per_s is not None and window_clean
                        and rate_win < self.min_rays_per_s
                        and self._slow_retries < _MAX_SLOW_RETRIES):
                    print(f"[step {step}] WATCHDOG: window throughput "
                          f"{rate_win:.0f} rays/s < floor "
                          f"{self.min_rays_per_s:.0f} — suspect slow "
                          f"executable; clearing caches and re-jitting "
                          f"(retry {self._slow_retries + 1}/"
                          f"{_MAX_SLOW_RETRIES})", flush=True)
                    jax.clear_caches()
                    self.train_step = self._build_train_step()
                    self._slow_retries += 1
                    win_has_compile = True
                else:
                    if (self.min_rays_per_s is not None and window_clean
                            and rate_win < self.min_rays_per_s
                            and not getattr(self, "_watchdog_gave_up",
                                            False)):
                        # retries exhausted but still under the floor: warn
                        # once, loudly, so the operator knows the run is
                        # undefended from here on (advisor r3 finding)
                        print(f"[step {step}] WATCHDOG: still below floor "
                              f"({rate_win:.0f} < "
                              f"{self.min_rays_per_s:.0f} rays/s) after "
                              f"{_MAX_SLOW_RETRIES} re-jits — giving up; "
                              f"run continues at reduced throughput",
                              flush=True)
                        self._watchdog_gave_up = True
                    win_has_compile = False
            if step % cfg.steps_per_eval_batch == 0 and step > 0:
                eb = self.eval_batch(seed=step)
                last_metrics.update(eb)
                self.writer.write(step, eb, prefix="eval")
                win_busy = True
            if step % cfg.steps_per_eval_image == 0 and step > 0:
                em = self.eval_image(0, save_dir=self.output_dir /
                                     "eval_images" / f"step_{step:09d}")
                last_metrics.update(em)
                self.writer.write(step, em, prefix="eval")
                print(f"[step {step}] eval "
                      f"psnr={last_metrics['eval_psnr']:.2f} "
                      f"iou={last_metrics['eval_iou']:.3f}", flush=True)
                win_busy = True
            if (cfg.steps_per_eval_all_images > 0 and step > 0
                    and step % cfg.steps_per_eval_all_images == 0):
                ea = self.eval_all_images()
                last_metrics.update({f"all_{k}": v for k, v in ea.items()})
                self.writer.write(step, ea, prefix="eval_all")
                win_busy = True
            if step % cfg.steps_per_save == 0 and step > 0:
                self.save_checkpoint()
                win_busy = True
            if did_log:
                # re-arm the window after any same-iteration eval/save work
                t_win, rays_win, win_busy = time.perf_counter(), 0, False
        # full-eval at train end (≙ after-train get_average_eval_image_metrics,
        # fruit_pipeline.py:178-229)
        if not self._stop_requested:
            ea = self.eval_all_images()
            last_metrics.update({f"all_{k}": v for k, v in ea.items()})
            self.writer.write(int(self.state.step), ea, prefix="eval_all")
            print("[final] " + " ".join(f"{k}={v:.3f}"
                                        for k, v in ea.items()), flush=True)
        self.save_checkpoint()
        return last_metrics


def load_trainer_from_run(run_dir: Path,
                          mesh: Optional[jax.sharding.Mesh] = None) -> Trainer:
    """Bootstrap a Trainer (model + data + latest checkpoint) from a run
    directory — ≙ nerfstudio ``eval_setup(config.yml)``
    (scripts/exporter.py:87, scripts/semantic_projection.py:139-143)."""
    run_dir = Path(run_dir)
    meta = json.loads((run_dir / "run_config.json").read_text())
    from ..models.config import train_config_from_dict
    cfg = train_config_from_dict(meta["config"])
    dc = meta["data_config"]
    data_config = DataparserConfig(
        data_dir=Path(dc["data_dir"]),
        train_split_fraction=float(dc["train_split_fraction"]),
        semantic_dir=dc["semantic_dir"])
    trainer = Trainer(cfg, data_config, run_dir, mesh=mesh,
                      experiment_name=meta.get("experiment_name", "cropnerf"),
                      num_images_override=meta.get("num_train_images"),
                      semantic_threshold=meta.get("semantic_threshold",
                                                  SEMANTIC_THRESHOLD))
    ckpts = sorted((run_dir / "checkpoints").glob("step-*"))
    if ckpts:
        trainer.load_checkpoint(ckpts[-1])
    return trainer
