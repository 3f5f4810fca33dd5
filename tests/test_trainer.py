"""Trainer integration: dataset dir → train → checkpoint → reload
(≙ nerfstudio Trainer + eval_setup bootstrap, SURVEY §5.4)."""
import dataclasses
import json

import jax
import numpy as np
import pytest
from PIL import Image

from cropnerf_tpu.data.dataparser import DataparserConfig, parse_transforms
from cropnerf_tpu.data.dataset import load_split
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.train.trainer import Trainer, load_trainer_from_run

from synthetic import render_synthetic_images, ring_cameras


def write_synthetic_dataset(root, n=6, size=32):
    """transforms.json + images/ + semantics/ in the 3DCotton layout."""
    root.mkdir(parents=True, exist_ok=True)
    (root / "images").mkdir(exist_ok=True)
    (root / "semantics").mkdir(exist_ok=True)
    cams = ring_cameras(n=n, height=size, width=size, focal=40.0)
    images, masks = render_synthetic_images(cams, size, size)
    frames = []
    c2w = np.asarray(cams.c2w)
    for i in range(n):
        name = f"frame_{i:04d}.png"
        Image.fromarray(images[i]).save(root / "images" / name)
        Image.fromarray(masks[i] * 255).save(root / "semantics" / name)
        mat = np.eye(4)
        mat[:3, :4] = c2w[i]
        frames.append({
            "file_path": f"images/{name}",
            "transform_matrix": mat.tolist(),
        })
    meta = {
        "fl_x": 40.0, "fl_y": 40.0, "cx": size / 2, "cy": size / 2,
        "w": size, "h": size, "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


class TestDataparser:
    def test_parse_and_load(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        out = parse_transforms(cfg, "train")
        assert len(out.image_paths) == 5          # ceil(6*0.8)
        assert out.c2w.shape == (5, 3, 4)
        # auto-scale puts all camera origins inside the unit box
        assert np.abs(out.c2w[:, :, 3]).max() <= 1.0 + 1e-5
        images, masks = load_split(out)
        assert images.shape == (5, 32, 32, 3)
        assert masks.shape == (5, 32, 32)
        assert set(np.unique(masks)) <= {0, 1}

    def test_eval_split_disjoint(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        train = parse_transforms(cfg, "train")
        ev = parse_transforms(cfg, "eval")
        assert set(p.name for p in train.image_paths).isdisjoint(
            p.name for p in ev.image_paths)


class TestTrainerLoop:
    def test_train_eval_checkpoint_reload(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=128,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        run_dir = tmp_path / "run"
        trainer = Trainer(cfg, data_cfg, run_dir)
        metrics = trainer.train(num_steps=30, log_every=30)
        assert np.isfinite(metrics["loss"])
        assert (run_dir / "run_config.json").exists()
        assert (run_dir / "dataparser_transforms.json").exists()

        em = trainer.eval_image(0)
        assert np.isfinite(em["eval_psnr"])

        # reload from disk and compare params
        trainer2 = load_trainer_from_run(run_dir)
        assert int(trainer2.state.step) == int(trainer.state.step)
        leaves1 = jax.tree.leaves(trainer.state.params)
        leaves2 = jax.tree.leaves(trainer2.state.params)
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_eval_image_artifacts_and_full_eval(self, tmp_path):
        """steps_per_eval_image emits the PNG artifact set
        (≙ fruit_nerf.py:647-702) and the end-of-train full-eval pass
        reports averaged metrics (≙ fruit_pipeline.py:178-229)."""
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=128,
                                  steps_per_eval_batch=10_000,
                                  steps_per_eval_image=10,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        run_dir = tmp_path / "run"
        trainer = Trainer(cfg, data_cfg, run_dir)
        metrics = trainer.train(num_steps=10, log_every=10)
        art = run_dir / "eval_images" / "step_000000010"
        for name in ("img.png", "depth.png", "accumulation.png",
                     "semantics.png"):
            assert (art / name).exists(), name
        # gt|pred strip is twice the eval image width
        from PIL import Image
        w_img, _ = Image.open(art / "img.png").size
        assert w_img == 2 * int(trainer.eval_cameras.width[0])
        # end-of-train full-eval metrics present
        assert "all_eval_psnr" in metrics and np.isfinite(
            metrics["all_eval_psnr"])


class TestResume:
    def test_resume_continues_from_checkpoint(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=64,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        run_dir = tmp_path / "run"
        t1 = Trainer(cfg, data_cfg, run_dir)
        t1.train(num_steps=8, log_every=100)
        assert int(t1.state.step) == 8

        t2 = Trainer(cfg, data_cfg, run_dir, resume=True)
        assert int(t2.state.step) == 8
        t2.train(num_steps=3, log_every=100)
        assert int(t2.state.step) == 11

    def test_stop_requested_checkpoints_early(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=64,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        t = Trainer(cfg, data_cfg, tmp_path / "run")
        t._stop_requested = True
        t.train(num_steps=50, log_every=100)
        assert int(t.state.step) == 0            # loop exited immediately
        assert list((tmp_path / "run" / "checkpoints").glob("step-*"))


class TestMultichipTrainer:
    def test_trainer_with_mesh(self, tmp_path):
        """Trainer with a mesh over the 8 virtual CPU devices (the CLI
        --multichip path)."""
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=128,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        trainer = Trainer(cfg, data_cfg, tmp_path / "run", mesh=mesh)
        metrics = trainer.train(num_steps=5, log_every=5)
        assert np.isfinite(metrics["loss"])
        assert int(trainer.state.step) == 5


class TestShardedBank:
    """Sharded pixel bank + shard_map train step (multi-host data path:
    bank sharded over the data axis, per-device local ray sampling —
    ≙ the reference's per-rank datamanager, fruit_pipeline.py:100-121)."""

    def test_sharded_bank_layout(self):
        from cropnerf_tpu.data.databank import (
            build_sharded_pixel_bank, pad_cameras, padded_num_images)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        n, h, w = 6, 8, 8                       # 6 images over 8 devices
        cams = ring_cameras(n=n, height=h, width=w, focal=10.0)
        images, masks = render_synthetic_images(cams, h, w)
        cams_p = pad_cameras(cams, mesh.size)
        assert cams_p.num_cameras == padded_num_images(n, mesh.size) == 8
        sel = np.arange(8) % n
        bank = build_sharded_pixel_bank(images[sel], masks[sel], cams_p, mesh)
        assert bank.num_pixels == 8 * h * w
        assert bank.num_images == 8
        # sharded over pixels, one image per device
        assert len(bank.rgb.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(bank.rgb).reshape(8, h, w, 3), images[sel])
        # wrapped cameras duplicate the originals
        np.testing.assert_allclose(np.asarray(cams_p.c2w)[6],
                                   np.asarray(cams.c2w)[0])

    def test_sharded_step_trains(self):
        import dataclasses as dc
        from cropnerf_tpu.data.databank import (
            build_sharded_pixel_bank, pad_cameras)
        from cropnerf_tpu.train.state import create_train_state
        from cropnerf_tpu.train.step import make_sharded_train_step
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        n, h, w = 8, 16, 16
        cams = ring_cameras(n=n, height=h, width=w, focal=20.0)
        images, masks = render_synthetic_images(cams, h, w)
        bank = build_sharded_pixel_bank(images, masks,
                                        pad_cameras(cams, mesh.size), mesh)
        cfg = dc.replace(PRESETS["cropnerf-tiny"],
                         train_num_rays_per_batch=128)
        state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
        step = make_sharded_train_step(cfg, mesh, donate=False)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            state, m = step(state, bank, sub)
            losses.append(float(m["loss"]))
        assert np.all(np.isfinite(losses))
        assert int(state.step) == 30
        # training actually reduces the loss on the tiny scene
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        # grads/params stay replicated across the mesh
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_sharded_step_gradient_equivalence(self):
        """The shard_map sharded-bank step must produce the SAME params as a
        one-device replay of its exact computation over the global bank —
        validating the shard layout assumption, the global camera-id
        arithmetic (cam_l + di*images_per_device), and the grad/metric pmean
        (the reference's DDP grad-equivalence contract,
        fruit_pipeline.py:119-121)."""
        import dataclasses as dc
        from cropnerf_tpu.data.databank import (
            build_pixel_bank, build_sharded_pixel_bank, pad_cameras)
        from cropnerf_tpu.train.debug import \
            assert_sharded_step_matches_replay
        from cropnerf_tpu.train.state import create_train_state
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        n, h, w = 8, 16, 16
        cams = ring_cameras(n=n, height=h, width=w, focal=20.0)
        images, masks = render_synthetic_images(cams, h, w)
        cams_p = pad_cameras(cams, mesh.size)
        bank_s = build_sharded_pixel_bank(images, masks, cams_p, mesh)
        bank_g = build_pixel_bank(images, masks, cams_p)
        cfg = dc.replace(PRESETS["cropnerf-tiny"],
                         train_num_rays_per_batch=128)
        state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
        max_dev = assert_sharded_step_matches_replay(
            state, bank_s, bank_g, jax.random.PRNGKey(7), cfg, mesh)
        assert np.isfinite(max_dev)

    def test_trainer_shard_bank_e2e(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds", n=10, size=16)
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=128,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        t = Trainer(cfg, data_cfg, tmp_path / "run", mesh=mesh,
                    shard_bank=True)
        # 8 train frames over 8 devices, no padding needed
        assert t.shard_bank and t.bank.num_images == 8
        metrics = t.train(num_steps=5, log_every=5)
        assert np.isfinite(metrics["loss"])
        assert int(t.state.step) == 5


class TestStepsPerDispatch:
    def test_chunked_dispatch_trains(self, tmp_path):
        """steps_per_dispatch=5: 20 steps in 4 XLA dispatches; counter and
        cadences line up."""
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=64,
                                  steps_per_eval_batch=10,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        t = Trainer(cfg, data_cfg, tmp_path / "run", steps_per_dispatch=5)
        metrics = t.train(num_steps=20, log_every=10)
        assert int(t.state.step) == 20
        assert np.isfinite(metrics["loss"])

    def test_misaligned_cadence_rejected(self, tmp_path):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  steps_per_save=7)   # not a multiple of 5
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        with pytest.raises(AssertionError):
            Trainer(cfg, data_cfg, tmp_path / "run", steps_per_dispatch=5)


class TestThroughputWatchdog:
    """Slow-executable watchdog (≙ bench.py's retry for the remote AOT
    service's nondeterministic ~1000x-slow executables, CLAUDE.md)."""

    def _trainer(self, tmp_path, **kw):
        root = write_synthetic_dataset(tmp_path / "ds")
        cfg = dataclasses.replace(PRESETS["cropnerf-tiny"],
                                  train_num_rays_per_batch=64,
                                  steps_per_eval_batch=10_000,
                                  steps_per_eval_image=10_000,
                                  steps_per_save=10_000)
        data_cfg = DataparserConfig(data_dir=root, train_split_fraction=0.8)
        return Trainer(cfg, data_cfg, tmp_path / "run", **kw)

    def test_triggers_rejit_and_still_trains(self, tmp_path):
        # An absurd floor makes every post-compile window "too slow": the
        # trainer must re-jit at most _MAX_SLOW_RETRIES times (each retry's
        # own recompile window is exempt) and training must stay correct.
        t = self._trainer(tmp_path, min_rays_per_s=1e15)
        metrics = t.train(num_steps=40, log_every=10)
        from cropnerf_tpu.train.trainer import _MAX_SLOW_RETRIES
        assert t._slow_retries == _MAX_SLOW_RETRIES
        assert int(t.state.step) == 40
        assert np.isfinite(metrics["loss"])
        assert metrics["rays_per_s_window"] > 0

    def test_disabled_by_default(self, tmp_path):
        t = self._trainer(tmp_path)
        t.train(num_steps=20, log_every=10)
        assert t._slow_retries == 0

    def test_eval_windows_exempt_from_floor(self, tmp_path):
        """Windows whose wall time includes eval work must not trigger the
        watchdog (advisor r3): with evals landing mid-window everywhere and
        an absurd floor, no retry may fire."""
        t = self._trainer(tmp_path, min_rays_per_s=1e15)
        # evals at steps 5, 15, 25... land inside every logging window
        t.cfg = dataclasses.replace(t.cfg, steps_per_eval_batch=5)
        t.train(num_steps=40, log_every=10)
        assert t._slow_retries == 0

    def test_warns_when_every_window_busy_exempt(self, tmp_path, capsys):
        """10 consecutive busy-exempt windows must produce the one-time
        notice that the floor is effectively disabled (advisor r4) — and
        exactly once even over more windows."""
        t = self._trainer(tmp_path, min_rays_per_s=1e15)
        t.cfg = dataclasses.replace(t.cfg, steps_per_eval_batch=2)
        t.train(num_steps=48, log_every=4)     # 12 windows, all with evals
        assert t._slow_retries == 0
        out = capsys.readouterr().out
        assert out.count("exempted from the throughput floor") == 1

    def test_gives_up_loudly_after_retries(self, tmp_path, capsys):
        """Once retries are exhausted and throughput stays under the floor,
        the trainer warns once instead of degrading silently."""
        t = self._trainer(tmp_path, min_rays_per_s=1e15)
        t.train(num_steps=80, log_every=10)
        from cropnerf_tpu.train.trainer import _MAX_SLOW_RETRIES
        assert t._slow_retries == _MAX_SLOW_RETRIES
        assert getattr(t, "_watchdog_gave_up", False)
        out = capsys.readouterr().out
        assert out.count("giving up") == 1
