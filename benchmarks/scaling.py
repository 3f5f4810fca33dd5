"""Scaling-efficiency sweep: rays/s vs device count on a 1-D data mesh.

Measures the sharded train step at 1..N devices (BASELINE.md north-star:
>=80% rays/s scaling efficiency at 1→4→16 chips).  On a single-chip host it
runs on a virtual CPU mesh (functional validation + mesh overheads); on a
pod slice it measures real ICI scaling.

Usage:
    python benchmarks/scaling.py [--devices 1 2 4 8] [--rays-per-device 8192]
    python benchmarks/scaling.py --cpu   # force the 8-device virtual mesh
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--devices", type=int, nargs="*", default=None)
    parser.add_argument("--rays-per-device", type=int, default=8192)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--preset", default="cropnerf")
    parser.add_argument("--shard-bank", action="store_true",
                        help="measure the sharded-pixel-bank shard_map step "
                             "(multi-host data path) instead of the "
                             "replicated-bank step")
    parser.add_argument("--mode", default="train",
                        choices=["train", "render", "export"],
                        help="which mesh-sharded path to sweep: the train "
                             "step, the chunked renderer, or the export "
                             "volume scan")
    args = parser.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cropnerf_tpu.core.cameras import Cameras
    from cropnerf_tpu.data.databank import (build_pixel_bank,
                                            build_sharded_pixel_bank,
                                            pad_cameras)
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_sharded_train_step, make_train_step

    n_avail = len(jax.devices())
    counts = args.devices or [c for c in (1, 2, 4, 8, 16) if c <= n_avail]

    n_img, h, w = 8, 256, 256
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (n_img, h, w, 3), dtype=np.uint8)
    masks = (rng.rand(n_img, h, w) > 0.9).astype(np.uint8)
    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (n_img, 1, 1))
    c2w[:, 2, 3] = 1.5
    cams = Cameras(
        c2w=jnp.asarray(c2w),
        fx=jnp.full((n_img,), 200.0), fy=jnp.full((n_img,), 200.0),
        cx=jnp.full((n_img,), w / 2.0), cy=jnp.full((n_img,), h / 2.0),
        width=jnp.full((n_img,), w, jnp.int32),
        height=jnp.full((n_img,), h, jnp.int32))
    bank = build_pixel_bank(images, masks, cams)

    if args.mode != "train":
        from cropnerf_tpu.export.volume import sample_volume
        from cropnerf_tpu.models.model import model_init
        from cropnerf_tpu.train.step import make_render_fn

        cfg = PRESETS[args.preset]
        params = model_init(jax.random.PRNGKey(0), cfg.model,
                            num_images=n_img)
        results, base_rate = [], None
        for n_dev in counts:
            mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_dev]),
                                     ("data",))
            if args.mode == "render":
                render = make_render_fn(cfg, mesh=mesh)
                size = 256
                out = render(params, cams, jnp.int32(0), size, size)
                float(jax.device_get(out["rgb"]).sum())    # compile+warm
                # sound sync (CLAUDE.md): short dispatch queue, chain all
                # frames into ONE scalar and device_get it — a data
                # dependency cannot return early, block_until_ready can
                iters = min(args.iters, 8)
                t0 = time.perf_counter()
                acc = jnp.zeros(())
                for i in range(iters):
                    out = render(params, cams, jnp.int32(i % n_img),
                                 size, size)
                    acc = acc + out["rgb"].mean()
                assert np.isfinite(float(jax.device_get(acc)))
                rate = iters * size * size / (time.perf_counter() - t0)
                unit = "rays_per_s"
            else:                                          # export
                kw = dict(num_points_per_side=64, rays_per_batch=512,
                          num_samples=64, density_threshold=1e9)
                aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
                sample_volume(params, cfg.model, aabb, mesh=mesh, **kw)
                t0 = time.perf_counter()
                for _ in range(max(args.iters // 10, 1)):
                    sample_volume(params, cfg.model, aabb, mesh=mesh, **kw)
                dt = time.perf_counter() - t0
                rate = (max(args.iters // 10, 1) * 64 * 64 * 64) / dt
                unit = "queries_per_s"
            if base_rate is None:
                base_rate = rate
            eff = rate / (base_rate * n_dev)
            results.append({"devices": n_dev, unit: round(rate, 1),
                            "scaling_efficiency": round(eff, 3),
                            "mode": args.mode})
            print(json.dumps(results[-1]), flush=True)
        print(json.dumps({"sweep": results}))
        return

    results = []
    base_rate = None
    for n_dev in counts:
        cfg = dataclasses.replace(
            PRESETS[args.preset],
            train_num_rays_per_batch=args.rays_per_device * n_dev)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_dev]), ("data",))
        if args.shard_bank:
            sel = np.arange(((n_img + n_dev - 1) // n_dev) * n_dev) % n_img
            cams_p = pad_cameras(cams, n_dev)
            dev_bank = build_sharded_pixel_bank(images[sel], masks[sel],
                                                cams_p, mesh)
            n_imgs_eff = cams_p.num_cameras
            step = make_sharded_train_step(cfg, mesh, donate=False)
        else:
            dev_bank = bank
            n_imgs_eff = n_img
            step = make_train_step(cfg, mesh=mesh, donate=False)
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   num_images=n_imgs_eff)
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, m = step(state, dev_bank, sub)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            key, sub = jax.random.split(key)
            state, m = step(state, dev_bank, sub)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        rate = args.iters * cfg.train_num_rays_per_batch / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        results.append({"devices": n_dev, "rays_per_s": round(rate, 1),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
