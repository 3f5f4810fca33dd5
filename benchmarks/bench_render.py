"""Render-path (eval/inference) throughput on one chip.

The reference's eval/render path is `get_outputs_for_camera_ray_bundle`
(fruit_nerf.py:377-404): a Python chunk loop at 32,768 rays/chunk
(fruit_nerf_config.py:43,61) with one host round-trip per chunk.  Ours is
`make_render_fn` (train/step.py): the whole image renders inside ONE jit via
`lax.map` over fixed-shape chunks — a single dispatch per image.

BASELINE.md's north-star metric is "Rays/s/chip (train + render)"; bench.py
covers train, this covers render.  Sync protocol: chain renders and
device_get ONE scalar at the end (block_until_ready is unreliable through
the axon tunnel — CLAUDE.md).

Usage:
    python benchmarks/bench_render.py [--preset cropnerf-mxu] [--hw 800x1200]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cropnerf-mxu")
    ap.add_argument("--hw", default="800x1200",
                    help="render resolution HxW (reference-scale default)")
    ap.add_argument("--frames", type=int, default=4,
                    help="frames per timed chain")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    import jax
    if os.environ.get("CROPNERF_PLATFORM"):   # axon ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])
    import jax.numpy as jnp

    from cropnerf_tpu.core.cameras import Cameras
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_render_fn

    cfg = PRESETS[args.preset]
    n_img = 4
    rng = np.random.RandomState(0)
    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (n_img, 1, 1))
    c2w[:, :, 3] = rng.randn(n_img, 3) * 0.5
    cams = Cameras(
        c2w=jnp.asarray(c2w),
        fx=jnp.full((n_img,), 1000.0), fy=jnp.full((n_img,), 1000.0),
        cx=jnp.full((n_img,), w / 2.0), cy=jnp.full((n_img,), h / 2.0),
        width=jnp.full((n_img,), w, jnp.int32),
        height=jnp.full((n_img,), h, jnp.int32))

    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n_img)
    render = make_render_fn(cfg)

    # warmup / compile
    out = render(state.params, cams, 0, h, w)
    float(jax.device_get(out["rgb"]).sum())

    rays = h * w * args.frames
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for i in range(args.frames):
            out = render(state.params, cams, i % n_img, h, w)
            # chain through a scalar so frames can't be reordered away
            acc = acc + out["rgb"].mean()
        float(jax.device_get(acc))                       # ONE forced sync
        best = min(best, time.perf_counter() - t0)
    rays_per_s = rays / best
    ms_per_frame = best / args.frames * 1e3
    print(f"render {args.preset} {h}x{w}: {ms_per_frame:.1f} ms/frame",
          file=sys.stderr)
    print(json.dumps({
        "metric": "render_rays_per_s_single_chip",
        "preset": args.preset,
        "resolution": f"{h}x{w}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "ms_per_frame": round(ms_per_frame, 2),
    }))


if __name__ == "__main__":
    main()
