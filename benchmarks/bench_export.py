"""Export-path throughput: semantic-volume sampling (the reference's second
hot path — `ns-export` runs ~2.7e10 field queries at its 3000^3 defaults,
scripts/exporter.py:75-77).

A/Bs the device-side compaction in export/volume.py (fixed-size nonzero +
row gather on the density superset mask; only survivors cross to the host)
against the round-1/2 dense transfer (every per-sample array device_get per
chunk).  On a tunneled TPU the dense path is host-transfer-bound, so the
win scales with (1 - survivor fraction).

Run:  python benchmarks/bench_export.py            # TPU
      CROPNERF_PLATFORM=cpu python benchmarks/bench_export.py --n 48
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@functools.lru_cache(maxsize=None)
def _dense_chunk_fn(model_cfg, B, num_samples, far, density_threshold,
                    semantic_threshold, colormap_threshold, direction):
    """Jitted dense-transfer chunk fn, cached on its static signature so a
    second dense_sample_volume call reuses the warm executable (a per-call
    `@jax.jit` closure would recompile every invocation — on the tunneled
    TPU that is 8-100 s of remote-AOT time polluting the A/B)."""
    import jax
    import jax.numpy as jnp
    from cropnerf_tpu.core.rays import RayBundle
    from cropnerf_tpu.models.model import forward_export

    @jax.jit
    def run_chunk(params, origins, aabb_j, key):
        rb = RayBundle(
            origins=origins,
            directions=jnp.broadcast_to(jnp.asarray(direction), origins.shape),
            nears=jnp.zeros((B,)), fars=jnp.full((B,), far),
            camera_idx=jnp.zeros((B,), jnp.int32))
        out = forward_export(params, rb, model_cfg, num_samples, aabb_j,
                             key=key)
        density = out["density"].reshape(-1)
        sem = out["semantics"].reshape(-1)
        pts = out["point_location"].reshape(-1, 3)
        sig = jax.nn.sigmoid(sem)
        mask_den = density >= density_threshold
        return {
            "pts": pts, "sig": sig,
            "mask_semantic": (sem >= semantic_threshold) & mask_den,
            "mask_colormap": (sig >= colormap_threshold) & mask_den,
            "mask_density": mask_den,
        }

    return run_chunk


def dense_sample_volume(params, model_cfg, aabb, num_points_per_side,
                        rays_per_batch, num_samples, density_threshold,
                        semantic_threshold=3.0, colormap_threshold=0.9):
    """The pre-compaction export loop: dense per-sample transfer per chunk
    (kept here as the A/B baseline; matches export/volume.py @ r2)."""
    import jax
    import jax.numpy as jnp
    from cropnerf_tpu.export.volume import orthographic_ray_grid

    origins_np, dir_np, far = orthographic_ray_grid(aabb, num_points_per_side)
    aabb_j = jnp.asarray(aabb, jnp.float32)
    B = rays_per_batch
    run_chunk = _dense_chunk_fn(
        model_cfg, B, num_samples, float(far), float(density_threshold),
        float(semantic_threshold), float(colormap_threshold),
        tuple(float(v) for v in np.asarray(dir_np).reshape(-1)))

    key = jax.random.PRNGKey(0)
    total_pts = 0
    n_rays = origins_np.shape[0]
    for start in range(0, n_rays, B):
        chunk = origins_np[start:start + B]
        if chunk.shape[0] < B:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], B - chunk.shape[0], 0)], 0)
        key, sub = jax.random.split(key)
        out = jax.device_get(run_chunk(params, jnp.asarray(chunk), aabb_j,
                                       sub))
        total_pts += int(out["mask_density"].sum())
    return total_pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128,
                    help="grid points per AABB side (ref default: 3000)")
    ap.add_argument("--samples", type=int, default=512,
                    help="samples per ray (ref: = points per side)")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    if os.environ.get("CROPNERF_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])
    import jax

    from cropnerf_tpu.export.volume import sample_volume
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state

    cfg = PRESETS["cropnerf-mxu"]
    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=4)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    n_rays = args.n * args.n
    n_samples_total = ((n_rays + args.batch - 1) // args.batch) \
        * args.batch * args.samples
    print(f"devices: {jax.devices()}  grid {args.n}^2 rays x {args.samples} "
          f"samples = {n_samples_total/1e6:.1f} M queries", file=sys.stderr)

    # Pick a density threshold giving ~1% survivors on this (random-init)
    # field so the compact path is measured at a realistic survivor rate,
    # not at the 0% a threshold of 70 gives an untrained model.
    from cropnerf_tpu.core.rays import RayBundle
    import jax.numpy as jnp
    from cropnerf_tpu.models.model import forward_export
    probe_rb = RayBundle(
        origins=jnp.zeros((args.batch, 3)),
        directions=jnp.broadcast_to(jnp.asarray([0., 0., 1.]),
                                    (args.batch, 3)),
        nears=jnp.zeros((args.batch,)), fars=jnp.full((args.batch,), 2.0),
        camera_idx=jnp.zeros((args.batch,), jnp.int32))
    probe = jax.device_get(forward_export(
        state.params, probe_rb, cfg.model, args.samples,
        jnp.asarray(aabb), key=jax.random.PRNGKey(1))["density"])
    thr = float(np.quantile(probe, 0.99))
    print(f"density threshold for ~1% survivors: {thr:.4f}", file=sys.stderr)

    results = {}
    for name, fn in (
        ("compact", lambda: sample_volume(
            state.params, cfg.model, aabb, num_points_per_side=args.n,
            rays_per_batch=args.batch, num_samples=args.samples,
            density_threshold=thr)),
        ("dense", lambda: dense_sample_volume(
            state.params, cfg.model, aabb, args.n, args.batch, args.samples,
            thr)),
    ):
        fn()                     # warm-up: compiles + first tunnel round-trip
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        npts = (sum(c.points.shape[0] for c in out.values())
                if name == "compact" else out)
        results[name] = dt
        print(f"{name:8s} {dt*1e3:9.1f} ms   "
              f"{n_samples_total/dt/1e6:8.2f} M queries/s   "
              f"(survivor rows: {npts})", file=sys.stderr)

    print(json.dumps({
        "metric": "export_queries_per_s",
        "value": round(n_samples_total / results["compact"], 1),
        "unit": "queries/s",
        "speedup_vs_dense_transfer": round(
            results["dense"] / results["compact"], 2),
    }))


if __name__ == "__main__":
    main()
