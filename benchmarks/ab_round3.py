"""Round-3 full-step A/B on v5e: fused-kernel tile sizes and prop-net remat.

    python benchmarks/ab_round3.py [variant ...]

Variants (default: all):
    base            current flagship defaults (tile 1024 / bwd 768)
    remat-props     jax.checkpoint the proposal density nets (the profiler
                    shows the prop backward at ~3.4 ms with ~0 of it in the
                    position-grad chain → residual-traffic-bound)
    tile2048        fused_tile=2048
    tile2048-b512   fused_tile=2048, fused_tile_bwd=512
    tile3072        fused_tile=3072
    tile4096        fused_tile=4096 (may exceed scoped vmem → reported)
    best-combo      tile2048 + remat-props

Measures ms/step with bench.py's sound chained-dispatch protocol.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variants(cfg0):
    def field(**kw):
        return dataclasses.replace(
            cfg0, model=dataclasses.replace(
                cfg0.model, field=dataclasses.replace(cfg0.model.field, **kw)))

    def model(**kw):
        return dataclasses.replace(
            cfg0, model=dataclasses.replace(cfg0.model, **kw))

    t2048 = field(fused_tile=2048)
    return {
        "base": cfg0,
        "remat-props": model(remat_props=True),
        "tile2048": t2048,
        "tile2048-b512": field(fused_tile=2048, fused_tile_bwd=512),
        "tile3072": field(fused_tile=3072),
        "tile4096": field(fused_tile=4096),
        "best-combo": dataclasses.replace(
            t2048, model=dataclasses.replace(t2048.model, remat_props=True)),
    }


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    import jax

    from bench import NUM_INNER, _make_bank, measure
    from cropnerf_tpu.models.config import PRESETS

    cfg0 = PRESETS["cropnerf-mxu"]
    table = variants(cfg0)
    names = names or list(table)
    bank, n_img = _make_bank()
    print(f"device: {jax.devices()[0]}  batch "
          f"{cfg0.train_num_rays_per_batch} rays, num_inner={NUM_INNER}",
          flush=True)
    results = {}
    for name in names:
        cfg = table[name]
        try:
            rays_per_s, ms = measure(cfg, bank, n_img)
            results[name] = (ms, rays_per_s)
            print(f"{name:16s} {ms:8.3f} ms/step   {rays_per_s/1e3:8.1f} k rays/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report per-variant failures
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc(limit=2)
        jax.clear_caches()
    if results:
        best = min(results, key=lambda k: results[k][0])
        print(f"\nbest: {best} at {results[best][0]:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
