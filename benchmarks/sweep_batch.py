"""Flagship train-step throughput vs ray-batch size (single chip).

The canonical bench (bench.py) pins the reference's 4096-ray batch for
comparability; this sweep shows the single-chip headroom beyond it —
larger batches amortise the step's fixed costs (raygen, sampling setup,
dispatch) over more rays until HBM/compute saturates.

Run:  python benchmarks/sweep_batch.py [--batches 4096,8192,16384,32768]
Writes benchmarks/sweep_batch_results.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4096,8192,16384,32768")
    ap.add_argument("--preset", default="cropnerf-mxu")
    args = ap.parse_args()

    if os.environ.get("CROPNERF_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])
    import jax

    from bench import NUM_INNER, _make_bank, _time_step
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_train_step

    bank, n_img = _make_bank()
    rows = []
    for R in (int(b) for b in args.batches.split(",")):
        cfg = dataclasses.replace(PRESETS[args.preset],
                                  train_num_rays_per_batch=R)
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   num_images=n_img)
        step = make_train_step(cfg, num_inner=NUM_INNER)
        try:
            dt, _ = _time_step(step, state, bank)
        except Exception as e:        # OOM etc. — record and continue
            print(f"R={R}: FAILED {str(e)[:160]}", file=sys.stderr,
                  flush=True)
            rows.append({"rays": R, "error": str(e)[:160]})
            jax.clear_caches()
            continue
        ms = dt / NUM_INNER * 1e3
        rps = R * NUM_INNER / dt
        rows.append({"rays": R, "ms_per_step": round(ms, 2),
                     "rays_per_s": round(rps, 1)})
        print(f"R={R:6d}  {ms:8.2f} ms/step  {rps / 1e3:8.1f} k rays/s",
              file=sys.stderr, flush=True)
        jax.clear_caches()

    out = os.path.join(REPO, "benchmarks", "sweep_batch_results.json")
    with open(out, "w") as f:
        json.dump({"preset": args.preset, "num_inner": NUM_INNER,
                   "rows": rows}, f, indent=1)
    best = max((r for r in rows if "rays_per_s" in r),
               key=lambda r: r["rays_per_s"], default=None)
    print(json.dumps({"metric": "batch_sweep_best_rays_per_s",
                      "value": best["rays_per_s"] if best else None,
                      "at_batch": best["rays"] if best else None}))


if __name__ == "__main__":
    main()
