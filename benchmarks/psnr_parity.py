"""Matched-budget PSNR parity: hash-grid preset vs the MXU flagship.

The `cropnerf-mxu` flagship replaces the reference's hash-grid field with
PE-MLPs to sidestep the v5e random-access wall (benchmarks/README.md).
This harness answers the quality question that swap raises: train BOTH
presets for the same number of optimizer steps on the same scene and
compare rendered-view PSNR at checkpoints.  (Real-data parity on 3DCotton
is still pending the dataset — ROADMAP.md — but identical protocol applies.)

Protocol per preset: train on the 24-view synthetic sphere scene
(.sphere_data.npz), render views {0, 12} at each checkpoint step, report
mean PSNR vs the ground-truth images.  Same seed, same sampling, same
losses.  NOTE this compares the presets AS SHIPPED: the mxu presets pair
the PE field with their Adam(1e-3, eps 1e-8) stability regime while the
hash presets keep the reference's Adam(1e-2, eps 1e-15) — the reference
regime diverges on PE MLPs (models/config.py), so a field-only controlled
A/B is not shippable; results are preset-vs-preset (field + optimizer
regime), not the field swap in isolation.

Usage:
    python benchmarks/psnr_parity.py [--steps 2000] \
        [--presets cropnerf-mxu,cropnerf]
Writes benchmarks/psnr_parity_results.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIEWS = (0, 12)


def _build():
    from sphere_fixture import load_sphere_bank
    return load_sphere_bank()


def _render_psnr(render, params, cams, images, h, w):
    import jax
    vals = []
    for v in VIEWS:
        out = render(params, cams, v, h, w)
        rgb = np.asarray(jax.device_get(out["rgb"]))
        gt = images[v].astype(np.float32) / 255.0
        mse = float(np.mean((rgb - gt) ** 2))
        vals.append(-10.0 * np.log10(max(mse, 1e-10)))
    return float(np.mean(vals))


def run_preset(name: str, steps: int, checkpoints) -> dict:
    import jax

    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_render_fn, make_train_step

    cfg = PRESETS[name]
    bank, images, cams, n, h, w = _build()
    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
    # hash steps are ~1.4 s — keep dispatches single-step there so syncs
    # stay frequent; the mxu step fuses 10
    num_inner = 10 if "mxu" in name else 1
    step = make_train_step(cfg, num_inner=num_inner)
    render = make_render_fn(cfg)
    key = jax.random.PRNGKey(1)

    rows = []
    done = 0
    train_s = 0.0        # step-loop time only (renders/compile excluded)
    t0 = time.perf_counter()
    rows.append({"step": 0,
                 "psnr": _render_psnr(render, state.params, cams, images,
                                      h, w)})
    print(f"{name} step 0: psnr={rows[-1]['psnr']:.2f}", flush=True)
    # always end the ladder exactly at `steps` (a hardcoded ladder would
    # silently train fewer steps than requested for large --steps)
    targets = [c for c in checkpoints if c < steps] + [steps]
    m = None
    for target in targets:
        t_loop = time.perf_counter()
        while done < target:
            key, sub = jax.random.split(key)
            state, m = step(state, bank, sub)
            done += num_inner
            if (done // num_inner) % 10 == 0:
                float(jax.device_get(m["loss"]))     # bound the queue
        if m is not None:
            float(jax.device_get(m["loss"]))
        train_s += time.perf_counter() - t_loop
        p = _render_psnr(render, state.params, cams, images, h, w)
        rows.append({"step": done, "psnr": p, "train_s": round(train_s, 1),
                     "elapsed_s": round(time.perf_counter() - t0, 1)})
        print(f"{name} step {done}: psnr={p:.2f} "
              f"(train {rows[-1]['train_s']}s, wall {rows[-1]['elapsed_s']}s)",
              flush=True)
    # train_s excludes checkpoint renders but the FIRST step-loop interval
    # still contains the one-off jit compile; steady-state ms/step is the
    # honest per-preset speed figure
    steady = None
    if len(rows) >= 3:
        steady = ((rows[-1]["train_s"] - rows[1]["train_s"])
                  / max(rows[-1]["step"] - rows[1]["step"], 1) * 1e3)
    return {"preset": name, "checkpoints": rows,
            "train_s": round(train_s, 1),
            "wall_s": round(time.perf_counter() - t0, 1),
            "steady_ms_per_step": round(steady, 2) if steady else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--presets", default="cropnerf-mxu,cropnerf")
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "psnr_parity_results.json"),
        help="results path (point smoke runs elsewhere to avoid "
             "clobbering the committed v5e study)")
    args = ap.parse_args()

    import jax
    if os.environ.get("CROPNERF_PLATFORM"):   # axon ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])

    checkpoints = [250, 500, 1000, 2000, 4000, 8000]
    results = []
    for name in args.presets.split(","):
        results.append(run_preset(name.strip(), args.steps, checkpoints))
        with open(args.out, "w") as f:   # write after each preset (long runs)
            json.dump({"steps": args.steps, "views": list(VIEWS),
                       "results": results}, f, indent=1)
    summary = {r["preset"]: r["checkpoints"][-1]["psnr"] for r in results}
    print(json.dumps({"metric": "psnr_parity", "steps": args.steps,
                      "final_psnr": summary}))


if __name__ == "__main__":
    main()
