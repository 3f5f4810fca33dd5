"""A/B: TPU-first proposal-net SHAPES (VERDICT r4 item 2i).

The flagship's proposal stack (2 PE nets, 64-wide x 3 layers) runs at
~9.5 TFLOP/s ≈ 12% of the measured ceiling — 64-wide matmuls fill half an
MXU tile (128x128).  This harness A/Bs MXU-tile-aligned alternatives at
matched quality on the sphere fixture:

  * ``3x64``  — the shipped shape (baseline; fruit_nerf.py:124-141
                HashMLPDensityField analogue, hidden 64)
  * ``2x128`` — one 128-wide hidden layer: FEWER flops/sample (8.9k vs
                12.7k) and full-tile matmuls
  * ``3x128`` — two 128-wide hidden layers: 3.3x flops at ~2x efficiency

Per arm: steady ms/step (device-get-synced chain protocol, bench.py) and
PSNR at checkpoints after the same number of optimizer steps.

Usage: python benchmarks/ab_propshape.py [--steps 1000] [--out PATH]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import NUM_INNER, _time_step  # noqa: E402


def make_arm_cfg(name: str):
    from cropnerf_tpu.models.config import PRESETS, ProposalFieldConfig
    base = PRESETS["cropnerf-mxu"]
    if name == "3x64":
        return base
    shapes = {"2x128": (128, 2), "3x128": (128, 3)}
    hidden, layers = shapes[name]
    props = tuple(
        dataclasses.replace(p, hidden_dim=hidden, num_layers=layers)
        for p in base.model.proposal_fields)
    return dataclasses.replace(
        base, model=dataclasses.replace(base.model, proposal_fields=props))


def run_arm(name: str, steps: int, bank, images, cams, n, h, w) -> dict:
    import jax

    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_render_fn, make_train_step
    from cropnerf_tpu.utils.flops import prop_flops_per_sample

    cfg = make_arm_cfg(name)
    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
    # donate=False: the timing chain below reuses `state` for the training
    # run — with donation the first dispatch would delete its buffers
    step = make_train_step(cfg, num_inner=NUM_INNER, donate=False)
    render = make_render_fn(cfg)

    # steady-state speed first (short chains; warm jit for training below)
    dt, _ = _time_step(step, state, bank, warmup=2, iters=10, repeats=3)
    ms_per_step = dt / NUM_INNER * 1e3

    key = jax.random.PRNGKey(1)
    rows = []
    done = 0
    # always end exactly at `steps` so no arm silently under-trains
    for target in [c for c in (250, 500, 1000, 2000, 4000)
                   if c < steps] + [steps]:
        while done < target:
            key, sub = jax.random.split(key)
            state, m = step(state, bank, sub)
            done += NUM_INNER
            if (done // NUM_INNER) % 10 == 0:
                float(jax.device_get(m["loss"]))
        float(jax.device_get(m["loss"]))
        vals = []
        for v in (0, 12):
            out = render(state.params, cams, v, h, w)
            rgb = np.asarray(jax.device_get(out["rgb"]))
            gt = images[v].astype(np.float32) / 255.0
            mse = float(np.mean((rgb - gt) ** 2))
            vals.append(-10.0 * np.log10(max(mse, 1e-10)))
        rows.append({"step": done, "psnr": round(float(np.mean(vals)), 3)})
        print(f"{name} step {done}: psnr={rows[-1]['psnr']:.2f}", flush=True)

    pf = [prop_flops_per_sample(p) for p in cfg.model.proposal_fields]
    R = cfg.train_num_rays_per_batch
    prop_fwd = sum(R * ns * f for ns, f in
                   zip(cfg.model.num_proposal_samples_per_ray, pf))
    return {"arm": name, "ms_per_step": round(ms_per_step, 3),
            "rays_per_s": round(R / dt * NUM_INNER, 1),
            "prop_fwd_flops_per_step": float(prop_fwd),
            "prop_flops_per_sample": pf,
            "checkpoints": rows}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--arms", default="3x64,2x128,3x128")
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "ab_propshape_results.json"))
    args = ap.parse_args()

    import jax
    if os.environ.get("CROPNERF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])

    from sphere_fixture import load_sphere_bank
    bank, images, cams, n, h, w = load_sphere_bank()

    results = []
    for arm in args.arms.split(","):
        t0 = time.perf_counter()
        results.append(run_arm(arm.strip(), args.steps, bank, images, cams,
                               n, h, w))
        results[-1]["wall_s"] = round(time.perf_counter() - t0, 1)
        with open(args.out, "w") as f:
            json.dump({"steps": args.steps, "results": results}, f, indent=1)
    print(json.dumps({
        "metric": "ab_propshape",
        "summary": {r["arm"]: {"ms_per_step": r["ms_per_step"],
                               "final_psnr": r["checkpoints"][-1]["psnr"]}
                    for r in results}}))


if __name__ == "__main__":
    main()
