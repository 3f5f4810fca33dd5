"""Matched-budget PSNR parity: hash-grid preset vs the MXU flagship.

The `cropnerf-mxu` flagship replaces the reference's hash-grid field with
PE-MLPs to sidestep the v5e random-access wall (benchmarks/README.md).
This harness answers the quality question that swap raises: train BOTH
presets for the same number of optimizer steps on the same scene and
compare rendered-view PSNR at checkpoints.  (Real-data parity on 3DCotton
is still pending the dataset — ROADMAP.md — but identical protocol applies.)

Protocol per preset: train on the scene, render held-out-style views at
each checkpoint step, report mean PSNR vs the ground-truth images.  Same
seed, same sampling, same losses.

Arms (--presets):
  * plain preset names compare the presets AS SHIPPED: the mxu presets
    pair the PE field with their Adam(1e-3, eps 1e-8) stability regime
    while the hash presets keep the reference's Adam(1e-2, eps 1e-15) —
    the reference regime diverges on PE MLPs (models/config.py), so that
    direction of a field-only A/B is not shippable.
  * ``<preset>@mxu-opt`` (e.g. ``cropnerf@mxu-opt``) runs the preset under
    the mxu optimizer regime — the CONVERSE control (VERDICT r3 weak
    point 1): hash field + Adam 1e-3/eps 1e-8/decay-to-1e-5-over-50k.
    ``cropnerf-mxu`` vs ``cropnerf@mxu-opt`` isolates the FIELD swap.

Scenes (--scene):
  * ``sphere``  — the 24-view single-sphere fixture (.sphere_data.npz).
  * ``orchard`` — the dress-rehearsal scene (11 textured crops + grey
    occluders, 40 cams at 312x240): many small objects, occlusion and
    high-frequency texture — the regime where hash grids should shine
    (VERDICT r3 weak point 2).

Usage:
    python benchmarks/psnr_parity.py [--steps 2000] [--scene orchard] \
        [--presets cropnerf-mxu,cropnerf,cropnerf@mxu-opt]
Writes benchmarks/psnr_parity_results.json (use --out for smoke runs).
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
_SCENE_VIEWS = {"sphere": (0, 12), "orchard": (0, 13, 27)}
VIEWS = _SCENE_VIEWS["sphere"]     # set per --scene in main()


def _build(scene: str = "sphere"):
    if scene == "sphere":
        from sphere_fixture import load_sphere_bank
        return load_sphere_bank()
    assert scene == "orchard"
    import jax.numpy as jnp

    from cropnerf_tpu.data.databank import build_pixel_bank
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from dress_rehearsal import CROP_R, OCC_R, scene_centers
    from synthetic import render_multi_sphere_images, ring_cameras

    n_cams, h, w = 40, 240, 312
    crops, occluders = scene_centers()
    elevations = tuple(np.tile([0.45, 1.0, 1.55], n_cams)[:n_cams])
    cams = ring_cameras(n=n_cams, radius=2.2, height=h, width=w,
                        focal=260.0, elevations=elevations)
    images, masks, _ = render_multi_sphere_images(
        cams, h, w, crops, radius=CROP_R, occluders=occluders,
        occluder_radius=OCC_R, texture_freq=35.0)
    return build_pixel_bank(images, masks, cams), images, cams, n_cams, h, w


def _make_cfg(spec: str):
    """'name' or 'name@mxu-opt' → (label, TrainConfig)."""
    import dataclasses

    from cropnerf_tpu.models.config import PRESETS
    if "@" not in spec:
        return spec, PRESETS[spec]
    name, variant = spec.split("@", 1)
    assert variant == "mxu-opt", f"unknown variant {variant!r}"
    # the mxu flagship's optimizer block (models/config.py cropnerf-mxu)
    cfg = dataclasses.replace(
        PRESETS[name], optimizer="adam",
        learning_rate=1e-3, lr_final=1e-5, lr_decay_max_steps=50_000,
        prop_learning_rate=1e-3, prop_lr_final=1e-5,
        prop_lr_decay_max_steps=50_000, adam_eps=1e-8)
    return spec, cfg


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


def run_preset(name: str, steps: int, checkpoints,
               scene: str = "sphere") -> dict:
    import jax

    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_render_fn, make_train_step

    name, cfg = _make_cfg(name)
    bank, images, cams, n, h, w = _build(scene)
    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
    # hash steps are ~1.4 s — keep dispatches single-step there so syncs
    # stay frequent; the mxu step fuses 10.  Keyed on the FIELD type, not
    # the spec string: `cropnerf@mxu-opt` is still the slow hash field.
    num_inner = 10 if cfg.model.field.field_type != "hash" else 1
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
    global VIEWS
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--presets", default="cropnerf-mxu,cropnerf")
    ap.add_argument("--scene", default="sphere",
                    choices=sorted(_SCENE_VIEWS))
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "psnr_parity_results.json"),
        help="results path (point smoke runs elsewhere to avoid "
             "clobbering the committed v5e study)")
    args = ap.parse_args()

    import jax
    if os.environ.get("CROPNERF_PLATFORM"):   # axon ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])
    VIEWS = _SCENE_VIEWS[args.scene]

    checkpoints = [250, 500, 1000, 2000, 4000, 8000]
    results = []
    for name in args.presets.split(","):
        results.append(run_preset(name.strip(), args.steps, checkpoints,
                                  scene=args.scene))
        with open(args.out, "w") as f:   # write after each preset (long runs)
            json.dump({"steps": args.steps, "scene": args.scene,
                       "views": list(VIEWS), "results": results}, f,
                      indent=1)
    summary = {r["preset"]: r["checkpoints"][-1]["psnr"] for r in results}
    print(json.dumps({"metric": "psnr_parity", "steps": args.steps,
                      "scene": args.scene, "final_psnr": summary}))


if __name__ == "__main__":
    main()
