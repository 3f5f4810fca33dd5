"""On-chip ablation profile of the cropnerf-mxu train step.

Decomposes the flagship step time by re-measuring the FULL fused-dispatch
train step under targeted config ablations (each is a separate XLA program;
differences give the cost of the ablated component).  Uses the sound sync
protocol (chained dispatches + one device_get, benchmarks/README.md) — run
only on a healthy tunnel.

    python benchmarks/profile_mxu.py              # all variants
    python benchmarks/profile_mxu.py full xla     # subset by name
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_INNER = 10


def _time_step(step, state, bank, warmup=2, iters=8, repeats=2):
    import jax
    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, metrics = step(state, bank, sub)
    float(jax.device_get(metrics["loss"]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, bank, sub)
        loss = float(jax.device_get(metrics["loss"]))
        best = min(best, (time.perf_counter() - t0) / iters)
        assert np.isfinite(loss), loss
    return best


def main() -> None:
    import jax
    from bench import _make_bank
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_train_step

    base = PRESETS["cropnerf-mxu"]
    m = base.model
    f = m.field

    def with_model(**kw):
        return dataclasses.replace(base, model=dataclasses.replace(m, **kw))

    def with_field(**kw):
        return with_model(field=dataclasses.replace(f, **kw))

    variants = {
        # baseline
        "full": base,
        # MLP impl A/B
        "xla-mlp": with_field(mlp_impl="xla"),
        # backward cost of interlevel+distortion (fw still computed for
        # metrics; mult=0 removes only the grad path)
        "no-il-dist-bw": with_model(interlevel_loss_mult=0.0,
                                    distortion_loss_mult=0.0),
        # sample-count slope: halve every per-ray sample count (halves the
        # field/prop matmul FLOPs AND the PDF/interlevel mask-reduce area)
        "half-samples": with_model(num_nerf_samples_per_ray=24,
                                   num_proposal_samples_per_ray=(128, 48)),
        # field width slope: 256 -> 128 quarters the base-MLP FLOPs, leaves
        # sampling/losses untouched
        "hidden-128": with_field(hidden_dim=128),
        # one proposal level: drops prop2 eval + the big first resample
        "one-prop": with_model(
            proposal_fields=m.proposal_fields[:1],
            num_proposal_samples_per_ray=(256,)),
        # camera-opt backward (SE3 exp + ray transform vjp over 4096 rays)
        "no-camopt": with_model(
            camera_opt=dataclasses.replace(m.camera_opt, mode="off")),
        # prop backward every step (the no-grad schedule's saving)
        "prop-bw-always": with_model(proposal_no_grad_schedule=False),
    }
    if len(sys.argv) > 1:
        variants = {k: v for k, v in variants.items() if k in sys.argv[1:]}

    bank, n_img = _make_bank()
    R = base.train_num_rays_per_batch
    print(f"devices: {jax.devices()}  rays/batch: {R}", flush=True)

    results = {}
    for name, cfg in variants.items():
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   num_images=n_img)
        step = make_train_step(cfg, num_inner=NUM_INNER)
        t0 = time.perf_counter()
        dt = _time_step(step, state, bank)
        ms = dt / NUM_INNER * 1e3
        results[name] = ms
        print(f"{name:16s} {ms:8.2f} ms/step  ({R/dt*NUM_INNER/1e3:7.1f} k rays/s)"
              f"   [compile+measure {time.perf_counter()-t0:.0f}s]", flush=True)
        del state, step
        # keep programs from accumulating; sync already happened
        jax.clear_caches()

    if "full" in results:
        print("\ndeltas vs full:")
        for k, v in results.items():
            if k != "full":
                print(f"  {k:16s} {results['full'] - v:+7.2f} ms")


if __name__ == "__main__":
    main()


# -- round-2 follow-up variants (proposal-MLP fusion + cond removal) --------
def _prop_variants():
    import dataclasses
    from cropnerf_tpu.models.config import PRESETS
    base = PRESETS["cropnerf-mxu"]
    m = base.model

    def props(impl):
        return tuple(dataclasses.replace(p, mlp_impl=impl)
                     for p in m.proposal_fields)

    return {
        "prop-pallas": dataclasses.replace(
            base, model=dataclasses.replace(m, proposal_fields=props("pallas"))),
        "prop-pallas-nocond": dataclasses.replace(
            base, model=dataclasses.replace(
                m, proposal_fields=props("pallas"),
                proposal_no_grad_schedule=False)),
    }
