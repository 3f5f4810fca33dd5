"""A/B the cell-packed dense-level hash encode on the reference-parity
(`cropnerf`) preset: full train step, cell_pack off vs on.

    python benchmarks/ab_cellpack.py

Short protocol (the hash step is seconds long): num_inner=1, a handful of
chained dispatches, one device_get sync — still the sound data-dependency
measurement, just fewer samples.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(step, state, bank, warmup=1, iters=3, repeats=2):
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
        assert np.isfinite(loss), loss
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def with_cell_pack(cfg, on: bool):
    def grid(g):
        return dataclasses.replace(g, cell_pack=on)

    m = cfg.model
    field = dataclasses.replace(m.field, grid=grid(m.field.grid))
    props = tuple(dataclasses.replace(p, grid=grid(p.grid))
                  for p in m.proposal_fields)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(m, field=field, proposal_fields=props))


def main() -> None:
    import jax

    from bench import _make_bank
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.ops.hashgrid import level_resolutions, level_uses_dense
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_train_step

    cfg0 = PRESETS["cropnerf"]
    g = cfg0.model.field.grid
    res = level_resolutions(g.num_levels, g.min_res, g.max_res)
    dense = [r for r in res if level_uses_dense(r, 2 ** g.log2_hashmap_size)]
    print(f"device: {jax.devices()[0]}; field levels {res}, "
          f"dense (cell-packable): {dense}", flush=True)

    bank, n_img = _make_bank()
    for name, on in (("cell_pack=off", False), ("cell_pack=on", True)):
        cfg = with_cell_pack(cfg0, on)
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   num_images=n_img)
        step = make_train_step(cfg, num_inner=1)
        dt = _time(step, state, bank)
        print(f"{name:14s} {dt*1e3:9.1f} ms/step", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
