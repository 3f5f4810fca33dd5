"""Re-derive the MFU denominator with WORKLOAD-SHAPED matmuls (VERDICT r4
item 2ii).

The 80 TFLOP/s "measured bf16 peak" in utils/flops.py came from a 4096^3
square-matmul probe — 41% of the v5e paper peak (197), and not obviously
the right ceiling for the flagship's actual shapes (196k-row skinny
matmuls at widths 256/64/128).  This probe times, with the device-get
chain protocol (bench.py), bf16 matmul chains shaped like each component
of the train step:

  * square4096    — the original probe (continuity anchor)
  * trunk256      — [196608,256]@[256,256] relu chain (flagship trunk body)
  * trunk_in63    — [196608,63]@[63,256] (PE-encoded input layer)
  * prop64        — [1048576,33]@[33,64] -> [64,64] -> [64,1] (shipped
                    3x64 prop shape, net 1 sample count)
  * prop128       — [1048576,33]@[33,128] -> [128,1] (2x128 A/B shape)

Writes benchmarks/mfu_ceiling_results.json: per-shape TFLOP/s.  The MFU
denominator is then max(shape ceilings) with the per-component roofline
read directly off the matching row.

Usage: python benchmarks/mfu_ceiling.py [--out PATH]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time_chain(fn, args, flops_per_iter, iters=8, repeats=3, warmup=2):
    """fn(args) -> args must chain a data dependency; one device_get sync."""
    import jax
    for _ in range(warmup):
        args = fn(args)
    float(jax.device_get(jax.tree.leaves(args)[0].ravel()[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        a = args
        for _ in range(iters):
            a = fn(a)
        float(jax.device_get(jax.tree.leaves(a)[0].ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return flops_per_iter / best / 1e12


def probes():
    import jax
    import jax.numpy as jnp

    def mm(a, b):
        return jax.lax.dot(a, b, precision=None,
                           preferred_element_type=jnp.float32)

    out = {}
    key = jax.random.PRNGKey(0)

    # square4096: y = relu(y @ W), W [4096,4096], 8 chained
    W = jax.random.normal(key, (4096, 4096), jnp.bfloat16) * 0.02
    y0 = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    @jax.jit
    def sq(y):
        for _ in range(8):
            y = jnp.maximum(mm(y, W), 0).astype(jnp.bfloat16)
        return y
    out["square4096"] = _time_chain(sq, y0, 8 * 2 * 4096**3)

    # trunk256: [196608,256]@[256,256] relu chain, depth 8
    N = 196_608
    W2 = jax.random.normal(key, (256, 256), jnp.bfloat16) * 0.06
    h0 = jax.random.normal(key, (N, 256), jnp.bfloat16)

    @jax.jit
    def trunk(h):
        for _ in range(8):
            h = jnp.maximum(mm(h, W2), 0).astype(jnp.bfloat16)
        return h
    out["trunk256"] = _time_chain(trunk, h0, 8 * 2 * N * 256 * 256)

    # trunk_in63: the PE input layer [196608,63]@[63,256], re-projected
    # back to 63 to chain
    Win = jax.random.normal(key, (63, 256), jnp.bfloat16) * 0.1
    Wback = jax.random.normal(key, (256, 63), jnp.bfloat16) * 0.06
    x0 = jax.random.normal(key, (N, 63), jnp.bfloat16)

    @jax.jit
    def in63(x):
        for _ in range(8):
            x = jnp.maximum(mm(jnp.maximum(mm(x, Win), 0).astype(
                jnp.bfloat16), Wback), 0).astype(jnp.bfloat16)
        return x
    out["trunk_in63"] = _time_chain(
        in63, x0, 8 * (2 * N * 63 * 256 + 2 * N * 256 * 63))

    # prop shapes at prop-net-1's sample count (4096 rays x 256 samples)
    M = 1_048_576

    def prop_chain(widths):
        ws = []
        k = jax.random.PRNGKey(1)
        dims = [33] + list(widths) + [1]
        for i in range(len(dims) - 1):
            k, sub = jax.random.split(k)
            ws.append(jax.random.normal(sub, (dims[i], dims[i + 1]),
                                        jnp.bfloat16) * 0.1)
        x = jax.random.normal(k, (M, 33), jnp.bfloat16)

        @jax.jit
        def run(x):
            for _ in range(4):
                h = x
                for w in ws[:-1]:
                    h = jnp.maximum(mm(h, w), 0).astype(jnp.bfloat16)
                y = mm(h, ws[-1])                      # [M,1]
                x = (x + y.astype(jnp.bfloat16))       # chain dependency
            return x
        fl = 4 * sum(2 * M * a.shape[0] * a.shape[1] for a in ws)
        return run, x, fl

    for name, widths in (("prop64", (64, 64)), ("prop128", (128,))):
        run, x0p, fl = prop_chain(widths)
        out[name] = _time_chain(run, x0p, fl)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "mfu_ceiling_results.json"))
    args = ap.parse_args()
    import jax
    if os.environ.get("CROPNERF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CROPNERF_PLATFORM"])
    res = {k: round(v, 2) for k, v in probes().items()}
    payload = {"tflops_per_s": res, "platform": jax.default_backend(),
               "note": "bf16 matmul chains shaped like the train step's "
                       "components; device-get chain sync protocol"}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
