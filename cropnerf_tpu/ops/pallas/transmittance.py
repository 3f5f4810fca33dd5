"""Pallas transmittance-scan kernel.

TPU-native equivalent of nerfacc's CUDA ``render_weight_from_density``
(SURVEY §2.3 N2).  The scan is an exclusive cumulative sum of sigma*delta
along the sample axis followed by elementwise math; this kernel keeps one
[TILE_R, S] slab of rays in VMEM and emits weights without intermediate HBM
traffic.  XLA's fused cumsum is already close to roofline for small S, so
the jnp path (ops/render.py) is the default — :func:`render_weights_pallas`
exists for very long sample axes (volume export: S up to 3000) where keeping
the slab resident wins, and as the scan pattern on which to build packed
variants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inclusive_scan(x):
    """Hillis-Steele prefix sum along the lane axis — Mosaic has no cumsum
    primitive, so build it from log2(S) masked rolls."""
    S = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < S:
        shifted = pltpu.roll(x, k, axis=x.ndim - 1)
        x = x + jnp.where(col >= k, shifted, 0.0)
        k *= 2
    return x


def _kernel(density_ref, deltas_ref, weights_ref):
    tau = density_ref[:] * deltas_ref[:]
    alpha = 1.0 - jnp.exp(-tau)
    accum = _inclusive_scan(tau)
    trans = jnp.exp(-(accum - tau))
    weights_ref[:] = alpha * trans


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def render_weights_pallas(density: jnp.ndarray, deltas: jnp.ndarray,
                          tile_r: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """weights = alpha * T along the sample axis; density/deltas [R, S]."""
    R, S = density.shape
    tile_r = min(tile_r, R)
    if R % tile_r != 0:
        # fall back to the jnp path for ragged shapes
        from ..render import render_weights
        return render_weights(density, deltas)
    grid = (R // tile_r,)
    spec = pl.BlockSpec((tile_r, S), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(density.astype(jnp.float32), deltas.astype(jnp.float32))
