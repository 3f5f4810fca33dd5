"""Pallas fully-fused MLP kernel.

TPU-native equivalent of tiny-cuda-nn's fully-fused MLPs (SURVEY §2.3 N1,
bound at /root/reference/crop_nerf/fruit_nerf/fruit_field.py:133-167).
XLA cannot fuse *through* a dot, so a plain 2-layer MLP over N≈10^6 samples
writes the [N, hidden] activation to HBM between layers; this kernel keeps a
[TILE_N, hidden] slab in VMEM across all layers — one HBM read of x and one
write of y total.  All matmuls hit the MXU in bf16 with fp32 accumulation.

Backward uses the same fused structure through a custom VJP: the hidden
activations are *recomputed* in the backward kernel (tcnn does the same),
so nothing but x is saved — which composes with the model-level
rematerialisation strategy.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..mlp import default_compute_dtype as _cdt
# _cdt(): bf16 (native MXU) unless CROPNERF_FP32_MATMUL=1 (fp32
# verification arm for the sharded-grad oracle; trace-time read)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, *refs):
    """refs = (w0, b0, w1, b1, ..., out)."""
    out_ref = refs[-1]
    wbs = refs[:-1]
    n_layers = len(wbs) // 2
    h = x_ref[:].astype(_cdt())
    for i in range(n_layers):
        w, b = wbs[2 * i], wbs[2 * i + 1]
        h = jnp.dot(h, w[:].astype(_cdt()),
                    preferred_element_type=jnp.float32) + b[:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0).astype(_cdt())
    out_ref[:] = h.astype(jnp.float32)


def _bwd_kernel(x_ref, *refs):
    """refs = (w0, b0, ..., g, dx, dw0, db0, ...).

    Recomputes the forward in VMEM, then backprops the slab.  Weight/bias
    grads are accumulated across the N-grid (output revisiting with
    accumulation on the first axis of the grid).
    """
    n_layers = (len(refs) - 2) // 4
    wbs = refs[:2 * n_layers]
    g_ref = refs[2 * n_layers]
    dx_ref = refs[2 * n_layers + 1]
    dwbs = refs[2 * n_layers + 2:]

    # forward recompute, stashing pre-activation masks + activations
    h = x_ref[:].astype(_cdt())
    acts = [h]
    for i in range(n_layers):
        w, b = wbs[2 * i], wbs[2 * i + 1]
        h = jnp.dot(h, w[:].astype(_cdt()),
                    preferred_element_type=jnp.float32) + b[:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
        acts.append(h.astype(_cdt()))

    first = pl.program_id(0) == 0
    g = g_ref[:].astype(jnp.float32)
    for i in reversed(range(n_layers)):
        a_in = acts[i]                          # [TILE, d_in] bf16
        # dw[d_in, d_out] = sum_n a[n, d_in] g[n, d_out]  (contract batch dim
        # via dot_general — Mosaic rejects explicit .T on MXU operands)
        dw = jax.lax.dot_general(
            a_in, g.astype(_cdt()),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(first)
        def _(i=i, dw=dw, db=db):
            dwbs[2 * i][:] = dw
            dwbs[2 * i + 1][:] = db

        @pl.when(jnp.logical_not(first))
        def _(i=i, dw=dw, db=db):
            dwbs[2 * i][:] = dwbs[2 * i][:] + dw
            dwbs[2 * i + 1][:] = dwbs[2 * i + 1][:] + db

        # g_in[n, d_in] = sum_dout g[n, d_out] W[d_in, d_out]
        g = jax.lax.dot_general(
            g.astype(_cdt()), wbs[2 * i][:].astype(_cdt()),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if i > 0:
            # relu mask — compare in f32: Mosaic can't combine a bf16
            # predicate (16 elts/lane-row) with an f32 select (8 elts)
            g = jnp.where(acts[i].astype(jnp.float32) > 0.0, g, 0.0)
    dx_ref[:] = g


def _pad_dim(d: int, m: int = 128) -> int:
    return ((d + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mlp(x: jnp.ndarray, wbs: Sequence[jnp.ndarray],
              tile_n: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """x [N, Din] → [N, Dout] through relu-MLP weights
    wbs = [W0, b0, W1, b1, ...] (biases [1, d])."""
    return _fused_mlp_fwd(x, wbs, tile_n, interpret)[0]


def _call_fwd(x, wbs, tile_n, interpret):
    N, Din = x.shape
    Dout = wbs[-2].shape[1]
    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, Din), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((tile_n, Dout), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, Dout), jnp.float32),
        grid=grid, in_specs=in_specs, out_specs=out_spec,
        interpret=interpret,
    )(x, *wbs)


def _fused_mlp_fwd(x, wbs, tile_n, interpret):
    N = x.shape[0]
    if N % tile_n != 0 or N == 0:
        # ragged: fall back to plain jnp (still correct, just unfused)
        h = x.astype(_cdt())
        n_layers = len(wbs) // 2
        for i in range(n_layers):
            h = jnp.dot(h, wbs[2 * i].astype(_cdt()),
                        preferred_element_type=jnp.float32) + wbs[2 * i + 1]
            if i < n_layers - 1:
                h = jnp.maximum(h, 0.0).astype(_cdt())
        return h.astype(jnp.float32), (x, tuple(wbs))
    return _call_fwd(x, wbs, tile_n, interpret), (x, tuple(wbs))


def _fused_mlp_bwd(tile_n, interpret, res, g):
    x, wbs = res
    N, Din = x.shape
    n_layers = len(wbs) // 2
    if N % tile_n != 0 or N == 0:
        # mirror the ragged fallback with plain autodiff
        def f(x, wbs):
            h = x.astype(_cdt())
            for i in range(n_layers):
                h = jnp.dot(h, wbs[2 * i].astype(_cdt()),
                            preferred_element_type=jnp.float32) + wbs[2 * i + 1]
                if i < n_layers - 1:
                    h = jnp.maximum(h, 0.0).astype(_cdt())
            return h.astype(jnp.float32)
        _, vjp = jax.vjp(f, x, list(wbs))
        dx, dwbs = vjp(g)
        return dx, dwbs

    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, Din), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    Dout = wbs[-2].shape[1]
    in_specs.append(pl.BlockSpec((tile_n, Dout), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))          # g
    out_shapes = [jax.ShapeDtypeStruct((N, Din), jnp.float32)]      # dx
    out_specs = [pl.BlockSpec((tile_n, Din), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for w in wbs:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        _bwd_kernel,
        out_shape=tuple(out_shapes),
        grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        interpret=interpret,
    )(x, *wbs, g)
    dx = outs[0]
    dwbs = list(outs[1:])
    return dx, dwbs


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
