"""Pallas hash-grid encoding kernel (forward).

TPU-native counterpart of tiny-cuda-nn's fused hash-grid lookup (SURVEY
§2.3 N1).  One kernel instance processes a [TILE_N] slab of positions for
one level: the level's entire table lives in VMEM (4 MB at 2^19 x 2 fp32),
the 8 corner hashes, gathers, and the trilinear blend all happen on-chip,
and only the blended features go back to HBM — no [N, 8, F] corner
intermediates ever materialise (the XLA path's main memory cost at large N).

**v5e Mosaic limitation (measured, 2026-08)**: Mosaic's ``tpu.dynamic_gather``
is a register-level gather — it requires the source to span a single vreg
along the gather dimension ("Not implemented: Multiple source vregs along
gather dimension"), so a 2^19-row hash table cannot be gathered inside a
Pallas kernel on this generation.  The kernel therefore runs in interpreter
mode (tests) and stands ready for future Mosaic gather support / SparseCore
generations; production uses the XLA gather path, which measures at HBM
roofline (~0.02 ms per 1.57 M samples, benchmarks/README.md).  Backward
uses the XLA scatter-add transpose via ``jax.custom_vjp`` with recompute.

Layouts: positions [3, N] (lane dim = N, 128-aligned); output [L, N, F].
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hashgrid import _PRIMES, hashgrid_encode, level_uses_dense


def _kernel(res_ref, dense_ref, pos_ref, table_ref, out_ref):
    """Grid: (L, N/TILE).  pos [3, TILE], table [1, T, F], out [1, TILE, F].

    ``dense_ref`` flags levels whose corner lattice fits the table: those
    index densely (collision-free, tcnn semantics) instead of hashing.
    """
    table_size = table_ref.shape[1]
    l = pl.program_id(0)
    res = res_ref[l]
    dense = dense_ref[l]
    x = pos_ref[0, :] * res
    y = pos_ref[1, :] * res
    z = pos_ref[2, :] * res
    bx, by, bz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - bx, y - by, z - bz
    # Mosaic has no f32→u32 cast; go through int32
    ix = bx.astype(jnp.int32).astype(jnp.uint32)
    iy = by.astype(jnp.int32).astype(jnp.uint32)
    iz = bz.astype(jnp.int32).astype(jnp.uint32)
    res_i = res.astype(jnp.int32).astype(jnp.uint32)
    side = res_i + 1
    ixc = jnp.minimum(ix, res_i - 1)
    iyc = jnp.minimum(iy, res_i - 1)
    izc = jnp.minimum(iz, res_i - 1)

    acc = jnp.zeros((pos_ref.shape[1], table_ref.shape[2]), jnp.float32)
    for corner in range(8):
        dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
        h = ((ix + dx) * jnp.uint32(_PRIMES[0])
             ^ (iy + dy) * jnp.uint32(_PRIMES[1])
             ^ (iz + dz) * jnp.uint32(_PRIMES[2]))
        hash_idx = h % jnp.uint32(table_size)
        dense_idx = ((ixc + dx) * side * side + (iyc + dy) * side
                     + (izc + dz))
        idx = jnp.where(dense > 0, dense_idx, hash_idx).astype(jnp.int32)
        w = ((fx if dx else 1.0 - fx)
             * (fy if dy else 1.0 - fy)
             * (fz if dz else 1.0 - fz))
        # take_along_axis maps onto Mosaic's dynamic-gather (jnp.take's
        # flat-index form does not)
        idx2 = jnp.broadcast_to(idx[:, None],
                                (idx.shape[0], table_ref.shape[2]))
        feats = jnp.take_along_axis(table_ref[0], idx2, axis=0)  # [TILE, F]
        acc = acc + feats * w[:, None]
    out_ref[0] = acc


def _forward(table: jnp.ndarray, positions: jnp.ndarray,
             resolutions: Sequence[int], tile_n: int,
             interpret: bool) -> jnp.ndarray:
    L, T, F = table.shape
    pos_t = positions.reshape(-1, 3).T                  # [3, N]
    N = pos_t.shape[1]
    res_arr = jnp.asarray(resolutions, jnp.float32)
    dense_arr = jnp.asarray(
        [1 if level_uses_dense(r, T) else 0 for r in resolutions], jnp.int32)
    out = pl.pallas_call(
        _kernel,
        grid=(L, N // tile_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # resolutions [L]
            pl.BlockSpec(memory_space=pltpu.SMEM),      # dense flags [L]
            pl.BlockSpec((3, tile_n), lambda l, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, F), lambda l, n: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, F), lambda l, n: (l, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N, F), jnp.float32),
        interpret=interpret,
    )(res_arr, dense_arr, pos_t.astype(jnp.float32), table)
    # [L, N, F] → [N, L*F]
    return jnp.transpose(out, (1, 0, 2)).reshape(N, L * F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def hashgrid_encode_pallas(table: jnp.ndarray, positions: jnp.ndarray,
                           resolutions: tuple, tile_n: int = 1024,
                           interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`cropnerf_tpu.ops.hashgrid.hashgrid_encode` with the
    fused Pallas forward.  positions [..., 3] in [0,1] → [..., L*F]."""
    batch_shape = positions.shape[:-1]
    flat = positions.reshape(-1, 3)
    if flat.shape[0] % tile_n != 0 or flat.shape[0] == 0:
        return hashgrid_encode(table, positions, resolutions)
    out = _forward(table, flat, resolutions, tile_n, interpret)
    return out.reshape(*batch_shape, out.shape[-1])


def _fwd(table, positions, resolutions, tile_n, interpret):
    return (hashgrid_encode_pallas(table, positions, resolutions, tile_n,
                                   interpret),
            (table, positions))


def _bwd(resolutions, tile_n, interpret, res, g):
    table, positions = res
    # backward through the jnp reference path (XLA scatter-add transpose for
    # the table; trilinear-weight derivative for positions — needed by the
    # camera optimizer, whose pose deltas flow into sample positions, and by
    # BayesRays offset injection).  Recompute-based: no residuals beyond the
    # primal inputs.
    _, vjp = jax.vjp(
        lambda t, p: hashgrid_encode(t, p, resolutions), table, positions)
    dtable, dpos = vjp(g)
    return dtable, dpos


hashgrid_encode_pallas.defvjp(_fwd, _bwd)
