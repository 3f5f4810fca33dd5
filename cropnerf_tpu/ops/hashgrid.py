"""Multiresolution hash-grid encoding (Instant-NGP style), TPU-native.

Equivalent of tiny-cuda-nn's ``HashGrid`` encoding, bound in the reference at
/root/reference/crop_nerf/fruit_nerf/fruit_field.py:125-132 (field: 16 levels,
2^19 table, 2 features/level, max_res 2048) and via ``HashMLPDensityField``
proposal nets (fruit_nerf.py:124-141: 5 levels, 2^17 table).

Design (TPU-first, not a CUDA translation):
  * The table is a dense [L, T, F] fp32 array (one pytree leaf).  Forward is
    8 gathers + trilinear blend per level; XLA lowers gathers to efficient
    dynamic-slice sequences and fuses the blend.  Backward is the gather
    transpose (scatter-add), which XLA serialises per level — a Pallas
    accumulation kernel can replace it later behind the same function.
  * Levels are unrolled in Python (static L) so each level's gather gets its
    own fused kernel; resolutions are compile-time constants.
  * Hashing always applies (matching nerfstudio's torch HashEncoding; tcnn
    switches to dense indexing for small levels — documented divergence, the
    learned table simply uses hashed slots for those levels too).
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Spatial hashing primes from Instant-NGP (Teschner et al.).
_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(num_levels: int, min_res: int, max_res: int) -> Tuple[int, ...]:
    """Per-level grid resolutions N_l = floor(min_res * b^l)."""
    if num_levels == 1:
        return (min_res,)
    growth = math.exp((math.log(max_res) - math.log(min_res)) / (num_levels - 1))
    return tuple(int(math.floor(min_res * growth ** l + 1e-9)) for l in range(num_levels))


def hashgrid_init(key: jax.Array, num_levels: int, features_per_level: int,
                  log2_hashmap_size: int, scale: float = 1e-4) -> jnp.ndarray:
    """Uniform(-scale, scale) table init, matching NGP's 1e-4 default.

    Returns table of shape [L, 2**log2_hashmap_size, F], float32.
    """
    table_size = 2 ** log2_hashmap_size
    return jax.random.uniform(
        key, (num_levels, table_size, features_per_level),
        minval=-scale, maxval=scale, dtype=jnp.float32)


def level_row_counts(resolutions: Sequence[int], table_size: int,
                     hash_mode: str = "auto") -> Tuple[int, ...]:
    """Per-level row counts of the PACKED layout: dense levels allocate
    exactly their (res+1)^3 corner lattice, hashed levels the full table —
    tcnn's actual allocation (it never wastes table_size rows on a coarse
    level), cf. fruit_field.py:125-132 binding the tcnn grid."""
    return tuple(
        ((res + 1) ** 3
         if hash_mode == "auto" and level_uses_dense(res, table_size)
         else table_size)
        for res in resolutions)


def hashgrid_init_packed(key: jax.Array, resolutions: Sequence[int],
                         features_per_level: int, log2_hashmap_size: int,
                         scale: float = 1e-4,
                         hash_mode: str = "auto") -> jnp.ndarray:
    """Packed-layout init: one [sum(rows_l), F] float32 array.

    vs the dense [L, T, F] layout this cuts the base field table from
    16×2^19 to ~6.1M rows (−27%) — params, optimizer moments, and the
    backward scatter all shrink accordingly.
    """
    rows = sum(level_row_counts(resolutions, 2 ** log2_hashmap_size,
                                hash_mode))
    return jax.random.uniform(key, (rows, features_per_level),
                              minval=-scale, maxval=scale, dtype=jnp.float32)


def _hash3(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray, table_size: int) -> jnp.ndarray:
    h = (ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])) \
        ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])) \
        ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def level_uses_dense(res: int, table_size: int) -> bool:
    """tcnn indexes coarse levels DENSELY (collision-free) when the full
    (res+1)^3 corner lattice fits the table, and only hashes finer levels —
    the behaviour of the reference's actual backend
    (``implementation="tcnn"``, fruit_field.py:95)."""
    return (res + 1) ** 3 <= table_size


def _dense_cell_view(table2d: jnp.ndarray, off: int, res: int,
                     F: int) -> jnp.ndarray:
    """Cell-packed view of one dense level: row c holds the 8 corner features
    of cell c, corner-major ([c0F | c1F | ... | c7F], corner bits as in
    :func:`_level_corners`).

    Built from the canonical corner lattice with 8 shifted strided slices —
    dense contiguous reads, no random access.  The point: ONE wide row gather
    per sample replaces 8 narrow ones (v5e random HBM access is ~6-8 ns per
    ROW regardless of width; measured in benchmarks/README.md)."""
    side = res + 1
    c3 = jax.lax.dynamic_slice_in_dim(table2d, off, side ** 3, 0)
    c3 = c3.reshape(side, side, side, F)
    parts = []
    for corner in range(8):
        dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
        parts.append(c3[dx:dx + res, dy:dy + res, dz:dz + res, :])
    return jnp.concatenate(parts, axis=-1).reshape(res ** 3, 8 * F)


def _cell_index(pos: jnp.ndarray, res: int):
    """Clipped cell coordinates + fractional offsets (matches the corner
    logic of :func:`hashgrid_encode_ref` for dense levels)."""
    scaled = pos * res
    basef = jnp.floor(scaled)
    frac = scaled - basef
    base = jnp.clip(basef.astype(jnp.int32), 0, res - 1)
    cell = (base[:, 0] * res + base[:, 1]) * res + base[:, 2]
    return cell, frac


def _corner_terms(frac: jnp.ndarray, corner: int):
    """Per-dim trilinear terms t_d (the weight factors) and signs s_d
    (dt_d/dfrac_d) for one corner — the single source of truth for the
    corner weight/derivative math used by the forward, the analytic
    backward, and the cell-packed paths."""
    bits = (corner & 1, (corner >> 1) & 1, (corner >> 2) & 1)
    t = [frac[:, d] if b else 1.0 - frac[:, d] for d, b in enumerate(bits)]
    s = [(1.0 if b else -1.0) for b in bits]
    return t, s


def _corner_weight(frac: jnp.ndarray, corner: int) -> jnp.ndarray:
    t, _ = _corner_terms(frac, corner)
    return t[0] * t[1] * t[2]


def _corner_w_dw(frac: jnp.ndarray, corner: int, res: int):
    """Trilinear weight w [M] and its position derivative dw [M, 3]
    (∂w/∂pos, including the ×res chain factor from pos → frac)."""
    t, s = _corner_terms(frac, corner)
    w = t[0] * t[1] * t[2]
    dw = jnp.stack([s[0] * t[1] * t[2],
                    t[0] * s[1] * t[2],
                    t[0] * t[1] * s[2]], axis=-1) * float(res)
    return w, dw


def hashgrid_encode_ref(table: jnp.ndarray, positions: jnp.ndarray,
                        resolutions: Sequence[int],
                        hash_mode: str = "auto",
                        table_size: int | None = None,
                        cell_pack: bool = False) -> jnp.ndarray:
    """Encode positions in [0,1]^3 → features.

    table:      [L, T, F] (dense layout) or [sum(rows_l), F] (packed layout,
                :func:`hashgrid_init_packed`; requires ``table_size``)
    positions:  [..., 3] (values outside [0,1] are clamped by the caller's
                selector; the hash itself tolerates any finite input)
    resolutions: static per-level grid sizes, len == L.
    hash_mode:  "auto" (tcnn semantics: dense indexing for levels whose
                corner lattice fits the table, hashed otherwise) or "hash"
                (always hash, nerfstudio's torch HashEncoding semantics).
    table_size: 2**log2_hashmap_size; inferred for the dense layout.
    cell_pack:  route dense levels through the cell-packed view
                (:func:`_dense_cell_view`): one wide row gather per sample
                instead of 8 narrow ones.  Value-identical (same corner
                features, same blend order).

    Returns [..., L*F] float32.
    """
    packed = table.ndim == 2
    if packed:
        assert table_size is not None, "packed layout needs table_size"
        F = table.shape[1]
        offsets, total = _level_offsets(resolutions, table_size, hash_mode,
                                        packed=True)
        assert total == table.shape[0], (total, table.shape[0])
    else:
        L, table_size_, F = table.shape
        assert len(resolutions) == L, (len(resolutions), L)
        table_size = table_size or table_size_
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    if cell_pack:
        offsets_all, _ = _level_offsets(resolutions, table_size, hash_mode,
                                        packed)
        table2d = table if packed else table.reshape(-1, F)

    outs = []
    for l, res in enumerate(resolutions):
        dense = hash_mode == "auto" and level_uses_dense(res, table_size)
        if dense and cell_pack:
            view = _dense_cell_view(table2d, offsets_all[l], res, F)
            cell, frac = _cell_index(pos, res)
            row = view[cell]                                  # [M, 8F]
            feats = jnp.zeros((pos.shape[0], F), dtype=jnp.float32)
            for corner in range(8):
                w = _corner_weight(frac, corner)
                feats = feats + (row[:, corner * F:(corner + 1) * F]
                                 * w[:, None])
            outs.append(feats)
            continue
        scaled = pos * res
        base = jnp.floor(scaled)
        frac = scaled - base
        base = base.astype(jnp.int32)
        if dense:
            # clamp so corner indices stay in [0, res]
            base = jnp.clip(base, 0, res - 1)
            side = res + 1

        feats = jnp.zeros((pos.shape[0], F), dtype=jnp.float32)
        # 8 corners, unrolled: weight = prod over dims of (frac or 1-frac).
        for corner in range(8):
            dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            if dense:
                idx = ((base[:, 0] + dx) * side * side
                       + (base[:, 1] + dy) * side + (base[:, 2] + dz))
            else:
                idx = _hash3(base[:, 0] + dx, base[:, 1] + dy,
                             base[:, 2] + dz, table_size)
            w = ((frac[:, 0] if dx else 1.0 - frac[:, 0])
                 * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                 * (frac[:, 2] if dz else 1.0 - frac[:, 2]))
            row = table[offsets[l] + idx, :] if packed else table[l, idx, :]
            feats = feats + row * w[:, None]
        outs.append(feats)

    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*batch_shape, len(resolutions) * F)


# ---------------------------------------------------------------------------
# Production encode: custom VJP with flat per-column scatters.
#
# Measured on v5e (2026-08-18, honest device_get sync): XLA's transpose of a
# row gather from a [T, F] table is a [T, F] scatter-add at ~79 ns/row —
# random-access LATENCY-bound and 10.7x slower than the same data scattered
# as per-column 1-D scatter-adds (~7.4 ns/row).  The custom backward below
# rewrites the table gradient as F flat scatters per level and computes the
# position gradient analytically (trilinear-weight derivative), turning the
# dominant cost of the hash-field backward from ~6.6 s/step to ~1.2 s/step
# at the base config.  Forward keeps the [T, F] row gather (measured best).
# ---------------------------------------------------------------------------


def _level_corners(pos: jnp.ndarray, res: int, table_size: int,
                   hash_mode: str):
    """Per-level corner rows + trilinear weights and their pos-derivatives.

    pos: [M, 3] in [0,1].  Returns (idx [8, M] int32 rows within the level,
    w [8, M], dw [8, M, 3] = ∂w/∂pos).
    """
    dense = hash_mode == "auto" and level_uses_dense(res, table_size)
    scaled = pos * res
    basef = jnp.floor(scaled)
    frac = scaled - basef
    base = basef.astype(jnp.int32)
    if dense:
        base = jnp.clip(base, 0, res - 1)
        side = res + 1
    idxs, ws, dws = [], [], []
    for corner in range(8):
        bits = (corner & 1, (corner >> 1) & 1, (corner >> 2) & 1)
        if dense:
            idx = ((base[:, 0] + bits[0]) * side * side
                   + (base[:, 1] + bits[1]) * side + (base[:, 2] + bits[2]))
        else:
            idx = _hash3(base[:, 0] + bits[0], base[:, 1] + bits[1],
                         base[:, 2] + bits[2], table_size)
        w, dw = _corner_w_dw(frac, corner, res)
        ws.append(w)
        dws.append(dw)
        idxs.append(idx)
    return jnp.stack(idxs), jnp.stack(ws), jnp.stack(dws)


def _level_offsets(resolutions, table_size: int, hash_mode: str, packed: bool):
    if packed:
        offs, off = [], 0
        for rows in level_row_counts(resolutions, table_size, hash_mode):
            offs.append(off)
            off += rows
        return offs, off
    L = len(resolutions)
    return [l * table_size for l in range(L)], L * table_size


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _encode_opt(table, positions, resolutions, hash_mode, table_size,
                cell_pack):
    return hashgrid_encode_ref(table, positions, resolutions, hash_mode,
                               table_size, cell_pack)


def _encode_opt_fwd(table, positions, resolutions, hash_mode, table_size,
                    cell_pack):
    return (hashgrid_encode_ref(table, positions, resolutions, hash_mode,
                                table_size, cell_pack),
            (table, positions))


def _encode_opt_bwd(resolutions, hash_mode, table_size, cell_pack,
                    residuals, g):
    table, positions = residuals
    packed = table.ndim == 2
    F = table.shape[-1]
    L = len(resolutions)
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    M = pos.shape[0]
    g2 = g.reshape(M, L, F).astype(jnp.float32)
    offsets, total = _level_offsets(resolutions, table_size, hash_mode,
                                    packed)
    table2d = table if packed else table.reshape(-1, F)

    dcols = [jnp.zeros((total,), jnp.float32) for _ in range(F)]
    dense_grads = []                 # (offset, [side^3, F]) per packed level
    dpos = jnp.zeros((M, 3), jnp.float32)
    for l, res in enumerate(resolutions):
        dense = hash_mode == "auto" and level_uses_dense(res, table_size)
        gl = g2[:, l, :]                               # [M, F]
        if dense and cell_pack:
            # one wide row gather (pos grads) + one wide row scatter (table
            # grads) per sample, then a dense 8-slice fold back to the
            # canonical corner lattice — vs 8 narrow gathers + 8F flat
            # scatter elements in the generic path below
            view = _dense_cell_view(table2d, offsets[l], res, F)
            cell, frac = _cell_index(pos, res)
            row = view[cell]                           # [M, 8F]
            dval_blocks = []
            for corner in range(8):
                w, dw = _corner_w_dw(frac, corner, res)
                dval_blocks.append(gl * w[:, None])
                dot = jnp.sum(row[:, corner * F:(corner + 1) * F] * gl,
                              axis=-1)
                dpos = dpos + dw * dot[:, None]
            dvals = jnp.concatenate(dval_blocks, axis=-1)   # [M, 8F]
            dview = jnp.zeros((res ** 3, 8 * F),
                              jnp.float32).at[cell].add(dvals)
            # fold the cell view's cotangent back onto corners: 8 dense
            # strided slice-adds (the transpose of _dense_cell_view)
            side = res + 1
            dv4 = dview.reshape(res, res, res, 8 * F)
            dc3 = jnp.zeros((side, side, side, F), jnp.float32)
            for corner in range(8):
                dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
                dc3 = dc3.at[dx:dx + res, dy:dy + res, dz:dz + res, :].add(
                    dv4[..., corner * F:(corner + 1) * F])
            dense_grads.append((offsets[l], dc3.reshape(side ** 3, F)))
            continue
        idx, w, dw = _level_corners(pos, res, table_size, hash_mode)
        rows = (offsets[l] + idx).reshape(-1)          # [8M] corner-major
        for f in range(F):
            vals = (w * gl[:, f][None, :]).reshape(-1)
            dcols[f] = dcols[f].at[rows].add(vals)
        # position grads need the gathered corner features
        feats = table2d[rows]                          # [8M, F]
        dot = jnp.sum(feats * jnp.tile(gl, (8, 1)), axis=-1)  # [8M]
        dpos = dpos + jnp.sum(dw * dot.reshape(8, M)[..., None], axis=0)
    dtable = jnp.stack(dcols, axis=-1)
    for off, dg in dense_grads:
        dtable = jax.lax.dynamic_update_slice_in_dim(
            dtable, jax.lax.dynamic_slice_in_dim(
                dtable, off, dg.shape[0], 0) + dg, off, 0)
    if not packed:
        dtable = dtable.reshape(L, table_size, F)
    return (dtable.astype(table.dtype),
            dpos.reshape(*batch_shape, 3).astype(positions.dtype))


_encode_opt.defvjp(_encode_opt_fwd, _encode_opt_bwd)


def hashgrid_encode(table: jnp.ndarray, positions: jnp.ndarray,
                    resolutions: Sequence[int],
                    hash_mode: str = "auto",
                    table_size: int | None = None,
                    cell_pack: bool = False) -> jnp.ndarray:
    """Production encode: forward of :func:`hashgrid_encode_ref`, backward
    via the flat-scatter custom VJP above (gradient-identical, ~5x faster
    on v5e).  ``cell_pack`` routes dense levels through the cell-packed view
    (one wide row gather/scatter per sample instead of 8 narrow gathers +
    8F flat scatter elements; see :func:`_dense_cell_view`)."""
    if table_size is None:
        assert table.ndim == 3, "packed layout needs table_size"
        table_size = table.shape[1]
    return _encode_opt(table, positions, tuple(resolutions), hash_mode,
                       table_size, cell_pack)
