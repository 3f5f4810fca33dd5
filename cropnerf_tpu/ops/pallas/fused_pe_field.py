"""Fully-fused positional-encoding NeRF field density kernel.

TPU-native equivalent of tiny-cuda-nn's "encoding + fully-fused MLP"
composite (SURVEY §2.3 N1; reference binding fruit_field.py:121-167 via the
legacy SemanticNeRFField, fruit_field.py:311-411) for the gather-free
`cropnerf-mxu` flagship.

One Pallas kernel computes, per VMEM-resident tile of samples:

    x [T, 3]  →  NeRF frequency encoding (sin/cos, F freqs)  →
    base MLP (all-relu)  →  skip concat [h, enc]  →  top MLP  →  [T, Dout]

so the only HBM traffic is one read of the raw positions and one write of
the [N, 1+geo] output.  The split `vanilla_field_density` path (XLA encode →
pallas base MLP → HBM round-trip of h → concat → pallas top MLP) moves
~1 GB/step of [N, 63..319] f32 intermediates at the flagship batch
(196k samples); this kernel moves ~14 MB.

The encoding is computed WITHOUT in-kernel concatenation or gathers (both
weak spots of Mosaic): a constant selector matrix S [3, 3+6F] maps
x → pre-activations in nerf_encoding's exact column order
([x, sin(f0·x), …, sin(f_{F-1}·x), cos(f0·x), …]), i.e. one skinny MXU
matmul, then a columnwise iota-select applies identity/sin/cos.  The skip
concat is likewise two partial matmuls against static row-slices of W_top0.

Backward recomputes everything in VMEM (tcnn-style; composes with the
model-level remat strategy) and emits dx through the sin/cos chain — camera
-pose and sampler gradients flow through sample positions, so dx is live.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..mlp import default_compute_dtype as _cdt
# _cdt(): bf16 (native MXU) unless CROPNERF_FP32_MATMUL=1 (fp32
# verification arm for the sharded-grad oracle; trace-time read)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pe_selector_matrix(num_freqs: int,
                       min_freq_exp: float = 0.0,
                       max_freq_exp: float | None = None,
                       dim: int = 3) -> np.ndarray:
    """S [dim, dim*(1+2F)] with (x @ S) the pre-activation of nerf_encoding.

    Column order matches ops/posenc.nerf_encoding exactly:
    [x(D) | sin block F*D | cos block F*D], sin/cos blocks laid out
    freq-major ([f0·d0, f0·d1, …, f1·d0, …]).
    """
    if max_freq_exp is None:
        max_freq_exp = num_freqs - 1
    freqs = 2.0 ** np.linspace(min_freq_exp, max_freq_exp, num_freqs)
    width = dim * (1 + 2 * num_freqs)
    s = np.zeros((dim, width), np.float32)
    for d in range(dim):
        s[d, d] = 1.0
    for f in range(num_freqs):
        for d in range(dim):
            s[d, dim + f * dim + d] = freqs[f]                 # sin block
            s[d, dim * (1 + num_freqs) + f * dim + d] = freqs[f]  # cos block
    return s


def _encode(pre: jnp.ndarray, dim: int, num_freqs: int) -> jnp.ndarray:
    """Columnwise identity/sin/cos select on the S-matmul pre-activation."""
    col = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    sin_end = dim * (1 + num_freqs)
    return jnp.where(col < dim, pre,
                     jnp.where(col < sin_end, jnp.sin(pre), jnp.cos(pre)))


def _encode_bwd(pre: jnp.ndarray, g_enc: jnp.ndarray, dim: int,
                num_freqs: int) -> jnp.ndarray:
    """d(encode)/d(pre) · g_enc."""
    col = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    sin_end = dim * (1 + num_freqs)
    return jnp.where(col < dim, g_enc,
                     jnp.where(col < sin_end, g_enc * jnp.cos(pre),
                               -g_enc * jnp.sin(pre)))


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(a.astype(_cdt()), b.astype(_cdt()),
                   preferred_element_type=jnp.float32)


_TILE_FLOOR = 128          # smallest useful row tile (16 f32 sublanes x 8)
_warned_ref_fallback: set = set()


def _pick_tile(n: int, preferred: int) -> int:
    """Largest tile <= preferred that divides n (halving search), else 0.

    Forward and backward each search down from their own preferred tile, so
    a batch divisible by one but not the other no longer silently drops the
    whole pass to the jnp reference path (a hidden ~1.5x perf cliff)."""
    t = preferred
    while t >= _TILE_FLOOR:
        if n % t == 0:
            return t
        t //= 2
    return 0


def _warn_ref_fallback(name: str, n: int, preferred: int) -> None:
    """One-time signal when a TPU batch falls back to the jnp path."""
    key = (name, n, preferred)
    if key not in _warned_ref_fallback:
        _warned_ref_fallback.add(key)
        import warnings
        warnings.warn(
            f"{name}: batch size {n} has no tile divisor <= {preferred} "
            f">= {_TILE_FLOOR}; using the (slower) jnp reference path. "
            f"Pad the batch to a multiple of {_TILE_FLOOR} to recover the "
            "fused kernel.", RuntimeWarning, stacklevel=3)


def _fwd_kernel(dim, num_freqs, n_base, n_top, x_ref, s_ref, *refs):
    """refs = (base w0,b0,… , top w0,b0,… , out).  All-relu base (incl. its
    output), relu-hidden linear-output top, skip concat [h_base, enc] folded
    into two partial matmuls on W_top0's row blocks."""
    out_ref = refs[-1]
    wbs = refs[:-1]
    base = wbs[:2 * n_base]
    top = wbs[2 * n_base:]
    H = base[-2].shape[1]                     # base output width

    x = x_ref[:].astype(jnp.float32)
    pre = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    enc = _encode(pre, dim, num_freqs).astype(_cdt())

    h = enc
    for i in range(n_base):
        h = _mm(h, base[2 * i][:]) + base[2 * i + 1][:]
        h = jnp.maximum(h, 0.0).astype(_cdt())

    wt0 = top[0][:]                           # [H + enc_dim, H_top]
    t = _mm(h, wt0[:H]) + _mm(enc, wt0[H:]) + top[1][:]
    for i in range(1, n_top):
        t = jnp.maximum(t, 0.0).astype(_cdt())
        t = _mm(t, top[2 * i][:]) + top[2 * i + 1][:]
    out_ref[:] = t.astype(jnp.float32)


def _bwd_kernel(dim, num_freqs, n_base, n_top, x_ref, s_ref, *refs):
    """refs = (base wbs…, top wbs…, g, dx, d-base-wbs…, dwt0_h, dwt0_e,
    dbt0, d-top-rest…).

    Forward recompute in VMEM, then full backprop: weight/bias grads
    accumulate across the N-grid; dx goes back through the skip, the base
    stack, the sin/cos select and the selector matmul.  The skip layer's
    weight grad is emitted as two separate refs (the h rows and the enc
    rows) — concatenated by the host wrapper — so the kernel never does a
    sub-block read-modify-write."""
    n_w = 2 * (n_base + n_top)
    wbs = refs[:n_w]
    g_ref = refs[n_w]
    dx_ref = refs[n_w + 1]
    dwbs = refs[n_w + 2:]
    base = wbs[:2 * n_base]
    top = wbs[2 * n_base:]
    H = base[-2].shape[1]

    x = x_ref[:].astype(jnp.float32)
    pre = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    enc = _encode(pre, dim, num_freqs).astype(_cdt())

    # recompute, stashing post-activation slabs (relu masks recoverable)
    b_acts = [enc]
    h = enc
    for i in range(n_base):
        h = _mm(h, base[2 * i][:]) + base[2 * i + 1][:]
        h = jnp.maximum(h, 0.0).astype(_cdt())
        b_acts.append(h)
    wt0 = top[0][:]
    t = _mm(h, wt0[:H]) + _mm(enc, wt0[H:]) + top[1][:]
    t_acts = [t.astype(_cdt())]         # pre-relu of hidden handled via >0 on post
    for i in range(1, n_top):
        t = jnp.maximum(t, 0.0).astype(_cdt())
        t_acts.append(t)                      # post-relu input to layer i
        t = _mm(t, top[2 * i][:]) + top[2 * i + 1][:]

    first = pl.program_id(0) == 0

    def acc(slot, val):
        @pl.when(first)
        def _():
            dwbs[slot][:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            dwbs[slot][:] = dwbs[slot][:] + val

    def dwb(a_in, g):
        dw = jax.lax.dot_general(
            a_in.astype(_cdt()), g.astype(_cdt()),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dw, jnp.sum(g, axis=0, keepdims=True)

    # ---- top stack ----
    g = g_ref[:].astype(jnp.float32)
    for i in reversed(range(1, n_top)):
        a_in = t_acts[i]                      # post-relu input of layer i
        dw, db = dwb(a_in, g)
        acc(2 * n_base + 3 + 2 * (i - 1), dw)
        acc(2 * n_base + 3 + 2 * (i - 1) + 1, db)
        g = jax.lax.dot_general(
            g.astype(_cdt()), top[2 * i][:].astype(_cdt()),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)

    # top layer 0 (skip): inputs were [h_base, enc] → two grad refs.
    # dwbs slot map: [0 .. 2*n_base) base, [2*n_base] dwt0_h,
    # [2*n_base+1] dwt0_e, [2*n_base+2] dbt0, [2*n_base+3 ..] top rest.
    h_last = b_acts[-1]
    dw_h, db0 = dwb(h_last, g)
    dw_e, _ = dwb(enc, g)
    acc(2 * n_base, dw_h)
    acc(2 * n_base + 1, dw_e)
    acc(2 * n_base + 2, db0)

    g_h = jax.lax.dot_general(
        g.astype(_cdt()), wt0[:H].astype(_cdt()),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g_enc = jax.lax.dot_general(
        g.astype(_cdt()), wt0[H:].astype(_cdt()),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- base stack (all-relu, including its output) ----
    g = jnp.where(h_last.astype(jnp.float32) > 0.0, g_h, 0.0)
    for i in reversed(range(n_base)):
        a_in = b_acts[i]
        dw, db = dwb(a_in, g)
        acc(2 * i, dw)
        acc(2 * i + 1, db)
        g = jax.lax.dot_general(
            g.astype(_cdt()), base[2 * i][:].astype(_cdt()),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if i > 0:
            g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)

    g_enc = g_enc + g                         # enc feeds base L0 AND the skip
    d_pre = _encode_bwd(pre, g_enc, dim, num_freqs)
    dx_ref[:] = jax.lax.dot_general(
        d_pre, s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _ref_forward(x, s, base_wbs, top_wbs, dim, num_freqs):
    """Plain-jnp mirror of the kernel math (ragged tail / CPU fallback).
    Numerics match the kernel (bf16 matmuls, f32 accum) so the two paths
    can be mixed within one batch."""
    n_base = len(base_wbs) // 2
    n_top = len(top_wbs) // 2
    H = base_wbs[-2].shape[1]
    pre = jnp.dot(x.astype(jnp.float32), s,
                  preferred_element_type=jnp.float32)
    enc = _encode(pre, dim, num_freqs).astype(_cdt())
    h = enc
    for i in range(n_base):
        h = _mm(h, base_wbs[2 * i]) + base_wbs[2 * i + 1]
        h = jnp.maximum(h, 0.0).astype(_cdt())
    wt0 = top_wbs[0]
    t = _mm(h, wt0[:H]) + _mm(enc, wt0[H:]) + top_wbs[1]
    for i in range(1, n_top):
        t = jnp.maximum(t, 0.0).astype(_cdt())
        t = _mm(t, top_wbs[2 * i]) + top_wbs[2 * i + 1]
    return t.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_pe_density(x: jnp.ndarray, s: jnp.ndarray,
                     base_wbs: Sequence[jnp.ndarray],
                     top_wbs: Sequence[jnp.ndarray],
                     num_freqs: int, tile_n: int = 1024,
                     interpret: bool = False,
                     dim: int = 3, tile_bwd: int = 512) -> jnp.ndarray:
    """x [N, dim] (encoder input domain, e.g. unit*2-1) → [N, Dout].

    base_wbs/top_wbs = [W0, b0, W1, b1, …] with biases [1, d]; W_top0 is the
    skip layer [H + dim*(1+2F), H_top].  ``s`` must be
    ``pe_selector_matrix(num_freqs, dim=dim)``.  ``tile_bwd`` (default 512,
    the measured safe tile for the 8x256 trunk under the 16 MB scoped-vmem
    stack limit) bounds the recompute backward's VMEM footprint — this path
    is differentiated on TPU by bayesrays' hessian pass.
    """
    return _fwd(x, s, base_wbs, top_wbs, num_freqs, tile_n, interpret, dim,
                tile_bwd)[0]


def _fwd(x, s, base_wbs, top_wbs, num_freqs, tile_n, interpret, dim,
         tile_bwd=512):
    res = (x, tuple(base_wbs), tuple(top_wbs), s)
    N = x.shape[0]
    # fp32 debug mode bypasses the kernels: their bwd tile sizes are
    # tuned against the 16 MB scoped-vmem limit at bf16 and fp32
    # doubles every slab; the jnp mirror computes the same math
    on_tpu = (jax.default_backend() == "tpu"
              and _cdt() is not jnp.float32)
    preferred = tile_n
    tile_n = _pick_tile(N, tile_n) if N else 0
    if tile_n == 0 or (not on_tpu and not interpret):
        if tile_n == 0 and N and (on_tpu or interpret):
            _warn_ref_fallback("fused_pe_density", N, preferred)
        return (_ref_forward(x, s, base_wbs, top_wbs, dim, num_freqs), res)
    wbs = list(base_wbs) + list(top_wbs)
    Dout = top_wbs[-2].shape[1]
    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dim, num_freqs,
                          len(base_wbs) // 2, len(top_wbs) // 2),
        out_shape=jax.ShapeDtypeStruct((N, Dout), jnp.float32),
        grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, Dout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, s, *wbs)
    return out, res


def _bwd(num_freqs, tile_n, interpret, dim, tile_bwd, res, g):
    # the recompute-everything backward holds ~2x the forward's slabs in
    # VMEM; a smaller tile keeps it under the 16 MB scoped-vmem stack limit
    x, base_wbs, top_wbs, s = res
    N = x.shape[0]
    # fp32 debug mode bypasses the kernels: their bwd tile sizes are
    # tuned against the 16 MB scoped-vmem limit at bf16 and fp32
    # doubles every slab; the jnp mirror computes the same math
    on_tpu = (jax.default_backend() == "tpu"
              and _cdt() is not jnp.float32)
    # fwd/bwd must agree on the path: if the FORWARD fell back to the jnp
    # reference (its tile chain missed N), the backward must differentiate
    # that same path — never pair a reference forward with a kernel bwd
    fwd_fell_back = N and _pick_tile(N, tile_n) == 0
    tile_n = (_pick_tile(N, tile_bwd) if N and not fwd_fell_back else 0)
    if tile_n == 0 or (not on_tpu and not interpret):
        if tile_n == 0 and N and not fwd_fell_back and (on_tpu or interpret):
            _warn_ref_fallback("fused_pe_density (bwd)", N, tile_bwd)
        def f(x, bw, tw):
            return _ref_forward(x, s, bw, tw, dim, num_freqs)
        _, vjp = jax.vjp(f, x, list(base_wbs), list(top_wbs))
        dx, dbw, dtw = vjp(g)
        return dx, jnp.zeros_like(s), dbw, dtw

    wbs = list(base_wbs) + list(top_wbs)
    grid = (N // tile_n,)
    Dout = top_wbs[-2].shape[1]
    in_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((tile_n, Dout), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    H = base_wbs[-2].shape[1]
    # grad output shapes in the kernel's slot order (W_top0 split in two)
    grad_shapes = [w.shape for w in base_wbs]
    grad_shapes += [(H, top_wbs[0].shape[1]),
                    (top_wbs[0].shape[0] - H, top_wbs[0].shape[1]),
                    top_wbs[1].shape]
    grad_shapes += [w.shape for w in top_wbs[2:]]
    out_shapes = [jax.ShapeDtypeStruct((N, dim), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for sh in grad_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(sh, jnp.float32))
        out_specs.append(pl.BlockSpec(sh, lambda i, sh=sh: (0,) * len(sh),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dim, num_freqs,
                          len(base_wbs) // 2, len(top_wbs) // 2),
        out_shape=tuple(out_shapes),
        grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        interpret=interpret,
    )(x, s, *wbs, g)
    dx = outs[0]
    nb = len(base_wbs)
    dbase = list(outs[1:1 + nb])
    dwt0 = jnp.concatenate([outs[1 + nb], outs[2 + nb]], axis=0)
    dtop = [dwt0, outs[3 + nb]] + list(outs[4 + nb:])
    return dx, jnp.zeros_like(s), dbase, dtop


fused_pe_density.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Mega kernel: trunk + colour head + semantic head, one pallas_call
# ---------------------------------------------------------------------------
#
# The colour/semantic heads consume the trunk's geo features; fusing them in
# means `geo` never leaves VMEM and the [N, geo+dir+app] colour concat never
# exists.  Head layer-0 weights arrive PRE-PADDED with a zero top row
# ([1+G, H] instead of [G, H]) so the kernel contracts the full trunk output
# t=[density_raw | geo] against them — row 0 (density) hits the zero row, so
# no in-kernel slicing/concatenation is needed, and jnp.pad's autodiff
# slices the weight grads back outside.  Per-ray extras (direction encoding
# + appearance embedding) are pre-broadcast to [N, De] by XLA — the one
# remaining O(N·De) HBM input.


def _mega_fwd_kernel(dim, num_freqs, n_base, n_top, n_color, n_sem,
                     x_ref, s_ref, ex_ref, *refs):
    """refs = (base wbs…, top wbs…, color wbs…, sem wbs…, t_out, rgb_out,
    sem_out).  color wbs = [WcT_pad, WcE, bc0, Wc1, bc1, …];
    sem wbs = [WsT_pad, bs0, Ws1, bs1, …]."""
    t_out, rgb_out, sem_out = refs[-3], refs[-2], refs[-1]
    wbs = refs[:-3]
    base = wbs[:2 * n_base]
    top = wbs[2 * n_base:2 * (n_base + n_top)]
    color = wbs[2 * (n_base + n_top):2 * (n_base + n_top) + 2 * n_color + 1]
    sem = wbs[2 * (n_base + n_top) + 2 * n_color + 1:]
    H = base[-2].shape[1]

    x = x_ref[:].astype(jnp.float32)
    pre = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    enc = _encode(pre, dim, num_freqs).astype(_cdt())

    h = enc
    for i in range(n_base):
        h = _mm(h, base[2 * i][:]) + base[2 * i + 1][:]
        h = jnp.maximum(h, 0.0).astype(_cdt())
    wt0 = top[0][:]
    t = _mm(h, wt0[:H]) + _mm(enc, wt0[H:]) + top[1][:]
    for i in range(1, n_top):
        t = jnp.maximum(t, 0.0).astype(_cdt())
        t = _mm(t, top[2 * i][:]) + top[2 * i + 1][:]
    t_out[:] = t.astype(jnp.float32)

    tb = t.astype(_cdt())
    ex = ex_ref[:].astype(_cdt())

    # colour head: layer 0 = t·WcT_pad + extras·WcE + b, then plain stack
    c = _mm(tb, color[0][:]) + _mm(ex, color[1][:]) + color[2][:]
    for i in range(1, n_color):
        c = jnp.maximum(c, 0.0).astype(_cdt())
        c = _mm(c, color[2 * i + 1][:]) + color[2 * i + 2][:]
    rgb_out[:] = c.astype(jnp.float32)

    sm = _mm(tb, sem[0][:]) + sem[1][:]
    for i in range(1, n_sem):
        sm = jnp.maximum(sm, 0.0).astype(_cdt())
        sm = _mm(sm, sem[2 * i][:]) + sem[2 * i + 1][:]
    sem_out[:] = sm.astype(jnp.float32)


def _mega_bwd_kernel(dim, num_freqs, n_base, n_top, n_color, n_sem,
                     pass_sem_grad,
                     x_ref, s_ref, ex_ref, *refs):
    """refs = (base…, top…, color…, sem…, g_t, g_rgb, g_sem,
    dx, dex, d-base…, dwt0_h, dwt0_e, dbt0, d-top-rest…, d-color…, d-sem…).

    Full recompute + backprop; weight grads accumulate across the grid.
    When ``pass_sem_grad`` is False the semantic head's cotangent stops at
    its layer-0 weights (≙ stop_gradient(geo) in the unfused path)."""
    n_w = 2 * (n_base + n_top) + 2 * n_color + 1 + 2 * n_sem
    wbs = refs[:n_w]
    g_t_ref, g_rgb_ref, g_sem_ref = refs[n_w], refs[n_w + 1], refs[n_w + 2]
    dx_ref, dex_ref = refs[n_w + 3], refs[n_w + 4]
    dwbs = refs[n_w + 5:]
    base = wbs[:2 * n_base]
    top = wbs[2 * n_base:2 * (n_base + n_top)]
    color = wbs[2 * (n_base + n_top):2 * (n_base + n_top) + 2 * n_color + 1]
    sem = wbs[2 * (n_base + n_top) + 2 * n_color + 1:]
    H = base[-2].shape[1]

    x = x_ref[:].astype(jnp.float32)
    pre = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    enc = _encode(pre, dim, num_freqs).astype(_cdt())

    b_acts = [enc]
    h = enc
    for i in range(n_base):
        h = _mm(h, base[2 * i][:]) + base[2 * i + 1][:]
        h = jnp.maximum(h, 0.0).astype(_cdt())
        b_acts.append(h)
    wt0 = top[0][:]
    t = _mm(h, wt0[:H]) + _mm(enc, wt0[H:]) + top[1][:]
    t_acts = [t.astype(_cdt())]
    for i in range(1, n_top):
        t = jnp.maximum(t, 0.0).astype(_cdt())
        t_acts.append(t)
        t = _mm(t, top[2 * i][:]) + top[2 * i + 1][:]
    tb = t.astype(_cdt())
    ex = ex_ref[:].astype(_cdt())

    c_acts = [tb]
    c = _mm(tb, color[0][:]) + _mm(ex, color[1][:]) + color[2][:]
    for i in range(1, n_color):
        c = jnp.maximum(c, 0.0).astype(_cdt())
        c_acts.append(c)
        c = _mm(c, color[2 * i + 1][:]) + color[2 * i + 2][:]

    s_acts = [tb]
    sm = _mm(tb, sem[0][:]) + sem[1][:]
    for i in range(1, n_sem):
        sm = jnp.maximum(sm, 0.0).astype(_cdt())
        s_acts.append(sm)
        sm = _mm(sm, sem[2 * i][:]) + sem[2 * i + 1][:]

    first = pl.program_id(0) == 0

    def acc(slot, val):
        @pl.when(first)
        def _():
            dwbs[slot][:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            dwbs[slot][:] = dwbs[slot][:] + val

    def dwb(a_in, g):
        dw = jax.lax.dot_general(
            a_in.astype(_cdt()), g.astype(_cdt()),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dw, jnp.sum(g, axis=0, keepdims=True)

    def bp(g, w):
        return jax.lax.dot_general(
            g.astype(_cdt()), w.astype(_cdt()),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # dwbs slot map (in parameter order, W_top0 split):
    #   [0 .. 2*n_base)                      base
    #   B   = 2*n_base:  B, B+1, B+2         dwt0_h, dwt0_e, dbt0
    #   B+3 .. B+3+2*(n_top-1)               top rest
    #   C0  = B+3+2*(n_top-1):               dWcT_pad, dWcE, dbc0, color rest
    #   S0  = C0+3+2*(n_color-1):            dWsT_pad, dbs0, sem rest
    B = 2 * n_base
    C0 = B + 3 + 2 * (n_top - 1)
    S0 = C0 + 3 + 2 * (n_color - 1)

    # ---- colour head backward ----
    g = g_rgb_ref[:].astype(jnp.float32)
    for i in reversed(range(1, n_color)):
        a_in = c_acts[i]
        dw, db = dwb(a_in, g)
        acc(C0 + 3 + 2 * (i - 1), dw)
        acc(C0 + 3 + 2 * (i - 1) + 1, db)
        g = bp(g, color[2 * i + 1][:])
        g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)
    dw_t, db_c = dwb(tb, g)
    dw_e, _ = dwb(ex, g)
    acc(C0, dw_t)
    acc(C0 + 1, dw_e)
    acc(C0 + 2, db_c)
    g_t_total = g_t_ref[:].astype(jnp.float32) + bp(g, color[0][:])
    dex_ref[:] = bp(g, color[1][:])

    # ---- semantic head backward ----
    g = g_sem_ref[:].astype(jnp.float32)
    for i in reversed(range(1, n_sem)):
        a_in = s_acts[i]
        dw, db = dwb(a_in, g)
        acc(S0 + 2 + 2 * (i - 1), dw)
        acc(S0 + 2 + 2 * (i - 1) + 1, db)
        g = bp(g, sem[2 * i][:])
        g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)
    dw_s, db_s = dwb(tb, g)
    acc(S0, dw_s)
    acc(S0 + 1, db_s)
    if pass_sem_grad:
        g_t_total = g_t_total + bp(g, sem[0][:])

    # ---- top stack ----
    g = g_t_total
    for i in reversed(range(1, n_top)):
        a_in = t_acts[i]
        dw, db = dwb(a_in, g)
        acc(B + 3 + 2 * (i - 1), dw)
        acc(B + 3 + 2 * (i - 1) + 1, db)
        g = bp(g, top[2 * i][:])
        g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)
    h_last = b_acts[-1]
    dw_h, db0 = dwb(h_last, g)
    dw_e2, _ = dwb(enc, g)
    acc(B, dw_h)
    acc(B + 1, dw_e2)
    acc(B + 2, db0)
    g_h = bp(g, wt0[:H])
    g_enc = bp(g, wt0[H:])

    # ---- base stack ----
    g = jnp.where(h_last.astype(jnp.float32) > 0.0, g_h, 0.0)
    for i in reversed(range(n_base)):
        a_in = b_acts[i]
        dw, db = dwb(a_in, g)
        acc(2 * i, dw)
        acc(2 * i + 1, db)
        g = bp(g, base[2 * i][:])
        if i > 0:
            g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)

    g_enc = g_enc + g
    d_pre = _encode_bwd(pre, g_enc, dim, num_freqs)
    dx_ref[:] = jax.lax.dot_general(
        d_pre, s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mega_ref(x, extras, s, base_wbs, top_wbs, color_wbs, sem_wbs,
              dim, num_freqs, pass_sem_grad):
    """jnp mirror of the mega kernel (ragged tail / CPU fallback)."""
    n_color = (len(color_wbs) - 1) // 2
    n_sem = len(sem_wbs) // 2
    t = _ref_forward(x, s, base_wbs, top_wbs, dim, num_freqs)
    tb = t.astype(_cdt())
    ex = extras.astype(_cdt())
    c = _mm(tb, color_wbs[0]) + _mm(ex, color_wbs[1]) + color_wbs[2]
    for i in range(1, n_color):
        c = jnp.maximum(c, 0.0).astype(_cdt())
        c = _mm(c, color_wbs[2 * i + 1]) + color_wbs[2 * i + 2]
    ts = tb if pass_sem_grad else jax.lax.stop_gradient(tb)
    sm = _mm(ts, sem_wbs[0]) + sem_wbs[1]
    for i in range(1, n_sem):
        sm = jnp.maximum(sm, 0.0).astype(_cdt())
        sm = _mm(sm, sem_wbs[2 * i]) + sem_wbs[2 * i + 1]
    return (t.astype(jnp.float32), c.astype(jnp.float32),
            sm.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_pe_nerf(x: jnp.ndarray, extras: jnp.ndarray, s: jnp.ndarray,
                  base_wbs: Sequence[jnp.ndarray],
                  top_wbs: Sequence[jnp.ndarray],
                  color_wbs: Sequence[jnp.ndarray],
                  sem_wbs: Sequence[jnp.ndarray],
                  num_freqs: int, pass_sem_grad: bool = False,
                  tile_n: int = 1024, interpret: bool = False,
                  dim: int = 3, tile_bwd: int = 768
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trunk + colour head + semantic head in one kernel.

    x [N, dim]: encoder-domain positions; extras [N, De]: pre-broadcast
    per-sample colour-head extras (direction encoding ‖ appearance rows).
    color_wbs = [WcT_pad(1+G+…, Hc), WcE(De, Hc), bc0, Wc1, bc1, …] with
    WcT_pad's top row ZERO (pad with jnp.pad so autodiff slices grads back);
    sem_wbs = [WsT_pad(1+G, Hs), bs0, Ws1, bs1, …] likewise.
    Returns (t [N, 1+G] trunk output, rgb_raw [N, 3], sem_raw [N, C]) —
    density/sigmoid activations applied by the caller.
    """
    return _mega_fwd(x, extras, s, base_wbs, top_wbs, color_wbs, sem_wbs,
                     num_freqs, pass_sem_grad, tile_n, interpret, dim,
                     tile_bwd)[0]


def _mega_fwd(x, extras, s, base_wbs, top_wbs, color_wbs, sem_wbs,
              num_freqs, pass_sem_grad, tile_n, interpret, dim,
              tile_bwd=768):
    res = (x, extras, s, tuple(base_wbs), tuple(top_wbs), tuple(color_wbs),
           tuple(sem_wbs))
    N = x.shape[0]
    # fp32 debug mode bypasses the kernels: their bwd tile sizes are
    # tuned against the 16 MB scoped-vmem limit at bf16 and fp32
    # doubles every slab; the jnp mirror computes the same math
    on_tpu = (jax.default_backend() == "tpu"
              and _cdt() is not jnp.float32)
    preferred = tile_n
    tile_n = _pick_tile(N, tile_n) if N else 0
    if tile_n == 0 or (not on_tpu and not interpret):
        if tile_n == 0 and N and (on_tpu or interpret):
            _warn_ref_fallback("fused_pe_nerf", N, preferred)
        return (_mega_ref(x, extras, s, base_wbs, top_wbs, color_wbs,
                          sem_wbs, dim, num_freqs, pass_sem_grad), res)
    wbs = (list(base_wbs) + list(top_wbs) + list(color_wbs) + list(sem_wbs))
    n_base, n_top = len(base_wbs) // 2, len(top_wbs) // 2
    n_color = (len(color_wbs) - 1) // 2
    n_sem = len(sem_wbs) // 2
    Dt = top_wbs[-2].shape[1]
    Dc = color_wbs[-2].shape[1] if n_color > 1 else color_wbs[0].shape[1]
    Ds = sem_wbs[-2].shape[1] if n_sem > 1 else sem_wbs[0].shape[1]
    De = extras.shape[1]
    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, De), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, w=w: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    out_shapes = (jax.ShapeDtypeStruct((N, Dt), jnp.float32),
                  jax.ShapeDtypeStruct((N, Dc), jnp.float32),
                  jax.ShapeDtypeStruct((N, Ds), jnp.float32))
    out_specs = tuple(
        pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for d in (Dt, Dc, Ds))
    out = pl.pallas_call(
        functools.partial(_mega_fwd_kernel, dim, num_freqs, n_base, n_top,
                          n_color, n_sem),
        out_shape=out_shapes, grid=grid, in_specs=in_specs,
        out_specs=out_specs, interpret=interpret,
    )(x, s, extras, *wbs)
    return out, res


def _mega_bwd(num_freqs, pass_sem_grad, tile_n, interpret, dim, tile_bwd,
              res, g):
    # the recompute-everything backward holds ~2x the forward's slabs in
    # VMEM; a smaller tile keeps it under the 16 MB scoped-vmem stack limit
    x, extras, s, base_wbs, top_wbs, color_wbs, sem_wbs = res
    g_t, g_rgb, g_sem = g
    N = x.shape[0]
    # fp32 debug mode bypasses the kernels: their bwd tile sizes are
    # tuned against the 16 MB scoped-vmem limit at bf16 and fp32
    # doubles every slab; the jnp mirror computes the same math
    on_tpu = (jax.default_backend() == "tpu"
              and _cdt() is not jnp.float32)
    # never pair a reference forward with a kernel backward (see _bwd)
    fwd_fell_back = N and _pick_tile(N, tile_n) == 0
    tile_n = (_pick_tile(N, tile_bwd) if N and not fwd_fell_back else 0)
    if tile_n == 0 or (not on_tpu and not interpret):
        if tile_n == 0 and N and not fwd_fell_back and (on_tpu or interpret):
            _warn_ref_fallback("fused_pe_nerf (bwd)", N, tile_bwd)
        def f(x, extras, bw, tw, cw, sw):
            return _mega_ref(x, extras, s, bw, tw, cw, sw, dim, num_freqs,
                             pass_sem_grad)
        _, vjp = jax.vjp(f, x, extras, list(base_wbs), list(top_wbs),
                         list(color_wbs), list(sem_wbs))
        dx, dex, dbw, dtw, dcw, dsw = vjp((g_t, g_rgb, g_sem))
        return dx, dex, jnp.zeros_like(s), dbw, dtw, dcw, dsw

    wbs = (list(base_wbs) + list(top_wbs) + list(color_wbs) + list(sem_wbs))
    n_base, n_top = len(base_wbs) // 2, len(top_wbs) // 2
    n_color = (len(color_wbs) - 1) // 2
    n_sem = len(sem_wbs) // 2
    De = extras.shape[1]
    H = base_wbs[-2].shape[1]
    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, De), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, w=w: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    for gv in (g_t, g_rgb, g_sem):
        in_specs.append(pl.BlockSpec((tile_n, gv.shape[1]),
                                     lambda i, gv=gv: (i, 0),
                                     memory_space=pltpu.VMEM))
    # grad slots in kernel order
    grad_shapes = [w.shape for w in base_wbs]
    grad_shapes += [(H, top_wbs[0].shape[1]),
                    (top_wbs[0].shape[0] - H, top_wbs[0].shape[1]),
                    top_wbs[1].shape]
    grad_shapes += [w.shape for w in top_wbs[2:]]
    grad_shapes += [w.shape for w in color_wbs]
    grad_shapes += [w.shape for w in sem_wbs]
    out_shapes = [jax.ShapeDtypeStruct((N, dim), jnp.float32),
                  jax.ShapeDtypeStruct((N, De), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((tile_n, De), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for sh in grad_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(sh, jnp.float32))
        out_specs.append(pl.BlockSpec(sh, lambda i, sh=sh: (0,) * len(sh),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_mega_bwd_kernel, dim, num_freqs, n_base, n_top,
                          n_color, n_sem, pass_sem_grad),
        out_shape=tuple(out_shapes), grid=grid, in_specs=in_specs,
        out_specs=tuple(out_specs), interpret=interpret,
    )(x, s, extras, *wbs, g_t, g_rgb, g_sem)
    dx, dex = outs[0], outs[1]
    k = 2
    nb = len(base_wbs)
    dbase = list(outs[k:k + nb]); k += nb
    dwt0 = jnp.concatenate([outs[k], outs[k + 1]], axis=0)
    dbt0 = outs[k + 2]; k += 3
    ntr = len(top_wbs) - 2
    dtop = [dwt0, dbt0] + list(outs[k:k + ntr]); k += ntr
    nc = len(color_wbs)
    dcolor = list(outs[k:k + nc]); k += nc
    dsem = list(outs[k:])
    return dx, dex, jnp.zeros_like(s), dbase, dtop, dcolor, dsem


fused_pe_nerf.defvjp(_mega_fwd, _mega_bwd)


# ---------------------------------------------------------------------------
# Plain fused PE + MLP (no skip, no heads) — the proposal density nets
# ---------------------------------------------------------------------------
#
# The PE proposal nets are narrow (hidden 64) but see 5x more samples than
# the final field (256+96 vs 48 per ray): under XLA the [N, 33..39] encoding
# and the [N, 64] hidden slabs round-trip HBM between matmul fusions.  This
# kernel fuses encode + all layers; the narrow widths make VMEM use tiny, so
# a LARGE tile (default 4096 rows) amortises grid overhead — the reason the
# earlier split fused-MLP A/B lost on these nets (1024-row tiles of
# mostly-padding matmuls).


def _plain_fwd_kernel(dim, num_freqs, n_layers, x_ref, s_ref, *refs):
    out_ref = refs[-1]
    wbs = refs[:-1]
    x = x_ref[:].astype(jnp.float32)
    pre = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    h = _encode(pre, dim, num_freqs).astype(_cdt())
    for i in range(n_layers):
        h = _mm(h, wbs[2 * i][:]) + wbs[2 * i + 1][:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0).astype(_cdt())
    out_ref[:] = h.astype(jnp.float32)


def _plain_bwd_kernel(dim, num_freqs, n_layers, x_ref, s_ref, *refs):
    """refs = (wbs…, g, dx, dwbs…)."""
    wbs = refs[:2 * n_layers]
    g_ref = refs[2 * n_layers]
    dx_ref = refs[2 * n_layers + 1]
    dwbs = refs[2 * n_layers + 2:]

    x = x_ref[:].astype(jnp.float32)
    pre = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    enc = _encode(pre, dim, num_freqs).astype(_cdt())
    acts = [enc]
    h = enc
    for i in range(n_layers):
        h = _mm(h, wbs[2 * i][:]) + wbs[2 * i + 1][:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0).astype(_cdt())
            acts.append(h)

    first = pl.program_id(0) == 0

    def acc(slot, val):
        @pl.when(first)
        def _():
            dwbs[slot][:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            dwbs[slot][:] = dwbs[slot][:] + val

    g = g_ref[:].astype(jnp.float32)
    for i in reversed(range(n_layers)):
        a_in = acts[i]
        dw = jax.lax.dot_general(
            a_in.astype(_cdt()), g.astype(_cdt()),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc(2 * i, dw)
        acc(2 * i + 1, jnp.sum(g, axis=0, keepdims=True))
        g = jax.lax.dot_general(
            g.astype(_cdt()), wbs[2 * i][:].astype(_cdt()),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if i > 0:
            g = jnp.where(a_in.astype(jnp.float32) > 0.0, g, 0.0)
    d_pre = _encode_bwd(pre, g, dim, num_freqs)
    dx_ref[:] = jax.lax.dot_general(
        d_pre, s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _plain_ref(x, s, wbs, dim, num_freqs):
    n_layers = len(wbs) // 2
    pre = jnp.dot(x.astype(jnp.float32), s,
                  preferred_element_type=jnp.float32)
    h = _encode(pre, dim, num_freqs).astype(_cdt())
    for i in range(n_layers):
        h = _mm(h, wbs[2 * i]) + wbs[2 * i + 1]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0).astype(_cdt())
    return h.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_pe_mlp(x: jnp.ndarray, s: jnp.ndarray,
                 wbs: Sequence[jnp.ndarray],
                 num_freqs: int, tile_n: int = 4096,
                 interpret: bool = False, dim: int = 3,
                 tile_bwd: int = 1024) -> jnp.ndarray:
    """x [N, dim] → encode → relu-hidden linear-out MLP → [N, Dout],
    one kernel.  wbs = [W0, b0, …] with biases [1, d]."""
    return _plain_fwd(x, s, wbs, num_freqs, tile_n, interpret, dim,
                      tile_bwd)[0]


def _plain_fwd(x, s, wbs, num_freqs, tile_n, interpret, dim, tile_bwd=1024):
    res = (x, s, tuple(wbs))
    N = x.shape[0]
    # fp32 debug mode bypasses the kernels: their bwd tile sizes are
    # tuned against the 16 MB scoped-vmem limit at bf16 and fp32
    # doubles every slab; the jnp mirror computes the same math
    on_tpu = (jax.default_backend() == "tpu"
              and _cdt() is not jnp.float32)
    preferred = tile_n
    tile_n = _pick_tile(N, tile_n) if N else 0
    if tile_n == 0 or (not on_tpu and not interpret):
        if tile_n == 0 and N and (on_tpu or interpret):
            _warn_ref_fallback("fused_pe_mlp", N, preferred)
        return _plain_ref(x, s, wbs, dim, num_freqs), res
    n_layers = len(wbs) // 2
    Dout = wbs[-2].shape[1]
    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, w=w: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_plain_fwd_kernel, dim, num_freqs, n_layers),
        out_shape=jax.ShapeDtypeStruct((N, Dout), jnp.float32),
        grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, Dout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, s, *wbs)
    return out, res


def _plain_bwd(num_freqs, tile_n, interpret, dim, tile_bwd, res, g):
    # the recompute-everything backward holds ~2x the forward's slabs in
    # VMEM; a smaller tile keeps it under the 16 MB scoped-vmem stack limit
    x, s, wbs = res
    N = x.shape[0]
    # fp32 debug mode bypasses the kernels: their bwd tile sizes are
    # tuned against the 16 MB scoped-vmem limit at bf16 and fp32
    # doubles every slab; the jnp mirror computes the same math
    on_tpu = (jax.default_backend() == "tpu"
              and _cdt() is not jnp.float32)
    # never pair a reference forward with a kernel backward (see _bwd)
    fwd_fell_back = N and _pick_tile(N, tile_n) == 0
    tile_n = (_pick_tile(N, tile_bwd) if N and not fwd_fell_back else 0)
    if tile_n == 0 or (not on_tpu and not interpret):
        if tile_n == 0 and N and not fwd_fell_back and (on_tpu or interpret):
            _warn_ref_fallback("fused_pe_mlp (bwd)", N, tile_bwd)
        def f(x, wbs):
            return _plain_ref(x, s, wbs, dim, num_freqs)
        _, vjp = jax.vjp(f, x, list(wbs))
        dx, dwbs = vjp(g)
        return dx, jnp.zeros_like(s), dwbs

    n_layers = len(wbs) // 2
    Dout = wbs[-2].shape[1]
    grid = (N // tile_n,)
    in_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for w in wbs:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, w=w: (0,) * w.ndim,
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((tile_n, Dout), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct((N, dim), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for w in wbs:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i, w=w: (0,) * w.ndim,
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_plain_bwd_kernel, dim, num_freqs, n_layers),
        out_shape=tuple(out_shapes),
        grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        interpret=interpret,
    )(x, s, *wbs, g)
    return outs[0], jnp.zeros_like(s), list(outs[1:])


fused_pe_mlp.defvjp(_plain_fwd, _plain_bwd)
