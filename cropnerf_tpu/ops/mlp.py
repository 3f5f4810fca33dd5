"""Plain fully-connected MLPs as pure functions over a params pytree.

TPU-native equivalent of tiny-cuda-nn's fused MLPs (reference binding:
nerfstudio ``MLP(implementation="tcnn")`` at
/root/reference/crop_nerf/fruit_nerf/fruit_field.py:133-167).  On TPU the
right design is NOT a hand-fused kernel by default: the per-sample batch is
large (rays × samples ≈ 10^5-10^6), so each layer is one big [N, in]@[in, out]
matmul that XLA tiles onto the MXU and fuses with the surrounding elementwise
ops.  Weights are stored fp32 and cast to bf16 for the matmul (bf16 is native
MXU precision; fp32 accumulate via ``preferred_element_type``).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def default_compute_dtype() -> jnp.dtype:
    """bf16 (native MXU precision) unless ``CROPNERF_FP32_MATMUL=1`` — the
    fp32 verification arm used by the sharded-grad oracle to show the bf16
    flagship equivalence tolerance is pure rounding (read at trace time)."""
    import os
    return (jnp.float32 if os.environ.get("CROPNERF_FP32_MATMUL")
            else jnp.bfloat16)


def mlp_init(key: jax.Array, in_dim: int, hidden_dim: int, out_dim: int,
             num_layers: int) -> dict:
    """He-uniform init. ``num_layers`` counts weight matrices (>= 1).

    Layout: {"w": [W0, W1, ...], "b": [b0, b1, ...]} with
    W0: [in, hidden], ..., W_last: [hidden, out].
    """
    dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
    ws, bs = [], []
    for i in range(num_layers):
        key, sub = jax.random.split(key)
        fan_in = dims[i]
        bound = (6.0 / fan_in) ** 0.5
        ws.append(jax.random.uniform(sub, (dims[i], dims[i + 1]),
                                     minval=-bound, maxval=bound,
                                     dtype=jnp.float32))
        bs.append(jnp.zeros((dims[i + 1],), dtype=jnp.float32))
    return {"w": ws, "b": bs}


def mlp_apply(params: dict, x: jnp.ndarray,
              hidden_activation: Callable = jax.nn.relu,
              output_activation: Optional[Callable] = None,
              compute_dtype: Optional[jnp.dtype] = None,
              impl: str = "xla") -> jnp.ndarray:
    """Apply the MLP. Input [..., in] → [..., out] (float32 out).

    Matmuls run in ``compute_dtype`` with fp32 accumulation on the MXU.
    ``impl="pallas"`` routes relu-MLPs through the fully-fused Pallas kernel
    (ops/pallas/fused_mlp.py) — activations stay in VMEM across layers.
    """
    ws, bs = params["w"], params["b"]
    n = len(ws)
    if compute_dtype is None:
        compute_dtype = default_compute_dtype()
    if impl == "pallas-fused":
        impl = "pallas"         # the PE-fused trunk knob; plain heads use
                                # the ordinary fused-MLP kernel
    if impl == "pallas" and jax.default_backend() != "tpu":
        impl = "xla"            # Mosaic kernels are TPU-only; tests run CPU
    if impl == "pallas" and compute_dtype is jnp.float32:
        impl = "xla"            # fp32 debug mode: kernel vmem tile sizes
                                # are budgeted for bf16 slabs
    if impl == "pallas" and hidden_activation is jax.nn.relu and n >= 1:
        from .pallas.fused_mlp import fused_mlp
        batch_shape = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        wbs = []
        for w, b in zip(ws, bs):
            wbs.append(w)
            wbs.append(b.reshape(1, -1))
        h = fused_mlp(flat, wbs)
        h = h.reshape(*batch_shape, h.shape[-1])
        if output_activation is not None:
            h = output_activation(h)
        return h
    h = x.astype(compute_dtype)
    for i in range(n):
        h = jnp.dot(h, ws[i].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = h + bs[i]
        if i < n - 1:
            h = hidden_activation(h).astype(compute_dtype)
    h = h.astype(jnp.float32)
    if output_activation is not None:
        h = output_activation(h)
    return h
