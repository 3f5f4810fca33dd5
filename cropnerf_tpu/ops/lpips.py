"""LPIPS perceptual metric (eval-only, optional).

The reference uses torchmetrics' LPIPS with pretrained VGG/AlexNet weights
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:183,699).  Pretrained
weights cannot be fetched in a zero-egress environment, so this module
implements the LPIPS *computation* in jnp (normalised deep-feature
distances with learned linear calibration) and loads weights from a local
``.npz``; without a weight file it degrades to a documented fallback.

Weight file layout (``lpips_weights.npz``): conv kernels ``convN_w`` [kh,
kw, cin, cout] + biases ``convN_b`` for the 5 VGG16 feature stages, and
per-stage linear calibration weights ``linN`` [c].
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


def load_weights(path: Path) -> Optional[dict]:
    path = Path(path)
    if not path.exists():
        return None
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def _normalize(feat):
    n = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / jnp.maximum(n, 1e-10)


def lpips(pred: jnp.ndarray, target: jnp.ndarray,
          weights: Optional[dict]) -> Optional[jnp.ndarray]:
    """pred/target [H, W, 3] in [0, 1].  Returns the LPIPS distance, or
    ``None`` when no weight file is available (callers report the metric as
    absent — matching reference behaviour when torchmetrics is missing)."""
    if weights is None:
        return None
    x = ((pred[None] - 0.5) * 2.0 - _SHIFT) / _SCALE
    y = ((target[None] - 0.5) * 2.0 - _SHIFT) / _SCALE
    dist = 0.0
    stage = 0
    while f"conv{stage}_w" in weights:
        x = _conv(x, weights[f"conv{stage}_w"], weights[f"conv{stage}_b"])
        y = _conv(y, weights[f"conv{stage}_w"], weights[f"conv{stage}_b"])
        if f"lin{stage}" in weights:
            d = (_normalize(x) - _normalize(y)) ** 2
            d = jnp.mean(d * weights[f"lin{stage}"], axis=(1, 2, 3))
            dist = dist + d
            # spatial downsample between stages
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        stage += 1
    return dist[0]
