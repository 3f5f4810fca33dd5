"""LPIPS perceptual metric (eval-only, optional).

The reference uses torchmetrics' LPIPS with pretrained VGG weights
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:183,699).  Pretrained
weights cannot be fetched in a zero-egress environment, so this module
implements the LPIPS *computation* in jnp — the exact math is golden-tested
against a torch reference implementation with shared random weights
(tests/test_lpips_profiling.py) — and loads real weights from a local
``.npz`` (``CROPNERF_LPIPS_WEIGHTS`` env var, produced by
tools/convert_lpips_weights.py).  Without a weight file the metric is
reported as UNAVAILABLE (never silently omitted; the trainer prints why).

Math (Zhang et al., the ``lpips`` package with ``spatial_average=True``):
input in [0,1] → scaled to [-1,1] → per-channel shift/scale → VGG16 convs
(ReLU, maxpool between stages); at each tap (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3): unit-normalise the channel dim, squared difference,
per-channel linear calibration, spatial mean; sum over taps.

Weight file layout (``lpips_weights.npz``): conv kernels ``convN_w``
[kh, kw, cin, cout] + biases ``convN_b`` numbered sequentially through the
VGG16 feature stack; ``linN`` [c] at each tap's conv index.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])

_DEFAULT_WEIGHTS: Optional[dict] = None
_DEFAULT_LOADED = False


def load_weights(path: Path) -> Optional[dict]:
    path = Path(path)
    if not path.exists():
        return None
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


# LPIPS tap widths for the five VGG16 stages (relu1_2..relu5_3) and the
# number of convs per stage — the structure uncalibrated_weights mirrors
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def uncalibrated_weights(width_mult: float = 0.25, seed: int = 0) -> dict:
    """Deterministic random VGG16-structure weights (He-init convs, positive
    per-channel lin heads) at ``width_mult`` of the real channel widths.

    UNCALIBRATED: produces a valid perceptual-distance-shaped metric (same
    taps, normalisation and calibration math as real LPIPS) whose absolute
    values are meaningless — useful so the full eval path (trainer._lpips →
    ops.lpips) runs end-to-end in zero-egress CI, and for relative
    comparisons within one run.  Enabled via
    ``CROPNERF_LPIPS_WEIGHTS=uncalibrated``; real weights come from
    tools/convert_lpips_weights.py."""
    rng = np.random.RandomState(seed)
    out = {}
    cin = 3
    conv_idx = 0
    for width, n_convs in _VGG_STAGES:
        cout = max(8, int(width * width_mult))
        for i in range(n_convs):
            std = float(np.sqrt(2.0 / (3 * 3 * cin)))
            out[f"conv{conv_idx}_w"] = jnp.asarray(
                rng.randn(3, 3, cin, cout).astype(np.float32) * std)
            out[f"conv{conv_idx}_b"] = jnp.zeros((cout,), jnp.float32)
            if i == n_convs - 1:          # stage tap
                out[f"lin{conv_idx}"] = jnp.asarray(
                    np.abs(rng.randn(cout)).astype(np.float32) / cout)
            cin = cout
            conv_idx += 1
    return out


def default_weights() -> Optional[dict]:
    """Weights from ``CROPNERF_LPIPS_WEIGHTS`` (cached), or None.

    The sentinel value ``uncalibrated`` synthesizes deterministic random
    weights (:func:`uncalibrated_weights`) — full pipeline, meaningless
    absolute scale; a one-time warning says so."""
    global _DEFAULT_WEIGHTS, _DEFAULT_LOADED
    if not _DEFAULT_LOADED:
        _DEFAULT_LOADED = True
        p = os.environ.get("CROPNERF_LPIPS_WEIGHTS")
        if p and p.strip().lower() == "uncalibrated":
            print("lpips: using UNCALIBRATED deterministic random VGG "
                  "weights (CROPNERF_LPIPS_WEIGHTS=uncalibrated) — values "
                  "are only comparable within this configuration, not to "
                  "published LPIPS numbers", flush=True)
            _DEFAULT_WEIGHTS = uncalibrated_weights()
        elif p:
            _DEFAULT_WEIGHTS = load_weights(Path(p))
    return _DEFAULT_WEIGHTS


def reset_weights_cache() -> None:
    """Drop the cached default weights (tests toggle the env var)."""
    global _DEFAULT_WEIGHTS, _DEFAULT_LOADED
    _DEFAULT_WEIGHTS, _DEFAULT_LOADED = None, False


def lpips_available() -> bool:
    return default_weights() is not None


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def _normalize(feat):
    n = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / jnp.maximum(n, 1e-10)


_UNSET = object()


def lpips(pred: jnp.ndarray, target: jnp.ndarray,
          weights=_UNSET) -> Optional[jnp.ndarray]:
    """pred/target [H, W, 3] in [0, 1].  Returns the LPIPS distance, or
    ``None`` when no weights are available (callers report the metric as
    unavailable — matching reference behaviour when torchmetrics is
    missing).  ``weights`` defaults to :func:`default_weights`."""
    if weights is _UNSET:
        weights = default_weights()
    if weights is None:
        return None
    x = ((pred[None] * 2.0 - 1.0) - _SHIFT) / _SCALE
    y = ((target[None] * 2.0 - 1.0) - _SHIFT) / _SCALE
    dist = 0.0
    conv_idx = 0
    while f"conv{conv_idx}_w" in weights:
        x = _conv(x, weights[f"conv{conv_idx}_w"],
                  weights[f"conv{conv_idx}_b"])
        y = _conv(y, weights[f"conv{conv_idx}_w"],
                  weights[f"conv{conv_idx}_b"])
        if f"lin{conv_idx}" in weights:
            # tap: unit-normalise channels, squared diff, per-channel lin
            # calibration summed over channels, spatial mean
            d = (_normalize(x) - _normalize(y)) ** 2
            d = jnp.sum(d * weights[f"lin{conv_idx}"], axis=-1)  # [1, H, W]
            dist = dist + jnp.mean(d, axis=(1, 2))
            # maxpool between VGG stages
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        conv_idx += 1
    return dist[0]
