"""Train state pytree: params + optimizer state + step counter."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from ..models.config import TrainConfig
from ..models.model import model_init
from .optim import make_optimizer


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def create_train_state(key: jax.Array, cfg: TrainConfig,
                       num_images: int) -> TrainState:
    params = model_init(key, cfg.model, num_images)
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), dtype=jnp.int32))
