"""Per-group optimizers + exponential-decay LR schedules (optax).

Equivalent of the reference's optimizer dict
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf_config.py:45-60):
``proposal_networks`` / ``fields`` → Adam(1e-2, eps 1e-15) with exp decay to
1e-4 over 200k steps; ``camera_opt`` → Adam(1e-3) decaying to 1e-4 over 5k.
The big/huge presets use RAdam (:99-114).
"""
from __future__ import annotations

import optax

from ..models.config import TrainConfig


def exp_decay_schedule(lr_init: float, lr_final: float, max_steps: int):
    """nerfstudio ExponentialDecayScheduler: lr(t) = init*(final/init)^(t/T),
    clamped at lr_final past T."""
    def schedule(step):
        import jax.numpy as jnp
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        return lr_init * (lr_final / lr_init) ** t
    return schedule


def _base_opt(cfg: TrainConfig, schedule) -> optax.GradientTransformation:
    if cfg.optimizer == "radam":
        # optax has no radam; nadamw's rectified behaviour is the closest
        # stock transform — use adam with the same eps (documented divergence;
        # RAdam mainly changes early-step variance rectification).
        return optax.adam(learning_rate=schedule, eps=cfg.adam_eps)
    return optax.adam(learning_rate=schedule, eps=cfg.adam_eps)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """One optax transform over the whole model pytree, with the camera-opt
    leaves routed to their own (lower-LR) Adam."""
    field_sched = exp_decay_schedule(cfg.learning_rate, cfg.lr_final,
                                     cfg.lr_decay_max_steps)
    cam_sched = exp_decay_schedule(cfg.camera_opt_lr, cfg.camera_opt_lr_final,
                                   cfg.camera_opt_decay_steps)

    def label_fn(params):
        return {k: ("camera_opt" if k == "camera_opt" else "fields")
                for k in params}

    return optax.multi_transform(
        {
            "fields": _base_opt(cfg, field_sched),
            "camera_opt": optax.adam(learning_rate=cam_sched, eps=1e-15),
        },
        label_fn,
    )
