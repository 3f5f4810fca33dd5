"""Per-group optimizers + exponential-decay LR schedules (optax).

Equivalent of the reference's optimizer dict
(/root/reference/crop_nerf/fruit_nerf/fruit_nerf_config.py:45-60,100-114,158-166):

* base:  ``proposal_networks`` / ``fields`` → Adam(1e-2, eps 1e-15) decaying
  to 1e-4 over 200k; ``camera_opt`` → Adam(1e-3, eps 1e-15) decaying to 1e-4
  over 5k.
* big/huge: ``proposal_networks`` → RAdam(1e-2, eps 1e-15) at CONSTANT lr
  (scheduler=None in the reference); ``fields`` → RAdam(1e-2, eps 1e-15)
  decaying to 1e-4 over 50k.  huge's camera_opt is RAdam(6e-4, eps 1e-8,
  weight_decay 1e-3) decaying to 6e-5 over 50k (fruit_nerf_config.py:133-137).

RAdam is ``optax.radam`` (verified against ``torch.optim.RAdam`` in
tests/test_optim.py); torch's coupled L2 weight decay is reproduced by
chaining ``optax.add_decayed_weights`` before the RAdam transform.
"""
from __future__ import annotations

import optax

from ..models.config import TrainConfig


def exp_decay_schedule(lr_init: float, lr_final, max_steps: int):
    """nerfstudio ExponentialDecayScheduler: lr(t) = init*(final/init)^(t/T),
    clamped at lr_final past T.  ``lr_final=None`` → constant lr (the
    reference's ``scheduler=None``)."""
    if lr_final is None:
        return lr_init

    def schedule(step):
        import jax.numpy as jnp
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        return lr_init * (lr_final / lr_init) ** t
    return schedule


def _opt(kind: str, schedule, eps: float,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    if kind == "radam":
        base = optax.radam(learning_rate=schedule, eps=eps)
    elif kind == "adam":
        base = optax.adam(learning_rate=schedule, eps=eps)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")
    if weight_decay:
        # torch couples L2 decay into the gradient BEFORE the adaptive
        # update (g += wd*p); add_decayed_weights placed first matches that.
        return optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


def optimizer_group_of(param_key: str) -> str:
    """Top-level params key → reference optimizer group
    (fruit_nerf.py:191-196 get_param_groups)."""
    if param_key == "camera_opt":
        return "camera_opt"
    if param_key.startswith("proposal_"):
        return "proposal_networks"
    return "fields"


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """One optax transform over the whole model pytree with the reference's
    three param groups (proposal_networks / fields / camera_opt), each with
    its own optimizer kind, eps, and LR schedule."""
    field_sched = exp_decay_schedule(cfg.learning_rate, cfg.lr_final,
                                     cfg.lr_decay_max_steps)
    prop_sched = exp_decay_schedule(cfg.prop_learning_rate, cfg.prop_lr_final,
                                    cfg.prop_lr_decay_max_steps)
    cam_sched = exp_decay_schedule(cfg.camera_opt_lr, cfg.camera_opt_lr_final,
                                   cfg.camera_opt_decay_steps)

    def label_fn(params):
        return {k: optimizer_group_of(k) for k in params}

    return optax.multi_transform(
        {
            "fields": _opt(cfg.optimizer, field_sched, cfg.adam_eps),
            "proposal_networks": _opt(cfg.optimizer, prop_sched, cfg.adam_eps),
            "camera_opt": _opt(cfg.camera_opt_optimizer, cam_sched,
                               cfg.camera_opt_eps,
                               cfg.camera_opt_weight_decay),
        },
        label_fn,
    )
