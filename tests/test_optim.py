"""Optimizer parity: optax.radam pinned against torch.optim.RAdam, and the
three reference param groups (proposal_networks / fields / camera_opt) with
their per-group schedules (fruit_nerf_config.py:45-60,100-114,158-166)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cropnerf_tpu.models.config import PRESETS, TrainConfig
from cropnerf_tpu.train.optim import (_opt, exp_decay_schedule, make_optimizer,
                                      optimizer_group_of)

torch = pytest.importorskip("torch")


def _run_optax(opt, p0, grads):
    p = jnp.asarray(p0)
    state = opt.init(p)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, p)
        p = optax.apply_updates(p, updates)
    return np.asarray(p)


def _run_torch_radam(p0, grads, lr, eps, weight_decay=0.0):
    p = torch.nn.Parameter(torch.tensor(p0, dtype=torch.float64))
    opt = torch.optim.RAdam([p], lr=lr, eps=eps, weight_decay=weight_decay)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g, dtype=torch.float64)
        opt.step()
    return p.detach().numpy()


class TestRAdamParity:
    """optax.radam reproduces torch.optim.RAdam (the reference's
    RAdamOptimizerConfig, fruit_nerf_config.py:101-106) across the
    rectification-threshold boundary (steps 1..12)."""

    def test_matches_torch(self):
        rng = np.random.RandomState(0)
        p0 = rng.randn(9).astype(np.float32)
        grads = [rng.randn(9).astype(np.float32) * 0.3 for _ in range(12)]
        ours = _run_optax(optax.radam(learning_rate=1e-2, eps=1e-15),
                          p0, grads)
        theirs = _run_torch_radam(p0, grads, lr=1e-2, eps=1e-15)
        # optax runs fp32, torch fp64: a wrong rectification term would be
        # off at the 1e-2 level; 2e-4 pins the algorithm through fp32 noise.
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)

    def test_weight_decay_coupling_matches_torch(self):
        """huge's camera_opt: RAdam(6e-4, eps 1e-8, weight_decay 1e-3)
        (fruit_nerf_config.py:135).  torch couples L2 into the gradient;
        add_decayed_weights-before-radam must reproduce it."""
        rng = np.random.RandomState(1)
        p0 = rng.randn(5).astype(np.float32)
        grads = [rng.randn(5).astype(np.float32) * 0.1 for _ in range(10)]
        ours = _run_optax(_opt("radam", 6e-4, 1e-8, weight_decay=1e-3),
                          p0, grads)
        theirs = _run_torch_radam(p0, grads, lr=6e-4, eps=1e-8,
                                  weight_decay=1e-3)
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-6)


class TestGroups:
    def test_group_labels(self):
        assert optimizer_group_of("camera_opt") == "camera_opt"
        assert optimizer_group_of("proposal_0") == "proposal_networks"
        assert optimizer_group_of("proposal_1") == "proposal_networks"
        assert optimizer_group_of("field") == "fields"

    def test_constant_schedule_when_final_none(self):
        assert exp_decay_schedule(1e-2, None, 100) == 1e-2
        sched = exp_decay_schedule(1e-2, 1e-4, 100)
        assert np.isclose(float(sched(0)), 1e-2)
        assert np.isclose(float(sched(100)), 1e-4)
        assert np.isclose(float(sched(1000)), 1e-4)  # clamped past T

    def test_big_preset_prop_lr_constant_fields_decay(self):
        """big: prop nets scheduler=None (constant 1e-2), fields decay to
        1e-4 over 50k (fruit_nerf_config.py:100-106)."""
        cfg = PRESETS["cropnerf-big"]
        assert cfg.optimizer == "radam"
        assert cfg.prop_lr_final is None
        assert cfg.lr_decay_max_steps == 50_000
        tx = make_optimizer(cfg)
        params = {"field": jnp.ones((3,)), "proposal_0": jnp.ones((3,)),
                  "camera_opt": jnp.ones((3,))}
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert all(bool(jnp.all(jnp.isfinite(u)))
                   for u in jax.tree.leaves(updates))

    def test_huge_camera_opt_settings(self):
        cfg = PRESETS["cropnerf-huge"]
        assert cfg.camera_opt_optimizer == "radam"
        assert cfg.camera_opt_lr == 6e-4
        assert cfg.camera_opt_eps == 1e-8
        assert cfg.camera_opt_weight_decay == 1e-3
        assert cfg.camera_opt_lr_final == 6e-5
        assert cfg.camera_opt_decay_steps == 50_000

    def test_adam_groups_still_step(self):
        """Base preset trains a step with the 3-group optimizer (regression
        for the multi_transform relabelling)."""
        cfg = PRESETS["cropnerf-tiny"]
        tx = make_optimizer(cfg)
        from cropnerf_tpu.models.model import model_init
        params = model_init(jax.random.PRNGKey(0), cfg.model, num_images=2)
        state = tx.init(params)
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        moved = jax.tree.leaves(
            jax.tree.map(lambda a, b: bool(jnp.any(a != b)), params, new))
        assert any(moved)
