"""Model forward/backward and end-to-end train-step tests (tiny preset)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.core.rays import RayBundle
from cropnerf_tpu.core.cameras import near_far_collider
from cropnerf_tpu.data.databank import build_pixel_bank
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.models.model import (anneal_factor, forward,
                                       forward_accumulation, forward_export,
                                       model_init)
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_train_step

from synthetic import render_synthetic_images, ring_cameras

CFG = PRESETS["cropnerf-tiny"]


def make_bundle(R=32):
    key = jax.random.PRNGKey(0)
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rb = RayBundle(
        origins=jnp.zeros((R, 3)) + jnp.array([0.0, 0, 2.0]),
        directions=dirs, nears=jnp.zeros((R,)), fars=jnp.ones((R,)),
        camera_idx=jnp.zeros((R,), jnp.int32))
    return near_far_collider(rb, 0.05, 100.0)


class TestModelForward:
    def test_output_shapes(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=16)
        out = forward(params, rb, CFG.model, key=jax.random.PRNGKey(1),
                      train=True)
        assert out["rgb"].shape == (16, 3)
        assert out["accumulation"].shape == (16, 1)
        assert out["depth"].shape == (16, 1)
        assert out["semantics"].shape == (16, 1)
        assert len(out["weights_list"]) == 2          # 1 prop + final
        assert out["weights_list"][0].shape == (16, 32)
        assert out["weights_list"][1].shape == (16, 16)
        assert bool(jnp.all(jnp.isfinite(out["rgb"])))

    def test_eval_deterministic(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)
        o1 = forward(params, rb, CFG.model, train=False)
        o2 = forward(params, rb, CFG.model, train=False)
        np.testing.assert_allclose(o1["rgb"], o2["rgb"])

    def test_gradients_flow_everywhere_except_semantic_into_density(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)

        def loss(p):
            out = forward(p, rb, CFG.model, key=jax.random.PRNGKey(1),
                          train=True)
            return jnp.sum(out["rgb"]) + jnp.sum(out["semantics"])

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["field"]["grid"]).sum()) > 0
        assert float(np.sum([np.abs(w).sum() for w in
                             jax.tree.leaves(g["field"]["mlp_semantic"])])) > 0
        assert float(np.sum([np.abs(w).sum() for w in
                             jax.tree.leaves(g["field"]["mlp_color"])])) > 0

    def test_semantic_loss_does_not_move_density(self):
        """pass_semantic_gradients=False: semantic output must not produce
        grads into the base (density) MLP (fruit_nerf.py:66,586-591)."""
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)

        def sem_loss(p):
            out = forward(p, rb, CFG.model, key=jax.random.PRNGKey(1),
                          train=True)
            return jnp.sum(out["semantics"])

        g = jax.grad(sem_loss)(params)
        base_grad = np.sum([np.abs(w).sum() for w in
                            jax.tree.leaves(g["field"]["mlp_base"])])
        assert base_grad == pytest.approx(0.0, abs=1e-12)

    def test_prop_no_grad_schedule_gradient_equivalence(self):
        """The lax.cond no-grad schedule (≙ nerfstudio no_grad between
        update steps) must give IDENTICAL grads to gating the interlevel
        loss: on update steps all grads match the unconditioned forward; on
        non-update steps prop grads are exactly zero and everything else
        matches."""
        from cropnerf_tpu.ops import losses as loss_ops
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)

        def loss(p, prop_update, flag):
            out = forward(p, rb, CFG.model, key=jax.random.PRNGKey(1),
                          train=True, prop_update=prop_update)
            inter = loss_ops.interlevel_loss(out["weights_list"],
                                             out["sdist_list"])
            return jnp.sum(out["rgb"] ** 2) + inter * flag

        g_ref_on = jax.grad(lambda p: loss(p, None, 1.0))(params)
        g_on = jax.grad(lambda p: loss(p, jnp.array(True), 1.0))(params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6), g_ref_on, g_on)

        g_ref_off = jax.grad(lambda p: loss(p, None, 0.0))(params)
        g_off = jax.grad(lambda p: loss(p, jnp.array(False), 0.0))(params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6), g_ref_off, g_off)
        for k in params:
            if k.startswith("proposal_"):
                assert float(np.sum([np.abs(x).sum() for x in
                                     jax.tree.leaves(g_off[k])])) == 0.0

    def test_prop_no_grad_forward_value_unchanged(self):
        """prop_update only affects gradients, never the forward values."""
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)
        o_ref = forward(params, rb, CFG.model, key=jax.random.PRNGKey(1),
                        train=True)
        for flag in (True, False):
            o = forward(params, rb, CFG.model, key=jax.random.PRNGKey(1),
                        train=True, prop_update=jnp.array(flag))
            np.testing.assert_allclose(np.asarray(o["rgb"]),
                                       np.asarray(o_ref["rgb"]), atol=1e-6)

    def test_anneal_schedule(self):
        a0 = float(anneal_factor(jnp.array(0), CFG.model))
        a_half = float(anneal_factor(
            jnp.array(CFG.model.proposal_weights_anneal_max_num_iters // 2),
            CFG.model))
        a1 = float(anneal_factor(
            jnp.array(CFG.model.proposal_weights_anneal_max_num_iters),
            CFG.model))
        assert a0 == 0.0 and a1 == pytest.approx(1.0)
        assert 0.5 < a_half < 1.0   # slope-10 bias is front-loaded

    def test_forward_export_raw_samples(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)
        aabb = jnp.array([[-1.0, -1, -1], [1, 1, 1]])
        out = forward_export(params, rb, CFG.model, num_samples=16, aabb=aabb)
        assert out["density"].shape == (8, 16)
        assert out["semantics"].shape == (8, 16)
        assert out["point_location"].shape == (8, 16, 3)

    def test_forward_accumulation(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=8)
        acc = forward_accumulation(params, rb, CFG.model)
        assert acc.shape == (8,)
        assert bool(jnp.all((acc >= 0) & (acc <= 1 + 1e-5)))


class TestTrainStep:
    def _tiny_bank(self):
        cams = ring_cameras(n=4, height=32, width=32, focal=40.0)
        imgs, masks = render_synthetic_images(cams, 32, 32)
        return build_pixel_bank(imgs, masks, cams)

    def test_step_runs_and_decreases_loss(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, train_num_rays_per_batch=128)
        bank = self._tiny_bank()
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   num_images=bank.num_images)
        step = make_train_step(cfg, donate=False)
        key = jax.random.PRNGKey(2)
        losses = []
        for i in range(60):
            key, sub = jax.random.split(key)
            state, metrics = step(state, bank, sub)
            losses.append(float(metrics["rgb_loss"]))
        assert int(state.step) == 60
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8
        assert np.isfinite(losses).all()

    def test_step_on_8_device_mesh(self):
        """Sharded train step on the virtual CPU mesh (replaces the
        reference's nonexistent distributed tests, SURVEY §4)."""
        import dataclasses
        cfg = dataclasses.replace(CFG, train_num_rays_per_batch=128)
        devices = jax.devices()
        assert len(devices) == 8, "conftest should provide 8 virtual devices"
        mesh = jax.sharding.Mesh(np.array(devices), ("data",))
        bank = self._tiny_bank()
        state = create_train_state(jax.random.PRNGKey(0), cfg,
                                   num_images=bank.num_images)
        step = make_train_step(cfg, mesh=mesh, donate=False)
        state2, metrics = step(state, bank, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        # same math as the single-device step
        step1 = make_train_step(cfg, donate=False)
        state1, metrics1 = step1(state, bank, jax.random.PRNGKey(3))
        assert float(metrics1["loss"]) == pytest.approx(
            float(metrics["loss"]), rel=1e-4)


class TestGradientScaling:
    """use_gradient_scaling ≙ nerfacto's scale_gradients_by_distance_squared
    (fruit_nerf.py:432-434): forward identical, field gradients damped by
    clamp(t², 0, 1) near the camera."""

    def test_forward_identity_grads_damped(self):
        import dataclasses as dc
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=4)
        rb = make_bundle(R=16)
        cfg_off = CFG.model
        cfg_on = dc.replace(CFG.model, use_gradient_scaling=True)

        out_off = forward(params, rb, cfg_off, train=False)
        out_on = forward(params, rb, cfg_on, train=False)
        np.testing.assert_allclose(np.asarray(out_on["rgb"]),
                                   np.asarray(out_off["rgb"]),
                                   rtol=1e-5, atol=1e-6)

        def loss(p, cfg):
            out = forward(p, rb, cfg, train=False)
            return jnp.sum(out["rgb"] ** 2)

        g_off = jax.grad(loss)(params, cfg_off)["field"]
        g_on = jax.grad(loss)(params, cfg_on)["field"]
        n_off = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_off))
        n_on = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_on))
        assert n_on < n_off            # all sample distances < 1 → damped
        assert n_on > 0.0              # but gradients still flow


class TestScannedTrainStep:
    """num_inner > 1 fuses K optimizer steps into one XLA program
    (lax.scan); the step counter advances by K and training still learns."""

    def test_scan_matches_step_count_and_learns(self):
        import dataclasses as dc
        from cropnerf_tpu.data.databank import build_pixel_bank
        from cropnerf_tpu.train.state import create_train_state
        from synthetic import render_synthetic_images, ring_cameras
        cfg = dc.replace(PRESETS["cropnerf-tiny"],
                         train_num_rays_per_batch=128)
        cams = ring_cameras(n=4, height=16, width=16, focal=20.0)
        images, masks = render_synthetic_images(cams, 16, 16)
        bank = build_pixel_bank(images, masks, cams)
        state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=4)
        step = make_train_step(cfg, donate=False, num_inner=5)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(8):                       # 40 optimizer steps
            key, sub = jax.random.split(key)
            state, m = step(state, bank, sub)
            losses.append(float(m["loss"]))
        assert int(state.step) == 40
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]
