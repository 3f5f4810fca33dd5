"""Component-level timing of the cropnerf-mxu step (device time, sound sync).

Each component is wrapped in a ``lax.scan`` of NUM_INNER chained iterations
inside ONE jit (the carry forces sequential execution), timed over chained
dispatches with a single device_get — the same protocol as bench.py.

    python benchmarks/profile_components.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_INNER = 10


def _time_fn(fn, *args, warmup=2, iters=6, repeats=2):
    """fn(carry, *args) -> carry ; returns best seconds per call."""
    import jax
    carry = fn(jnp_zero(), *args)
    for _ in range(warmup - 1):
        carry = fn(carry, *args)
    float(jax.device_get(carry))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = carry
        for _ in range(iters):
            c = fn(c, *args)
        v = float(jax.device_get(c))
        best = min(best, (time.perf_counter() - t0) / iters)
        assert np.isfinite(v), v
    return best


def jnp_zero():
    import jax.numpy as jnp
    return jnp.zeros(())


def main() -> None:
    import argparse
    import jax
    import jax.numpy as jnp

    from bench import _make_bank
    from cropnerf_tpu.core.cameras import generate_rays, near_far_collider
    from cropnerf_tpu.core.rays import RayBundle
    from cropnerf_tpu.data.databank import decode_pixel_index
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.models.model import _proposal_sampling, forward
    from cropnerf_tpu.models.vanilla import (vanilla_field_density,
                                             vanilla_field_rgb,
                                             vanilla_field_semantics)
    from cropnerf_tpu.models.proposal import proposal_density
    from cropnerf_tpu.ops import pdf as pdf_ops
    from cropnerf_tpu.ops import render as render_ops
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import compute_losses

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cropnerf-mxu",
                    help="any PRESETS name (e.g. cropnerf-mxu-big)")
    args, _ = ap.parse_known_args()
    cfg = PRESETS[args.preset]
    m = cfg.model
    bank, n_img = _make_bank()
    R = cfg.train_num_rays_per_batch
    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n_img)
    params = state.params

    def make_rb(key):
        idx = jax.random.randint(key, (R,), 0, bank.num_pixels)
        cam, px, py = decode_pixel_index(idx, bank.height, bank.width)
        origins, dirs = generate_rays(bank.cameras, cam, px, py)
        rb = RayBundle(origins=origins, directions=dirs,
                       nears=jnp.zeros((R,)), fars=jnp.ones((R,)),
                       camera_idx=cam)
        return near_far_collider(rb, m.near_plane, m.far_plane), idx

    rows = {}

    def timed(name, body):
        """body(carry, key) -> carry, scanned NUM_INNER times inside jit."""
        @jax.jit
        def run(carry, key):
            def sc(c, k):
                return body(c, k), None
            out, _ = jax.lax.scan(sc, carry,
                                  jax.random.split(key, NUM_INNER))
            return out
        t0 = time.perf_counter()
        dt = _time_fn(lambda c, k: run(c, k), jax.random.PRNGKey(3))
        rows[name] = dt / NUM_INNER * 1e3
        print(f"{name:34s} {rows[name]:8.3f} ms   "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)
        jax.clear_caches()

    # 1. ray gen + pixel fetch only
    def rays_only(c, k):
        rb, idx = make_rb(k)
        rgb_gt = bank.rgb[idx].astype(jnp.float32) / 255.0
        return c + jnp.sum(rb.origins[0]) + rgb_gt[0, 0], None

    timed("raygen+pixel-fetch", lambda c, k: rays_only(c, k)[0])

    # 2. proposal sampling fw (both levels + resamples), no grad
    def prop_fw(c, k):
        rb, _ = make_rb(k)
        samples, wl, sl = _proposal_sampling(params, rb, m, k, True, 1.0)
        return c + jnp.sum(samples.positions[0, 0])

    timed("prop-sampling fw (256+96+48)", prop_fw)

    # 3. prop1 eval alone: spaced sample + density + weights (1.05M samples)
    def prop1_fw(c, k):
        rb, _ = make_rb(k)
        spacing = pdf_ops.spacing_piecewise()
        s = pdf_ops.sample_spaced(k, rb, m.num_proposal_samples_per_ray[0],
                                  spacing, True, m.use_single_jitter)
        d = proposal_density(params["proposal_0"], s.positions,
                             m.proposal_fields[0])
        w = render_ops.render_weights(d, s.deltas)
        return c + jnp.sum(w[0])

    timed("prop1 eval fw (1.05M samples)", prop1_fw)

    # 4. one PDF resample alone ([4096, 97, 257] masked reduces)
    spacing = pdf_ops.spacing_piecewise()

    def resample1(c, k):
        rb, _ = make_rb(k)
        s = pdf_ops.sample_spaced(k, rb, 256, spacing, True, True)
        sdist = jnp.concatenate([s.spacing_starts, s.spacing_ends[..., -1:]],
                                axis=-1)
        w = jax.random.uniform(k, (R, 256))
        s2 = pdf_ops.sample_pdf(k, rb, sdist, w, 96, spacing, True, True)
        return c + jnp.sum(s2.positions[0, 0])

    timed("resample 256->96 (inc spaced)", resample1)

    # 4b. prop sampling fw+bw (grad wrt prop params through the interlevel
    # path: weights_list feeds the loss; resamples use stop_gradient)
    from cropnerf_tpu.ops.losses import interlevel_loss

    def prop_loss(pp, k):
        rb, _ = make_rb(k)
        merged = {**params, **pp}
        samples, wl, sl = _proposal_sampling(merged, rb, m, k, True, 1.0)
        # close the real grad path: interlevel needs the final level too
        d = proposal_density(merged["proposal_0"], samples.positions,
                             m.proposal_fields[0])
        w = render_ops.render_weights(d, samples.deltas)
        sdist = jnp.concatenate([samples.spacing_starts,
                                 samples.spacing_ends[..., -1:]], axis=-1)
        return interlevel_loss(wl + [w], sl + [sdist])

    pp0 = {k: params[k] for k in params if k.startswith("proposal")}

    def prop_fwbw(c, k):
        g = jax.grad(prop_loss)(pp0, k)
        return c + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-9, g, 0.0)

    timed("prop sampling+interlevel fw+bw", prop_fwbw)

    # 4b-i. prop sampling fw+bw WITHOUT interlevel (grad via sum of weights)
    # — isolates the prop MLP/encode/render_weights backward
    def prop_loss_nol(pp, k):
        rb, _ = make_rb(k)
        merged = {**params, **pp}
        _, wl, _ = _proposal_sampling(merged, rb, m, k, True, 1.0)
        return sum(jnp.sum(w) for w in wl) * 1e-6

    def prop_fwbw_nol(c, k):
        g = jax.grad(prop_loss_nol)(pp0, k)
        return c + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-9, g, 0.0)

    timed("prop sampling fw+bw (no interlevel)", prop_fwbw_nol)

    # 4b-iii. same but with sample positions stop-gradiented into the prop
    # nets — isolates the pose-gradient chain (encode bwd + contraction bwd
    # over 1.44M samples) whose only consumer is the 6-DoF camera optimizer
    import cropnerf_tpu.models.model as model_mod

    def prop_loss_sg(pp, k):
        rb, _ = make_rb(k)
        merged = {**params, **pp}
        orig = model_mod.proposal_density

        def sg_density(p, x, c, **kw):
            return orig(p, jax.lax.stop_gradient(x), c, **kw)

        model_mod.proposal_density = sg_density
        try:
            _, wl, _ = model_mod._proposal_sampling(merged, rb, m, k, True,
                                                    1.0)
        finally:
            model_mod.proposal_density = orig
        return sum(jnp.sum(w) for w in wl) * 1e-6

    def prop_fwbw_sg(c, k):
        g = jax.grad(prop_loss_sg)(pp0, k)
        return c + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-9, g, 0.0)

    timed("prop fw+bw (stop-grad positions)", prop_fwbw_sg)

    # 4b-ii. interlevel loss fw+bw alone on fixed histograms (grad wrt the
    # proposal weights) — isolates the outer-measure masked reduces
    key_il = jax.random.PRNGKey(11)
    wl_fix = [jax.random.uniform(key_il, (R, n))
              for n in m.num_proposal_samples_per_ray]
    w_fin = jax.random.uniform(key_il, (R, m.num_nerf_samples_per_ray))
    sl_fix = [jnp.sort(jax.random.uniform(key_il, (R, n + 1)), axis=-1)
              for n in m.num_proposal_samples_per_ray]
    s_fin = jnp.sort(jax.random.uniform(key_il,
                                        (R, m.num_nerf_samples_per_ray + 1)),
                     axis=-1)

    def il_loss(wl, k):
        return interlevel_loss(wl + [w_fin], sl_fix + [s_fin])

    def il_fwbw(c, k):
        g = jax.grad(il_loss)(
            jax.tree_util.tree_map(lambda w: w + c * 0.0, wl_fix), k)
        return c + sum(jnp.sum(jnp.abs(v)) for v in g) * 1e-6

    timed("interlevel loss fw+bw (fixed w)", il_fwbw)

    # 4c. one PDF resample fw+bw (grad wrt the weights histogram)
    def resample_loss(w, k):
        rb, _ = make_rb(k)
        s = pdf_ops.sample_spaced(k, rb, 256, spacing, True, True)
        sdist = jnp.concatenate([s.spacing_starts, s.spacing_ends[..., -1:]],
                                axis=-1)
        s2 = pdf_ops.sample_pdf(k, rb, sdist, w, 96, spacing, True, True)
        return jnp.sum(s2.positions) * 1e-6

    w0 = jax.random.uniform(key0 if False else jax.random.PRNGKey(9),
                            (R, 256))

    def resample_fwbw(c, k):
        g = jax.grad(resample_loss)(w0 + c * 0.0, k)
        return c + jnp.sum(jnp.abs(g)) * 1e-6

    timed("resample 256->96 fw+bw", resample_fwbw)

    # 5. field eval fw on fixed positions (196k samples)
    key0 = jax.random.PRNGKey(7)
    pos = jax.random.normal(key0, (R, m.num_nerf_samples_per_ray, 3))
    dirs = jax.random.normal(key0, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam_idx = jnp.zeros((R,), jnp.int32)

    def field_fw(c, k):
        p = pos + c * 0.0
        density, geo = vanilla_field_density(params["field"], p, m.field)
        rgb = vanilla_field_rgb(params["field"], geo, dirs, cam_idx,
                                m.field, True)
        sem = vanilla_field_semantics(params["field"], geo, m.field)
        return c + jnp.sum(density[0]) + jnp.sum(rgb[0, 0]) + jnp.sum(sem[0, 0])

    timed("field eval fw (196k samples)", field_fw)

    # 6. field eval fw+bw (grad wrt field params)
    def field_loss(fp, p):
        density, geo = vanilla_field_density(fp, p, m.field)
        rgb = vanilla_field_rgb(fp, geo, dirs, cam_idx, m.field, True)
        sem = vanilla_field_semantics(fp, geo, m.field)
        return jnp.sum(density) * 1e-6 + jnp.sum(rgb) * 1e-6 + jnp.sum(sem) * 1e-6

    def field_fwbw(c, k):
        p = pos + c * 0.0
        g = jax.grad(field_loss)(params["field"], p)
        return c + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b) * 1e-6, g, 0.0)

    timed("field eval fw+bw", field_fwbw)

    # 7. full forward (train mode), no grad
    def full_fw(c, k):
        rb, idx = make_rb(k)
        out = forward(params, rb, m, key=k, train=True, anneal=1.0)
        return c + jnp.mean(out["rgb"])

    timed("full forward", full_fw)

    # 8. full fw+bw (grad of loss, no optimizer)
    def full_loss(ps, k):
        rb, idx = make_rb(k)
        rgb_gt = bank.rgb[idx].astype(jnp.float32) / 255.0
        mask_gt = bank.mask[idx].astype(jnp.float32)
        out = forward(ps, rb, m, key=k, train=True, anneal=1.0)
        loss, _ = compute_losses(ps, out, rgb_gt, mask_gt, cfg, 1.0)
        return loss

    def full_fwbw(c, k):
        g = jax.grad(full_loss)(params, k)
        return c + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)) * 1e-9, g, 0.0)

    timed("full fw+bw (no opt)", full_fwbw)

    print("\nsummary (ms):")
    for k, v in rows.items():
        print(f"  {k:34s} {v:8.3f}")


if __name__ == "__main__":
    main()
