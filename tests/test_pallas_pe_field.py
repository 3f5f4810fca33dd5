"""Fused PE-field kernel (ops/pallas/fused_pe_field.py) correctness.

Validates, on CPU:
  * the selector-matrix encoding reproduces ops/posenc.nerf_encoding;
  * the jnp fallback path of fused_pe_density matches the split
    vanilla_field_density pipeline (fw + grads wrt params AND positions);
  * the Pallas kernels themselves (interpret mode) match the fallback
    bit-for-bit in forward and to tight tolerance in backward — this pins
    the kernel's grad-slot ordering and the skip-layer split.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.models.config import FieldConfig
from cropnerf_tpu.models.vanilla import (POS_FREQS, vanilla_field_density,
                                         vanilla_field_init)
from cropnerf_tpu.ops.pallas.fused_pe_field import (_ref_forward,
                                                    fused_pe_density,
                                                    pe_selector_matrix)
from cropnerf_tpu.ops.posenc import nerf_encoding


def _wbs(key, dims):
    ws = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]),
                                    jnp.float32) * (1.0 / dims[i] ** 0.5))
        ws.append(jax.random.normal(k2, (1, dims[i + 1]), jnp.float32) * 0.01)
    return ws


def test_selector_matrix_matches_nerf_encoding():
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3), minval=-1,
                           maxval=1)
    s = jnp.asarray(pe_selector_matrix(6))
    pre = x @ s
    col = np.arange(pre.shape[1])
    enc = np.where(col < 3, pre, np.where(col < 3 + 18, np.sin(pre),
                                          np.cos(pre)))
    ref = nerf_encoding(x, 6)
    np.testing.assert_allclose(np.asarray(enc), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n_base,n_top,hidden", [(4, 4, 256), (2, 3, 64)])
def test_fallback_matches_split_pipeline(n_base, n_top, hidden):
    """Fallback-path fused_pe_density == nerf_encoding + two bf16 MLPs."""
    F = POS_FREQS
    enc_dim = 3 * (1 + 2 * F)
    key = jax.random.PRNGKey(1)
    base = _wbs(key, [enc_dim] + [hidden] * n_base)
    top = _wbs(jax.random.PRNGKey(2),
               [hidden + enc_dim] + [hidden] * (n_top - 1) + [16])
    x = jax.random.uniform(jax.random.PRNGKey(3), (100, 3), minval=-1,
                           maxval=1)
    s = jnp.asarray(pe_selector_matrix(F))
    got = fused_pe_density(x, s, base, top, F)

    enc = nerf_encoding(x, F)
    h = enc.astype(jnp.bfloat16)
    for i in range(n_base):
        h = jnp.dot(h, base[2 * i].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + base[2 * i + 1]
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    t = jnp.concatenate([h.astype(jnp.float32), enc], -1).astype(jnp.bfloat16)
    for i in range(n_top):
        t = jnp.dot(t, top[2 * i].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + top[2 * i + 1]
        if i < n_top - 1:
            t = jnp.maximum(t, 0.0).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(t), atol=2e-2,
                               rtol=2e-2)


def test_kernel_interpret_matches_fallback_fw_and_bw():
    """Pallas fwd/bwd kernels (interpret) vs the jnp fallback: pins slot
    ordering, the skip split, and the encode backward chain."""
    F = 4
    enc_dim = 3 * (1 + 2 * F)
    H = 32
    base = _wbs(jax.random.PRNGKey(4), [enc_dim, H, H])
    top = _wbs(jax.random.PRNGKey(5), [H + enc_dim, H, 8])
    x = jax.random.uniform(jax.random.PRNGKey(6), (256, 3), minval=-1,
                           maxval=1)
    s = jnp.asarray(pe_selector_matrix(F))

    def loss(x, base, top, interpret, tile):
        out = fused_pe_density(x, s, base, top, F, tile, interpret, 3, tile)
        return jnp.sum(jnp.sin(out * 3.0)), out

    # fallback: interpret off on CPU → jnp path
    (l_ref, out_ref), g_ref = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, base, top, False, 177)
    # kernel path in interpret mode (grid of 2 tiles exercises accumulation
    # in fwd AND — via tile_bwd=128 — in the recompute bwd)
    (l_k, out_k), g_k = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, base, top, True, 128)

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    # bwd: the kernel casts cotangents to bf16 before each backward matmul
    # (same convention as ops/pallas/fused_mlp.py); the fallback's autodiff
    # keeps them f32, so grads agree to bf16 precision, not bitwise
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2,
                                   rtol=5e-2)


def test_vanilla_density_pallas_fused_matches_xla():
    """End-to-end: vanilla_field_density with mlp_impl='pallas-fused'
    (fallback on CPU) vs 'xla', values and parameter/position grads."""
    cfg_x = FieldConfig(field_type="vanilla", hidden_dim=64, geo_feat_dim=15,
                        mlp_impl="xla")
    cfg_f = FieldConfig(field_type="vanilla", hidden_dim=64, geo_feat_dim=15,
                        mlp_impl="pallas-fused")
    params = vanilla_field_init(jax.random.PRNGKey(7), cfg_x, num_images=4)
    pos = jax.random.normal(jax.random.PRNGKey(8), (32, 12, 3)) * 0.5

    def loss(params, pos, cfg):
        density, geo = vanilla_field_density(params, pos, cfg)
        return jnp.mean(density) + jnp.mean(geo ** 2)

    lx, gx = jax.value_and_grad(loss, argnums=(0, 1))(params, pos, cfg_x)
    lf, gf = jax.value_and_grad(loss, argnums=(0, 1))(params, pos, cfg_f)
    np.testing.assert_allclose(float(lf), float(lx), rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2,
                                   rtol=5e-2)


@pytest.mark.parametrize("pass_sem", [False, True])
def test_mega_kernel_interpret_matches_fallback(pass_sem):
    """fused_pe_nerf Pallas fwd/bwd (interpret) vs its jnp fallback: pins
    the head slot ordering, the zero-pad-row trick, extras grads, and the
    semantic stop-gradient flag."""
    from cropnerf_tpu.ops.pallas.fused_pe_field import fused_pe_nerf

    F, H, Hc, Hs, De, G = 4, 32, 24, 16, 19, 7
    enc_dim = 3 * (1 + 2 * F)
    base = _wbs(jax.random.PRNGKey(10), [enc_dim, H, H])
    top = _wbs(jax.random.PRNGKey(11), [H + enc_dim, H, 1 + G])
    # color: [WcT_pad(1+G,Hc), WcE(De,Hc), bc0, Wc1, bc1]
    kc = jax.random.PRNGKey(12)
    wc0 = jax.random.normal(kc, (G, Hc)) * 0.2
    color = [jnp.pad(wc0, ((1, 0), (0, 0))),
             jax.random.normal(jax.random.PRNGKey(13), (De, Hc)) * 0.2,
             jnp.zeros((1, Hc))] + _wbs(jax.random.PRNGKey(14), [Hc, 3])
    ws0 = jax.random.normal(jax.random.PRNGKey(15), (G, Hs)) * 0.2
    sem = [jnp.pad(ws0, ((1, 0), (0, 0))), jnp.zeros((1, Hs))] + \
        _wbs(jax.random.PRNGKey(16), [Hs, 2])
    x = jax.random.uniform(jax.random.PRNGKey(17), (256, 3), minval=-1,
                           maxval=1)
    ex = jax.random.normal(jax.random.PRNGKey(18), (256, De)) * 0.3
    from cropnerf_tpu.ops.pallas.fused_pe_field import pe_selector_matrix
    s = jnp.asarray(pe_selector_matrix(F))

    def loss(x, ex, base, top, color, sem, interpret, tile):
        t, rgb, sm = fused_pe_nerf(x, ex, s, base, top, color, sem, F,
                                   pass_sem, tile, interpret, 3, tile)
        out = (jnp.sum(jnp.sin(t)) + jnp.sum(jnp.cos(rgb * 2))
               + jnp.sum(jnp.sin(sm * 0.5)))
        return out, (t, rgb, sm)

    args = (x, ex, base, top, color, sem)
    (l_r, o_r), g_r = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                                         has_aux=True)(*args, False, 177)
    (l_k, o_k), g_k = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                                         has_aux=True)(*args, True, 128)
    for a, b in zip(o_k, o_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2,
                                   rtol=5e-2)


@pytest.mark.parametrize("pass_sem", [False, True])
def test_vanilla_field_all_fused_matches_split(pass_sem):
    """vanilla_field_all with mlp_impl='pallas-fused' (CPU fallback) vs the
    three split functions: values + grads incl. the appearance table and
    the semantic stop-gradient behavior."""
    from cropnerf_tpu.models.vanilla import vanilla_field_all

    cfg_x = FieldConfig(field_type="vanilla", hidden_dim=64, geo_feat_dim=15,
                        mlp_impl="xla")
    cfg_f = FieldConfig(field_type="vanilla", hidden_dim=64, geo_feat_dim=15,
                        mlp_impl="pallas-fused")
    params = vanilla_field_init(jax.random.PRNGKey(20), cfg_x, num_images=4)
    pos = jax.random.normal(jax.random.PRNGKey(21), (16, 12, 3)) * 0.5
    dirs = jax.random.normal(jax.random.PRNGKey(22), (16, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = jnp.arange(16, dtype=jnp.int32) % 4

    def loss(params, cfg):
        d, rgb, sm = vanilla_field_all(params, pos, dirs, cam, cfg,
                                       train=True, pass_sem_grads=pass_sem)
        return jnp.mean(d) + jnp.mean(rgb ** 2) + jnp.mean(sm ** 2)

    lx, gx = jax.value_and_grad(loss)(params, cfg_x)
    lf, gf = jax.value_and_grad(loss)(params, cfg_f)
    np.testing.assert_allclose(float(lf), float(lx), rtol=2e-2)
    leaves_x = jax.tree_util.tree_leaves_with_path(gx)
    leaves_f = jax.tree_util.tree_leaves_with_path(gf)
    for (pa, a), (pb, b) in zip(leaves_f, leaves_x):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=5e-2,
            err_msg=jax.tree_util.keystr(pa))


def test_plain_kernel_interpret_matches_fallback():
    """fused_pe_mlp (proposal-net kernel) Pallas fwd/bwd (interpret) vs the
    jnp fallback."""
    from cropnerf_tpu.ops.pallas.fused_pe_field import fused_pe_mlp

    F = 5
    enc_dim = 3 * (1 + 2 * F)
    wbs = _wbs(jax.random.PRNGKey(30), [enc_dim, 64, 64, 1])
    x = jax.random.uniform(jax.random.PRNGKey(31), (256, 3), minval=-1,
                           maxval=1)
    s = jnp.asarray(pe_selector_matrix(F))

    def loss(x, wbs, interpret, tile):
        out = fused_pe_mlp(x, s, wbs, F, tile, interpret, 3, tile)
        return jnp.sum(jnp.sin(out * 2.0)), out

    (l_r, o_r), g_r = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(x, wbs, False, 177)
    (l_k, o_k), g_k = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(x, wbs, True, 128)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_r), atol=1e-5,
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2,
                                   rtol=5e-2)


def test_proposal_density_pallas_fused_matches_xla():
    from cropnerf_tpu.models.config import ProposalFieldConfig
    from cropnerf_tpu.models.proposal import proposal_density, proposal_init

    cfg_x = ProposalFieldConfig(field_type="pe", hidden_dim=64, num_layers=3,
                                pe_freqs=5, mlp_impl="xla")
    cfg_f = dataclasses_replace(cfg_x, mlp_impl="pallas-fused")
    params = proposal_init(jax.random.PRNGKey(40), cfg_x)
    pos = jax.random.normal(jax.random.PRNGKey(41), (32, 24, 3)) * 0.5

    def loss(params, cfg):
        return jnp.mean(proposal_density(params, pos, cfg))

    lx, gx = jax.value_and_grad(loss)(params, cfg_x)
    lf, gf = jax.value_and_grad(loss)(params, cfg_f)
    np.testing.assert_allclose(float(lf), float(lx), rtol=2e-2, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2,
                                   rtol=5e-2)


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_pick_tile_divisor_fallback():
    """_pick_tile halves the preferred tile until it divides N (so a batch
    divisible by 768 but not 1024 still runs the kernel), and returns 0 —
    jnp reference path — only when no divisor >= the floor exists."""
    from cropnerf_tpu.ops.pallas.fused_pe_field import _pick_tile

    assert _pick_tile(4096, 1024) == 1024
    assert _pick_tile(2304, 1024) == 256        # 2304 = 9*256
    assert _pick_tile(2304, 768) == 768         # bwd-preferred divides
    assert _pick_tile(1280, 1024) == 256
    assert _pick_tile(177, 1024) == 0           # prime-ish → ref path
    assert _pick_tile(128, 4096) == 128


def test_bwd_never_pairs_kernel_with_ref_forward():
    """N=576: the fwd chain (1024→512→256→128) misses but the bwd chain
    (768→384→192) hits.  The backward must then differentiate the SAME jnp
    reference path the forward took — pairing a reference forward with a
    kernel (recompute) backward yields gradients inconsistent with the
    produced values.  With the paths coupled, the interpret=True run is
    bit-identical to the pure-jnp run."""
    F = 4
    enc_dim = 3 * (1 + 2 * F)
    H = 32
    base = _wbs(jax.random.PRNGKey(24), [enc_dim, H, H])
    top = _wbs(jax.random.PRNGKey(25), [H + enc_dim, H, 8])
    x = jax.random.uniform(jax.random.PRNGKey(26), (576, 3), minval=-1,
                           maxval=1)
    s = jnp.asarray(pe_selector_matrix(F))

    def loss(x, base, top, interpret):
        out = fused_pe_density(x, s, base, top, F, 1024, interpret, 3, 768)
        return jnp.sum(jnp.sin(out * 3.0)), out

    (_, out_ref), g_ref = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, base, top, False)
    (_, out_k), g_k = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, base, top, True)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_ref))
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_density_kernel_odd_tile_divisor_interpret():
    """End-to-end through _pick_tile: N=384 is divisible by neither the
    fwd preferred (1024→…→256? no: 384%256!=0) until 128, so both fwd and
    bwd land on tile 128 instead of silently dropping to the jnp path."""
    F = 4
    enc_dim = 3 * (1 + 2 * F)
    H = 32
    base = _wbs(jax.random.PRNGKey(14), [enc_dim, H, H])
    top = _wbs(jax.random.PRNGKey(15), [H + enc_dim, H, 8])
    x = jax.random.uniform(jax.random.PRNGKey(16), (384, 3), minval=-1,
                           maxval=1)
    s = jnp.asarray(pe_selector_matrix(F))

    def loss(x, base, top, interpret):
        out = fused_pe_density(x, s, base, top, F, 1024, interpret, 3, 512)
        return jnp.sum(jnp.sin(out * 3.0)), out

    (_, out_ref), g_ref = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, base, top, False)
    (_, out_k), g_k = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, base, top, True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    # kernel casts cotangents to bf16; position grads pass through the
    # 2^F-scaled sin/cos chain, so slightly wider atol than the weight grads
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-1,
                                   rtol=5e-2)
