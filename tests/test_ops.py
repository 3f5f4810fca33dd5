"""Unit tests for the kernel-level ops against numpy/torch references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.ops import render as render_ops
from cropnerf_tpu.ops import losses as loss_ops
from cropnerf_tpu.ops import metrics as metric_ops
from cropnerf_tpu.ops.activations import trunc_exp
from cropnerf_tpu.ops.hashgrid import hashgrid_encode, hashgrid_init, level_resolutions
from cropnerf_tpu.ops.mlp import mlp_apply, mlp_init
from cropnerf_tpu.ops.sh import sh_encoding


class TestTruncExp:
    def test_forward_matches_exp(self):
        x = jnp.linspace(-5, 5, 11)
        np.testing.assert_allclose(trunc_exp(x), np.exp(x), rtol=1e-6)

    def test_grad_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x))(100.0)
        assert np.isfinite(g)
        assert g == pytest.approx(np.exp(15.0))

    def test_grad_matches_exp_in_range(self):
        g = jax.grad(lambda x: trunc_exp(x))(2.0)
        assert g == pytest.approx(np.exp(2.0), rel=1e-6)


class TestSH:
    def test_shape(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        assert sh_encoding(d, 4).shape == (1, 16)

    def test_constant_term(self):
        d = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        enc = sh_encoding(d, 4)
        np.testing.assert_allclose(enc[:, 0], 0.28209479177387814, rtol=1e-6)

    def test_orthonormality(self):
        # Monte-Carlo integral of y_i * y_j over the sphere ≈ delta_ij / (4*pi)
        key = jax.random.PRNGKey(1)
        d = jax.random.normal(key, (200_000, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        enc = np.asarray(sh_encoding(d, 4))
        gram = enc.T @ enc / enc.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


class TestHashGrid:
    def test_resolutions(self):
        res = level_resolutions(16, 16, 2048)
        assert res[0] == 16 and res[-1] == 2048
        assert all(res[i] < res[i + 1] for i in range(15))

    def test_shapes_and_grad(self):
        key = jax.random.PRNGKey(0)
        table = hashgrid_init(key, 4, 2, 10)
        pos = jax.random.uniform(key, (64, 3))
        res = level_resolutions(4, 4, 32)
        out = hashgrid_encode(table, pos, res)
        assert out.shape == (64, 8)

        g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pos, res) ** 2))(table)
        assert g.shape == table.shape
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_trilinear_interpolation_exact_at_corner(self):
        # At an exact lattice point the encoding equals the table row for
        # that corner's hash (all other corner weights are 0).
        table = hashgrid_init(jax.random.PRNGKey(3), 1, 2, 8)
        res = (16,)
        pos = jnp.array([[4.0 / 16, 7.0 / 16, 2.0 / 16]])
        out = hashgrid_encode(table, pos, res)
        # replicate the hash
        h = (4 * 1 ^ 7 * 2654435761 ^ 2 * 805459861) % 256
        np.testing.assert_allclose(out[0], table[0, h], atol=1e-6)

    def test_interpolation_is_continuous(self):
        table = hashgrid_init(jax.random.PRNGKey(4), 2, 2, 8)
        res = (8, 16)
        p0 = jnp.array([[0.3, 0.4, 0.5]])
        p1 = p0 + 1e-5
        out0 = hashgrid_encode(table, p0, res)
        out1 = hashgrid_encode(table, p1, res)
        assert float(jnp.max(jnp.abs(out0 - out1))) < 1e-3


class TestMLP:
    def test_shapes(self):
        p = mlp_init(jax.random.PRNGKey(0), 8, 16, 4, 3)
        x = jnp.ones((10, 8))
        assert mlp_apply(p, x).shape == (10, 4)

    def test_matches_numpy_fp32(self):
        p = mlp_init(jax.random.PRNGKey(1), 4, 8, 2, 2)
        x = np.random.RandomState(0).randn(5, 4).astype(np.float32)
        out = mlp_apply(p, jnp.asarray(x), compute_dtype=jnp.float32)
        h = np.maximum(x @ np.asarray(p["w"][0]) + np.asarray(p["b"][0]), 0)
        ref = h @ np.asarray(p["w"][1]) + np.asarray(p["b"][1])
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestRender:
    def _brute_force_weights(self, density, deltas):
        R, S = density.shape
        w = np.zeros((R, S))
        for r in range(R):
            T = 1.0
            for s in range(S):
                alpha = 1 - np.exp(-density[r, s] * deltas[r, s])
                w[r, s] = alpha * T
                T *= 1 - alpha
        return w

    def test_weights_match_brute_force(self):
        rng = np.random.RandomState(0)
        density = rng.rand(4, 16).astype(np.float32) * 5
        deltas = rng.rand(4, 16).astype(np.float32) * 0.1
        w = render_ops.render_weights(jnp.asarray(density), jnp.asarray(deltas))
        np.testing.assert_allclose(w, self._brute_force_weights(density, deltas),
                                   rtol=2e-4, atol=1e-6)

    def test_weights_sum_below_one(self):
        density = jnp.ones((8, 32)) * 100.0
        deltas = jnp.ones((8, 32)) * 0.1
        w = render_ops.render_weights(density, deltas)
        assert float(jnp.max(jnp.sum(w, -1))) <= 1.0 + 1e-5

    def test_rgb_last_sample_background(self):
        # zero density → all weight to background = last sample colour
        w = jnp.zeros((2, 4))
        rgb = jnp.ones((2, 4, 3)) * jnp.arange(4.0)[None, :, None] / 3.0
        out = render_ops.render_rgb(w, rgb, background="last_sample")
        np.testing.assert_allclose(out, 1.0, atol=1e-6)
        out_black = render_ops.render_rgb(w, rgb, background="black")
        np.testing.assert_allclose(out_black, 0.0, atol=1e-6)

    def test_median_depth(self):
        w = jnp.array([[0.0, 0.6, 0.4, 0.0]])
        steps = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        d = render_ops.render_depth_median(w, steps)
        assert float(d[0, 0]) == pytest.approx(2.0)


class TestLosses:
    def test_bce_matches_torch(self):
        import torch
        rng = np.random.RandomState(0)
        logits = rng.randn(128).astype(np.float32) * 3
        targets = (rng.rand(128) > 0.5).astype(np.float32)
        ours = loss_ops.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
        ref = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets)).item()
        assert float(ours) == pytest.approx(ref, rel=1e-5)

    def test_distortion_matches_pairwise(self):
        rng = np.random.RandomState(1)
        sdist = np.sort(rng.rand(4, 9), axis=-1).astype(np.float32)
        w = rng.rand(4, 8).astype(np.float32) * 0.2
        ours = float(loss_ops.distortion_loss(jnp.asarray(w), jnp.asarray(sdist)))
        m = (sdist[:, 1:] + sdist[:, :-1]) / 2
        dt = sdist[:, 1:] - sdist[:, :-1]
        ref = 0.0
        for r in range(4):
            bi = np.sum(w[r][:, None] * w[r][None, :] *
                        np.abs(m[r][:, None] - m[r][None, :]))
            uni = np.sum(w[r] ** 2 * dt[r]) / 3
            ref += bi + uni
        ref /= 4
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_interlevel_zero_when_prop_covers_final(self):
        # If the proposal histogram puts *all* mass exactly where the final
        # one does, clip(w - w_outer, 0) == 0 → loss == 0.
        sdist = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
        w = jnp.ones((2, 8)) / 8
        loss = loss_ops.interlevel_loss([w, w], [sdist, sdist])
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_interlevel_positive_when_prop_misses(self):
        sdist = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
        w_final = jnp.ones((2, 8)) / 8
        w_prop = jnp.concatenate([jnp.ones((2, 4)) / 4, jnp.zeros((2, 4))], -1)
        loss = loss_ops.interlevel_loss([w_prop, w_final], [sdist, sdist])
        assert float(loss) > 1e-4


class TestMetrics:
    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.ones((8, 8, 3)) * 0.1
        assert float(metric_ops.psnr(a, b)) == pytest.approx(20.0, rel=1e-4)

    def test_ssim_identical(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(metric_ops.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_torchmetrics_if_available(self):
        try:
            from torchmetrics.functional import structural_similarity_index_measure
            import torch
        except ImportError:
            pytest.skip("torchmetrics not installed")
        rng = np.random.RandomState(0)
        a = rng.rand(1, 3, 40, 40).astype(np.float32)
        b = np.clip(a + rng.randn(1, 3, 40, 40).astype(np.float32) * 0.05, 0, 1)
        ref = structural_similarity_index_measure(
            torch.tensor(a), torch.tensor(b), data_range=1.0).item()
        ours = float(metric_ops.ssim(
            jnp.asarray(a[0].transpose(1, 2, 0)),
            jnp.asarray(b[0].transpose(1, 2, 0))))
        assert ours == pytest.approx(ref, abs=0.02)

    def test_iou(self):
        p = jnp.array([1.0, 1.0, 0.0, 0.0])
        t = jnp.array([1.0, 0.0, 1.0, 0.0])
        assert float(metric_ops.binary_iou(p, t)) == pytest.approx(1 / 3)


class TestDenseIndexing:
    def test_dense_levels_collision_free(self):
        """tcnn-mode dense levels map distinct corners to distinct rows."""
        from cropnerf_tpu.ops.hashgrid import level_uses_dense
        assert level_uses_dense(16, 2 ** 19)
        assert not level_uses_dense(2048, 2 ** 19)
        # exact lattice points of a dense level read back their own rows
        table = hashgrid_init(jax.random.PRNGKey(0), 1, 2, 19)
        res = (16,)
        side = 17
        pos = jnp.array([[4 / 16, 7 / 16, 2 / 16], [5 / 16, 7 / 16, 2 / 16]])
        out = hashgrid_encode(table, pos, res, hash_mode="auto")
        idx0 = 4 * side * side + 7 * side + 2
        idx1 = 5 * side * side + 7 * side + 2
        np.testing.assert_allclose(out[0], table[0, idx0], atol=1e-6)
        np.testing.assert_allclose(out[1], table[0, idx1], atol=1e-6)

    def test_hash_mode_override(self):
        table = hashgrid_init(jax.random.PRNGKey(1), 1, 2, 19)
        res = (16,)
        pos = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
        dense = hashgrid_encode(table, pos, res, hash_mode="auto")
        hashed = hashgrid_encode(table, pos, res, hash_mode="hash")
        assert float(jnp.abs(dense - hashed).max()) > 0  # different rows


class TestCustomVjpEncode:
    """The production encode's flat-scatter backward must be gradient-
    identical to plain autodiff of the reference implementation (the TPU
    [T,F]-scatter transpose is ~10x slower; see ops/hashgrid.py)."""

    @pytest.mark.parametrize("hash_mode", ["auto", "hash"])
    @pytest.mark.parametrize("layout", ["dense", "packed"])
    def test_grads_match_reference_autodiff(self, hash_mode, layout):
        from cropnerf_tpu.ops.hashgrid import (hashgrid_encode,
                                               hashgrid_encode_ref,
                                               hashgrid_init_packed,
                                               level_resolutions)
        res = level_resolutions(4, 4, 64)
        T = 2 ** 10
        if layout == "packed":
            table = hashgrid_init_packed(jax.random.PRNGKey(0), res, 2, 10,
                                         hash_mode=hash_mode)
        else:
            table = hashgrid_init(jax.random.PRNGKey(0), 4, 2, 10)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                                 minval=0.01, maxval=0.99)
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 8))

        def loss(fn, t, p):
            return jnp.sum(fn(t, p, res, hash_mode, T) * w)

        out_opt = hashgrid_encode(table, pos, res, hash_mode, T)
        out_ref = hashgrid_encode_ref(table, pos, res, hash_mode, T)
        np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_ref),
                                   atol=1e-6)
        gt_o, gp_o = jax.grad(lambda t, p: loss(hashgrid_encode, t, p),
                              argnums=(0, 1))(table, pos)
        gt_r, gp_r = jax.grad(lambda t, p: loss(hashgrid_encode_ref, t, p),
                              argnums=(0, 1))(table, pos)
        np.testing.assert_allclose(np.asarray(gt_o), np.asarray(gt_r),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gp_o), np.asarray(gp_r),
                                   atol=1e-4, rtol=1e-3)


class TestPackedLayout:
    """Packed [sum(rows_l), F] layout (tcnn allocation parity): per-level
    rows = min(T, (res+1)^3)."""

    def test_row_counts(self):
        from cropnerf_tpu.ops.hashgrid import (level_resolutions,
                                               level_row_counts)
        res = level_resolutions(16, 16, 2048)
        rows = level_row_counts(res, 2 ** 19)
        # coarse levels collision-free, fine levels full table
        assert rows[0] == 17 ** 3
        assert rows[-1] == 2 ** 19
        assert sum(rows) < 16 * 2 ** 19          # the 27% saving exists

    def test_packed_matches_dense_slices(self):
        """A packed table built from the dense layout's leading rows encodes
        identically (same indexing math, different storage)."""
        from cropnerf_tpu.ops.hashgrid import (level_resolutions,
                                               level_row_counts)
        T = 2 ** 12
        res = level_resolutions(4, 4, 64)
        dense_table = hashgrid_init(jax.random.PRNGKey(0), 4, 2, 12)
        rows = level_row_counts(res, T)
        packed = jnp.concatenate(
            [dense_table[l, :rows[l]] for l in range(4)], axis=0)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        a = hashgrid_encode(dense_table, pos, res)
        b = hashgrid_encode(packed, pos, res, table_size=T)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_packed_grad_flows(self):
        from cropnerf_tpu.ops.hashgrid import (hashgrid_init_packed,
                                               level_resolutions)
        res = level_resolutions(3, 4, 16)
        table = hashgrid_init_packed(jax.random.PRNGKey(0), res, 2, 10)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
        g = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, pos, res, table_size=2 ** 10) ** 2))(table)
        assert g.shape == table.shape
        assert float(jnp.abs(g).sum()) > 0

    def test_field_init_packed_by_default(self):
        from cropnerf_tpu.models.config import FieldConfig, HashGridConfig
        from cropnerf_tpu.models.field import field_init
        cfg = FieldConfig(grid=HashGridConfig(num_levels=4,
                                              log2_hashmap_size=10,
                                              max_res=64))
        params = field_init(jax.random.PRNGKey(0), cfg, num_images=2)
        assert params["grid"].ndim == 2
        cfg_d = FieldConfig(grid=HashGridConfig(num_levels=4,
                                                log2_hashmap_size=10,
                                                max_res=64, layout="dense"))
        params_d = field_init(jax.random.PRNGKey(0), cfg_d, num_images=2)
        assert params_d["grid"].shape == (4, 1024, 2)


def test_outer_measure_sum_form_matches_max_of_cumsum():
    """The linear masked-SUM form of _outer_measure (ops/losses.py) must
    reproduce the canonical searchsorted/gather semantics of mipnerf360's
    ``outer`` (values AND grads wrt the env weights), including ties and
    non-overlapping edge cases.

    The oracle is the gather form from the derivation comment in
    ops/losses.py: prefix sums of y1 indexed at searchsorted cut points.
    (An earlier max-of-cumsum oracle had ambiguous subgradients at
    zero-weight ties — jnp.max tie-routing — which is NOT the searchsorted
    semantics; the gather form is deterministic at ties.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cropnerf_tpu.ops import losses as loss_ops

    def outer_ref(t0s, t0e, t1s, t1e, y1):
        M = y1.shape[-1]
        cy1 = jnp.concatenate(
            [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
        count = jax.vmap(
            lambda a, v: jnp.searchsorted(a, v, side="right"))
        idx_lo = jnp.maximum(count(t1s, t0s) - 1, 0)
        idx_hi = jnp.clip(count(t1e, t0e), 0, M - 1) + 1
        cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
        cy1_hi = jnp.take_along_axis(cy1, idx_hi, axis=-1)
        return cy1_hi - cy1_lo

    rng = np.random.RandomState(0)
    for trial in range(6):
        R, N, M = 7, 9, 13
        # contiguous ascending bins; trial 3+ adds ties (repeated edges)
        t1 = np.sort(rng.rand(R, M + 1), axis=-1)
        t0 = np.sort(rng.rand(R, N + 1), axis=-1)
        if trial >= 3:
            t1[:, 3] = t1[:, 4]
            t0[:, 2] = t1[:, 3]                 # query edge == env edge
        y1 = rng.rand(R, M).astype(np.float32)
        if trial >= 4:
            y1[:, :5] = 0.0                     # zero-weight ties in cy1
        args = [jnp.asarray(a.astype(np.float32)) for a in
                (t0[:, :-1], t0[:, 1:], t1[:, :-1], t1[:, 1:])]

        got, g_got = jax.value_and_grad(
            lambda y: jnp.sum(jnp.sin(
                loss_ops._outer_measure(*args, y) * 3.0)))(jnp.asarray(y1))
        ref, g_ref = jax.value_and_grad(
            lambda y: jnp.sum(jnp.sin(
                outer_ref(*args, y) * 3.0)))(jnp.asarray(y1))
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5,
                                   err_msg=f"trial {trial}")
        # atol 1e-4: the masked-sum form and the cumsum oracle reassociate
        # f32 additions differently (observed max dev ~2e-5).
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=1e-4, err_msg=f"trial {trial}")


class TestCellPack:
    """Cell-packed dense-level encode (ops/hashgrid.py _dense_cell_view):
    must be value- and gradient-identical to the generic corner-gather path
    on mixed dense+hashed level stacks, in both table layouts."""

    def _check(self, layout):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from cropnerf_tpu.ops.hashgrid import (hashgrid_encode,
                                               hashgrid_init,
                                               hashgrid_init_packed,
                                               level_resolutions,
                                               level_uses_dense)
        T_LOG2 = 12                       # 4096 rows
        res = level_resolutions(4, 4, 64)  # 4, 10, 25, 64
        dense_flags = [level_uses_dense(r, 2 ** T_LOG2) for r in res]
        assert True in dense_flags and False in dense_flags, dense_flags
        key = jax.random.PRNGKey(0)
        table = (hashgrid_init_packed(key, res, 2, T_LOG2)
                 if layout == "packed"
                 else hashgrid_init(key, 4, 2, T_LOG2))
        pos = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
        # include exact-edge positions (pos == 1.0 hits the clip path)
        pos = jnp.concatenate([pos, jnp.ones((3, 3)), jnp.zeros((3, 3))])

        def loss(table, pos, cp):
            out = hashgrid_encode(table, pos, res, table_size=2 ** T_LOG2,
                                  cell_pack=cp)
            return jnp.sum(jnp.sin(out * 7.0)), out

        (l0, o0), g0 = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(table, pos, False)
        (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(table, pos, True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=1e-6, atol=1e-7)
        for a, b in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_packed_layout(self):
        self._check("packed")

    def test_dense_layout(self):
        self._check("dense")

    def test_all_hashed_stack_unaffected(self):
        """hash_mode='hash' has no dense levels — cell_pack must no-op."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from cropnerf_tpu.ops.hashgrid import (hashgrid_encode, hashgrid_init,
                                               level_resolutions)
        res = level_resolutions(3, 4, 32)
        table = hashgrid_init(jax.random.PRNGKey(0), 3, 2, 10)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        a = hashgrid_encode(table, pos, res, hash_mode="hash",
                            cell_pack=True)
        b = hashgrid_encode(table, pos, res, hash_mode="hash",
                            cell_pack=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
