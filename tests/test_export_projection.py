"""Export + projection stage tests (tiny model, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cropnerf_tpu.export.volume import (orthographic_ray_grid, sample_volume,
                                        unscale_points)
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.models.model import model_init
from cropnerf_tpu.projection.project import (ClusterProjector,
                                             _bucket,
                                             _project_aabb_to_crop)

from synthetic import ring_cameras

CFG = PRESETS["cropnerf-tiny"]


class TestOrthographicGrid:
    def test_grid_covers_face(self):
        aabb = np.array([[-1.0, -2, 0], [1, 2, 1]])
        origins, direction, far = orthographic_ray_grid(aabb, 8, axis=2)
        np.testing.assert_allclose(direction, [0, 0, 1])
        assert far == pytest.approx(1.0)
        assert origins[:, 2].max() == pytest.approx(0.0)
        assert origins[:, 0].min() == pytest.approx(-1.0)
        assert origins[:, 1].max() == pytest.approx(2.0)

    def test_aspect_scaled_counts(self):
        aabb = np.array([[0.0, 0, 0], [2, 1, 1]])
        origins, _, _ = orthographic_ray_grid(aabb, 10, axis=2)
        # x extent 2, z extent 1 → 20 x-points; y extent 1 → 10
        assert origins.shape[0] == 20 * 10

    def test_unscale(self):
        pts = np.ones((4, 3))
        out = unscale_points(pts, dataparser_scale=0.5)
        np.testing.assert_allclose(out, 4.0)   # × 2/scale


class TestSampleVolume:
    def test_runs_and_filters(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        aabb = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        clouds = sample_volume(params, CFG.model, aabb,
                               num_points_per_side=8, rays_per_batch=16,
                               num_samples=8)
        assert set(clouds) == {"semantic", "semantic_colormap", "density"}
        for c in clouds.values():
            assert c.points.shape[1] == 3
            assert len(c.colors) == len(c.points) == len(c.alpha)

    def test_low_thresholds_keep_points(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        aabb = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        clouds = sample_volume(params, CFG.model, aabb,
                               num_points_per_side=8, rays_per_batch=16,
                               num_samples=8,
                               semantic_threshold=-100.0,
                               density_threshold=0.0,
                               colormap_threshold=0.0)
        # with no thresholds every sampled point survives
        assert len(clouds["density"].points) > 0
        assert len(clouds["semantic"].points) > 0
        # all inside the AABB
        pts = clouds["density"].points
        assert (pts >= aabb[0] - 1e-4).all() and (pts <= aabb[1] + 1e-4).all()

    def test_budget_overflow_fallback_is_exact(self):
        """Tiny per-chunk / global budgets force the dense fallback for
        every chunk; the resulting clouds must match the default-budget run
        point-for-point (same seed → same stratified noise)."""
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        aabb = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        kw = dict(num_points_per_side=8, rays_per_batch=16, num_samples=8,
                  semantic_threshold=-100.0, density_threshold=0.0,
                  colormap_threshold=0.0, seed=3)
        ref = sample_volume(params, CFG.model, aabb, **kw)
        # max_points_per_batch < rays*samples → every chunk overflows K;
        # also squeeze the global buffer to exercise the G bound
        tiny = sample_volume(params, CFG.model, aabb,
                             max_points_per_batch=4, max_total_points=4, **kw)
        for name in ref:
            r, t = ref[name], tiny[name]
            assert r.points.shape == t.points.shape
            # fallback appends per-chunk, so row ORDER matches the scan's
            np.testing.assert_allclose(t.points, r.points, rtol=1e-6)
            np.testing.assert_allclose(t.alpha, r.alpha, rtol=1e-6)


    def test_mixed_budget_exact(self):
        """Accepted and rejected chunks interleaved, plus mid-run global-
        buffer (G) saturation: the write-pointer / dump-zone interaction must
        still yield the exact point set of the unbudgeted run.  (The
        all-reject case above never exercises an accepted chunk next to a
        rejected one, which is where a garbage-row or double-count bug in
        the scan would hide.)  Budget paths reorder rows (fallback chunks
        append last), so compare as sets."""
        import jax.numpy as jnp

        from cropnerf_tpu.export.volume import orthographic_ray_grid

        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        aabb = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        B, S, n_side, seed = 16, 8, 8, 3

        origins, dir_np, far = orthographic_ray_grid(aabb, n_side)
        geom = (jnp.asarray(aabb), jnp.asarray(dir_np), jnp.float32(far))
        key = jax.random.PRNGKey(seed)
        n_chunks = origins.shape[0] // B

        kw = dict(num_points_per_side=n_side, rays_per_batch=B,
                  num_samples=S, semantic_threshold=-100.0,
                  colormap_threshold=0.0, seed=seed)
        ref = sample_volume(params, CFG.model, aabb,
                            density_threshold=0.0, **kw)

        # per-chunk densities via the same per-chunk fold_in keys the scan
        # uses, so thresholds derived here match the scan's survivor counts
        from cropnerf_tpu.models.model import forward_export
        from cropnerf_tpu.core.rays import RayBundle
        dens = []
        for c in range(n_chunks):
            o = jnp.asarray(origins[c * B:(c + 1) * B])
            rb = RayBundle(
                origins=o,
                directions=jnp.broadcast_to(geom[1], o.shape),
                nears=jnp.zeros((B,)), fars=jnp.broadcast_to(geom[2], (B,)),
                camera_idx=jnp.zeros((B,), jnp.int32))
            dens.append(np.asarray(jax.device_get(forward_export(
                params, rb, CFG.model, S, geom[0],
                key=jax.random.fold_in(key, c))["density"])).reshape(-1))
        # pick a density threshold where per-chunk survivor counts DIFFER
        # (fixture guard: a mixed accept/reject split must be possible)
        all_d = np.concatenate(dens)
        for q in (0.5, 0.3, 0.7, 0.6, 0.4):
            dthr = float(np.quantile(all_d, q))
            counts = [int((d >= dthr).sum()) for d in dens]
            if min(counts) < max(counts):
                break
        assert min(counts) < max(counts), counts
        K = (min(counts) + max(counts) + 1) // 2   # strictly splits chunks

        ref_mid = sample_volume(params, CFG.model, aabb,
                                density_threshold=dthr, **kw)

        def _as_set(cloud):
            rows = np.concatenate(
                [cloud.points, cloud.alpha[:, None]], axis=1)
            return rows[np.lexsort(rows.T)]

        # (a) mixed accept/reject via K
        mixed = sample_volume(params, CFG.model, aabb, density_threshold=dthr,
                              max_points_per_batch=K, **kw)
        # (b) G saturates mid-run: first accepted chunk fits, then ptr+K>G
        g_sat = sample_volume(params, CFG.model, aabb, density_threshold=dthr,
                              max_points_per_batch=K,
                              max_total_points=K + min(counts), **kw)
        for variant in (mixed, g_sat):
            for name in ref_mid:
                np.testing.assert_allclose(
                    _as_set(variant[name]), _as_set(ref_mid[name]), rtol=1e-6)
        # sanity: the unbudgeted ref at threshold 0 has strictly more points
        assert len(ref["density"].points) > len(ref_mid["density"].points)


class TestProjection:
    def test_bucket(self):
        assert _bucket(1) == 128
        assert _bucket(128) == 128
        assert _bucket(129) == 256

    def test_bucket_ladder_properties(self):
        """Static geometric ladder: covers n, 128-multiples, bounded
        padding waste (<= 50%), monotone."""
        from cropnerf_tpu.projection.project import _BUCKET_LADDER
        prev = 0
        for n in range(1, 140_000, 997):
            b = _bucket(n)
            assert b >= n and b % 128 == 0
            if n > 128:
                assert b < 2 * n            # waste bounded at 50% of rays
            assert b >= prev or n <= 131072
            prev = b if n <= 131072 else prev
        # ladder values themselves map to themselves
        for v in _BUCKET_LADDER:
            assert _bucket(v) == v

    def test_crop_projection_contains_aabb(self):
        cams = ring_cameras(n=2, height=64, width=64, focal=80.0)
        aabb = np.array([[-0.2, -0.2, -0.2], [0.2, 0.2, 0.2]], np.float32)
        crop = _project_aabb_to_crop(cams, 0, aabb, 64, 64)
        assert crop is not None
        x0, y0, x1, y1 = crop
        assert 0 <= x0 < x1 <= 64 and 0 <= y0 < y1 <= 64
        # box at origin viewed from a ring camera → crop near image center
        assert x0 < 32 < x1 and y0 < 32 < y1

    def test_crop_none_behind_camera(self):
        cams = ring_cameras(n=2, height=64, width=64, focal=80.0)
        # box far behind the first camera (camera at radius 1.2 looks at
        # origin → behind is along +eye direction)
        aabb = np.array([[2.4, -0.1, 0.2], [2.8, 0.1, 0.5]], np.float32)
        crop = _project_aabb_to_crop(cams, 0, aabb, 64, 64)
        assert crop is None

    def test_batched_matches_single(self):
        """iter_projections batches jobs per dispatch (incl. padding of the
        last partial batch); results must equal per-job project() calls."""
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=32, width=32, focal=40.0)
        boxes = [
            np.array([[-0.2, -0.2, -0.2], [0.2, 0.2, 0.2]], np.float32),
            np.array([[0.0, 0.0, 0.0], [0.15, 0.15, 0.15]], np.float32),
            # behind-ish / off-frame box exercises the crop=None path
            np.array([[2.4, -0.1, 0.2], [2.8, 0.1, 0.5]], np.float32),
        ]
        jobs = [(c, b) for c in range(2) for b in boxes]
        # small dispatch budget → at least one bucket gets J>1 batching
        # with a padded final batch
        proj = ClusterProjector(params, CFG.model, cams, 32, 32,
                                rays_per_dispatch=2048)
        got = {}
        for idx, wo_occ, visible in proj.iter_projections(jobs):
            assert idx not in got
            got[idx] = (wo_occ, visible)
        assert len(got) == len(jobs)
        single = ClusterProjector(params, CFG.model, cams, 32, 32)
        for idx, (c, b) in enumerate(jobs):
            ref_wo, ref_vis = single.project(c, b)
            np.testing.assert_allclose(got[idx][0], ref_wo, atol=1e-5)
            np.testing.assert_allclose(got[idx][1], ref_vis, atol=1e-5)

    def test_precompile_matches_rendered_programs(self):
        """precompile(jobs) must warm EXACTLY the (n, J) set
        iter_projections(jobs) dispatches — the shared _plan pass is the
        guarantee; this pins it against drift."""
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=32, width=32, focal=40.0)
        boxes = [
            np.array([[-0.2, -0.2, -0.2], [0.2, 0.2, 0.2]], np.float32),
            np.array([[0.0, 0.0, 0.0], [0.15, 0.15, 0.15]], np.float32),
            np.array([[2.4, -0.1, 0.2], [2.8, 0.1, 0.5]], np.float32),
        ]
        jobs = [(c, b) for c in range(2) for b in boxes]
        warm = ClusterProjector(params, CFG.model, cams, 32, 32,
                                rays_per_dispatch=2048)
        n_programs = warm.precompile(jobs)
        warmed = set(warm._fns)
        assert n_programs == len(warmed) > 0
        for _ in warm.iter_projections(jobs):
            pass
        assert set(warm._fns) == warmed      # no new compiles at render

    def test_run_projections_rejects_short_label_list(self, tmp_path):
        """An empty/short label list must fail loudly up front, not with an
        IndexError deep inside the camera loop (found by the verify drive:
        an empty --label-dir glob produced label_paths=[])."""
        import pytest

        from cropnerf_tpu.projection.project import run_projections
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=16, width=16, focal=20.0)
        info = np.array([{"aabb": np.zeros((0, 2, 3), np.float32)}])
        with pytest.raises(ValueError, match="one label image per camera"):
            run_projections(params, CFG.model, cams, 16, 16, info,
                            tmp_path, label_paths=[])

    def test_projector_images(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=48, width=48, focal=60.0)
        proj = ClusterProjector(params, CFG.model, cams, 48, 48)
        aabb = np.array([[-0.2, -0.2, -0.2], [0.2, 0.2, 0.2]], np.float32)
        wo_occ, visible = proj.project(0, aabb)
        assert wo_occ.shape == (48, 48) and visible.shape == (48, 48)
        assert np.isfinite(wo_occ).all() and np.isfinite(visible).all()
        assert wo_occ.min() >= 0 and wo_occ.max() <= 1
        # visibility can only remove mass
        assert (visible <= wo_occ + 1e-6).all()


class TestMeshShardedPaths:
    """Sharded export/render must reproduce single-device results on the
    8-device virtual mesh (VERDICT r3 item 5 — BASELINE.md's north star
    counts train AND render rays/s)."""

    def _mesh(self):
        return jax.sharding.Mesh(np.array(jax.devices()), ("data",))

    def test_sharded_export_matches_single_device(self):
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        aabb = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        kw = dict(num_points_per_side=16, rays_per_batch=32, num_samples=8,
                  semantic_threshold=-100.0, density_threshold=0.0,
                  colormap_threshold=0.0, seed=3)
        ref = sample_volume(params, CFG.model, aabb, **kw)
        shd = sample_volume(params, CFG.model, aabb, mesh=self._mesh(), **kw)
        for name in ref:
            r, s = ref[name], shd[name]
            assert r.points.shape == s.points.shape
            # rows are grouped by device in the sharded run → compare as
            # sorted sets of (point, alpha) rows
            ra = np.concatenate([r.points, r.alpha[:, None]], 1)
            sa = np.concatenate([s.points, s.alpha[:, None]], 1)
            ra = ra[np.lexsort(ra.T)]
            sa = sa[np.lexsort(sa.T)]
            np.testing.assert_allclose(sa, ra, rtol=1e-6, atol=1e-7)

    def test_sharded_export_chunkcount_not_divisible(self):
        """Chunk count not divisible by the mesh: dummy padding chunks must
        contribute zero points."""
        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        aabb = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        # 10x10 grid at B=16 → 7 chunks (pad to 8 over the mesh)
        kw = dict(num_points_per_side=10, rays_per_batch=16, num_samples=8,
                  semantic_threshold=-100.0, density_threshold=0.0,
                  colormap_threshold=0.0, seed=0)
        ref = sample_volume(params, CFG.model, aabb, **kw)
        shd = sample_volume(params, CFG.model, aabb, mesh=self._mesh(), **kw)
        assert ref["density"].points.shape == shd["density"].points.shape

    def test_sharded_render_matches_single_device(self):
        from cropnerf_tpu.train.step import make_render_fn

        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=24, width=24, focal=30.0)
        r1 = make_render_fn(CFG)(params, cams, jnp.int32(0), 24, 24)
        r2 = make_render_fn(CFG, mesh=self._mesh())(
            params, cams, jnp.int32(0), 24, 24)
        for k in r1:
            np.testing.assert_allclose(np.asarray(r2[k]), np.asarray(r1[k]),
                                       rtol=1e-5, atol=1e-6)

    def test_sharded_projector_matches_single_device(self):
        """ClusterProjector(mesh=): per-dispatch ray batches shard over the
        data mesh; outputs must match single-device bit-for-bit."""
        from cropnerf_tpu.projection.project import ClusterProjector

        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=3, height=40, width=40, focal=50.0)
        aabb = np.array([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]], np.float32)
        jobs = [(c, aabb) for c in range(3)]
        ref = ClusterProjector(params, CFG.model, cams, 40, 40)
        shd = ClusterProjector(params, CFG.model, cams, 40, 40,
                               mesh=self._mesh())
        ref_out = {i: (w, v) for i, w, v in ref.iter_projections(jobs)}
        shd_out = {i: (w, v) for i, w, v in shd.iter_projections(jobs)}
        assert set(ref_out) == set(shd_out) == {0, 1, 2}
        for i in ref_out:
            np.testing.assert_allclose(shd_out[i][0], ref_out[i][0],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(shd_out[i][1], ref_out[i][1],
                                       rtol=1e-5, atol=1e-6)

    def test_sharded_depth_pointcloud_matches_single_device(self):
        from cropnerf_tpu.data.databank import build_pixel_bank
        from cropnerf_tpu.export.pointcloud import generate_point_cloud

        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=24, width=24, focal=30.0)
        rng = np.random.RandomState(0)
        images = rng.randint(0, 255, (2, 24, 24, 3), np.uint8)
        masks = rng.randint(0, 2, (2, 24, 24)).astype(np.uint8)
        bank = build_pixel_bank(images, masks, cams)
        kw = dict(num_points=500, rays_per_batch=256, only_semantics=False,
                  accumulation_threshold=0.0, remove_outliers=False,
                  max_batches=2, seed=1)
        p1, c1 = generate_point_cloud(params, CFG.model, bank, **kw)
        p2, c2 = generate_point_cloud(params, CFG.model, bank,
                                      mesh=self._mesh(), **kw)
        np.testing.assert_allclose(p2, p1, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-6)


class TestProjectorSamplesBudget:
    def test_oversized_crop_segments_match_unsegmented(self):
        """A tiny samples budget forces the segmented oversized-crop path;
        outputs must match the one-dispatch render exactly (the budget is
        a memory knob, never a semantics knob)."""
        from cropnerf_tpu.projection.project import ClusterProjector

        params = model_init(jax.random.PRNGKey(0), CFG.model, num_images=2)
        cams = ring_cameras(n=2, height=48, width=48, focal=40.0)
        aabb = np.array([[-0.6, -0.6, -0.6], [0.6, 0.6, 0.6]], np.float32)
        jobs = [(0, aabb), (1, aabb)]
        ref = ClusterProjector(params, CFG.model, cams, 48, 48)
        assert ref.max_rays_per_job >= 48 * 48    # big enough: one dispatch
        # budget of 256 rays x samples → every crop is oversized
        spr = (CFG.model.num_nerf_samples_per_ray
               + sum(CFG.model.num_proposal_samples_per_ray))
        seg = ClusterProjector(params, CFG.model, cams, 48, 48,
                               max_samples_per_dispatch=256 * spr)
        assert seg.max_rays_per_job == 256
        ref_out = {i: (w, v) for i, w, v in ref.iter_projections(jobs)}
        seg_out = {i: (w, v) for i, w, v in seg.iter_projections(jobs)}
        for i in ref_out:
            np.testing.assert_allclose(seg_out[i][0], ref_out[i][0],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(seg_out[i][1], ref_out[i][1],
                                       rtol=1e-5, atol=1e-6)
