"""Counting-stage tests with synthetic clusters of known count
(SURVEY §4 test-strategy item (e))."""
from pathlib import Path

import numpy as np
import pytest

from cropnerf_tpu.counting import clustering
from cropnerf_tpu.counting.graph import asyn_lpa_communities, partition
from cropnerf_tpu.counting.merger import (MergerConfig, calc_affinity,
                                          count_instances,
                                          process_super_cluster)
from cropnerf_tpu.counting.segmenter import (build_super_cluster_info,
                                             get_super_clusters)
from cropnerf_tpu.export.ply import read_ply, write_ply


def blobs(centers, n=200, scale=0.01, seed=0):
    rng = np.random.RandomState(seed)
    return np.concatenate([
        c + rng.randn(n, 3) * scale for c in np.asarray(centers, np.float32)
    ]).astype(np.float32)


class TestClustering:
    def test_voxel_downsample(self):
        pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1.0, 1, 1]], np.float32)
        out = clustering.voxel_downsample(pts, 0.1)
        assert out.shape[0] == 2

    def test_dbscan_finds_blobs(self):
        pts = blobs([[0, 0, 0], [1, 1, 1], [2, 0, 0]])
        labels = clustering.dbscan(pts, eps=0.1, min_points=10)
        assert len(set(labels[labels >= 0])) == 3

    def test_outlier_removal(self):
        pts = blobs([[0, 0, 0]], n=300)
        pts = np.concatenate([pts, [[5.0, 5, 5]]]).astype(np.float32)
        keep = clustering.statistical_outlier_removal(pts, 20, 2.0)
        assert len(pts) - 1 not in keep      # the far outlier is dropped

    def test_kmeans(self):
        pts = blobs([[0, 0, 0], [1, 0, 0]])
        labels = clustering.kmeans(pts, 2)
        # each blob should be (almost) pure
        first = labels[:200]
        assert (first == np.bincount(first).argmax()).mean() > 0.95

    def test_aabb(self):
        pts = np.array([[0.0, 1, 2], [3, 4, 5]], np.float32)
        box = clustering.aabb(pts)
        np.testing.assert_allclose(box, [[0, 1, 2], [3, 4, 5]])


class TestSegmenter:
    def test_super_clusters(self):
        pts = blobs([[0, 0, 0], [0.5, 0, 0]], n=500, scale=0.003)
        out_pts, labels = get_super_clusters(pts, vx_size=1e-3)
        assert len(set(labels)) == 2

    def test_build_info_structure(self):
        pts = blobs([[0, 0, 0], [0.5, 0, 0]], n=500, scale=0.003)
        info = build_super_cluster_info(pts, k=2, vx_size=1e-3)
        assert len(info) == 2
        assert info[0]["aabb"].shape == (2, 2, 3)
        assert set(info[0]["pcd"].keys()) == {0, 1}
        # size-sorted: first supercluster at least as large as second
        n0 = sum(len(p) for p in info[0]["pcd"].values())
        n1 = sum(len(p) for p in info[1]["pcd"].values())
        assert n0 >= n1


class TestGraphPartition:
    def test_clique_merges_positive_pairs(self):
        aff = np.array([[0, 5, 0], [5, 0, 0], [0, 0, 0]], float)
        n, labels = partition(aff, "clique")
        assert n == 2
        assert labels[0] == labels[1] != labels[2]

    def test_clique_fully_connected(self):
        aff = np.ones((4, 4)) - np.eye(4)
        n, _ = partition(aff, "clique")
        assert n == 1

    def test_bridge_removes_bridges(self):
        # two triangles connected by one bridge edge → 2 components
        aff = np.zeros((6, 6))
        for a, b in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]:
            aff[a, b] = aff[b, a] = 1
        n, labels = partition(aff, "bridge")
        assert n == 2

    def test_community_lpa(self):
        # two dense groups weakly connected
        aff = np.zeros((6, 6))
        for a, b in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]:
            aff[a, b] = aff[b, a] = 5.0
        aff[2, 3] = aff[3, 2] = 0.1
        n, labels = partition(aff, "community", seed=0)
        assert n == 2
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] == labels[4] == labels[5]

    def test_lpa_isolated_nodes_keep_own_label(self):
        import networkx as nx
        G = nx.Graph()
        G.add_nodes_from([0, 1])
        coms = asyn_lpa_communities(G, seed=0)
        assert len(coms) == 2


class TestMergerScoring:
    def _make_projection_tree(self, root: Path, n_cams=3, n_sub=2,
                              same_instance=True):
        """Synthesise projections: every subcluster projects to a bright
        circle; GT label image gives both circles the same instance label
        (→ should merge) or different labels (→ should stay separate)."""
        import cv2
        H = W = 120
        for c in range(n_cams):
            cam_dir = root / f"cam_{c}"
            cam_dir.mkdir(parents=True, exist_ok=True)
            label_img = np.zeros((H, W), np.uint8)
            for i in range(n_sub):
                center = (30 + 25 * i, 60)
                img = np.zeros((H, W), np.uint8)
                cv2.circle(img, center, 14, 255, -1)
                cv2.imwrite(str(cam_dir / f"wo_occ_cluster_{i}.png"), img)
                cv2.imwrite(str(cam_dir / f"visible_cluster_{i}.png"), img)
                label = 1 if same_instance else 1 + i
                cv2.circle(label_img, center, 16, label, -1)
            cv2.imwrite(str(cam_dir / "label_frame_0000.png"), label_img)

    def test_same_instance_merges(self, tmp_path):
        self._make_projection_tree(tmp_path / "super_cluster_0",
                                   same_instance=True)
        cfg = MergerConfig(frame_sampling_interval=1)
        props = process_super_cluster(tmp_path / "super_cluster_0", 2, cfg)
        aff = calc_affinity(props)
        assert aff[0, 1] > 0
        n, _ = partition(aff, "clique")
        assert n == 1

    def test_different_instances_stay_separate(self, tmp_path):
        self._make_projection_tree(tmp_path / "super_cluster_0",
                                   same_instance=False)
        cfg = MergerConfig(frame_sampling_interval=1)
        props = process_super_cluster(tmp_path / "super_cluster_0", 2, cfg)
        aff = calc_affinity(props)
        assert aff[0, 1] < 0
        n, _ = partition(aff, "clique")
        assert n == 2

    def test_count_instances_end_to_end(self, tmp_path):
        # supercluster 0: both subclusters one instance → 1
        # supercluster 1: two instances → 2.  Total = 3.
        self._make_projection_tree(tmp_path / "super_cluster_0",
                                   same_instance=True)
        self._make_projection_tree(tmp_path / "super_cluster_1",
                                   same_instance=False)
        info = np.array([
            {"aabb": np.zeros((2, 2, 3)),
             "pcd": {0: np.zeros((4, 3)), 1: np.zeros((4, 3))}},
            {"aabb": np.zeros((2, 2, 3)),
             "pcd": {0: np.zeros((4, 3)), 1: np.zeros((4, 3))}},
        ], dtype=object)
        cfg = MergerConfig(frame_sampling_interval=1)
        result = count_instances(tmp_path, info, cfg)
        assert result.total_count == 3
        assert result.per_super_cluster == [1, 2]
        # global labels unique across superclusters
        all_labels = np.concatenate(result.labels)
        assert len(set(all_labels)) == 3
        # single-supercluster debug mode (≙ merger.py --super_cluster_idx):
        # counts only the selected cluster
        for idx, expect in ((0, 1), (1, 2)):
            r1 = count_instances(
                tmp_path, info,
                MergerConfig(frame_sampling_interval=1,
                             super_cluster_idx=idx))
            assert r1.per_super_cluster == [expect]
            assert r1.total_count == expect
        with pytest.raises(ValueError):
            count_instances(tmp_path, info,
                            MergerConfig(frame_sampling_interval=1,
                                         super_cluster_idx=5))


class TestScaleFactorAndOverlays:
    """copy_with_scaling + overlay artifacts (≙ merger.py:145-189): labels at
    full resolution, projections at NeRF training resolution."""

    def _make_tree_with_fullres_labels(self, root: Path, n_cams=2):
        """Projections 120x120; GT labels 240x240 (2x) both in the cam dirs
        (stale, mismatched — what a real-data run hits) and in a separate
        SegmentationLabel dir."""
        import cv2
        H = W = 120
        label_dir = root.parent / "labels"
        label_dir.mkdir(parents=True, exist_ok=True)
        for c in range(n_cams):
            cam_dir = root / f"cam_{c}"
            cam_dir.mkdir(parents=True, exist_ok=True)
            label_full = np.zeros((2 * H, 2 * W), np.uint8)
            for i in range(2):
                center = (30 + 25 * i, 60)
                img = np.zeros((H, W), np.uint8)
                cv2.circle(img, center, 14, 255, -1)
                cv2.imwrite(str(cam_dir / f"wo_occ_cluster_{i}.png"), img)
                cv2.imwrite(str(cam_dir / f"visible_cluster_{i}.png"), img)
                cv2.circle(label_full, (2 * center[0], 2 * center[1]),
                           32, 1 + i, -1)
            name = f"frame_{c:04d}.png"
            cv2.imwrite(str(label_dir / f"label_{name}"), label_full)
            cv2.imwrite(str(cam_dir / f"label_{name}"), label_full)
        return label_dir

    def test_copy_with_scaling_preserves_label_ids(self, tmp_path):
        import cv2
        from cropnerf_tpu.counting.merger import copy_with_scaling
        lab = np.zeros((100, 80), np.uint8)
        cv2.circle(lab, (40, 50), 20, 7, -1)
        cv2.imwrite(str(tmp_path / "a.png"), lab)
        copy_with_scaling(tmp_path / "a.png", tmp_path / "b.png", 0.5)
        out = cv2.imread(str(tmp_path / "b.png"), cv2.IMREAD_GRAYSCALE)
        assert out.shape == (50, 40)
        assert set(np.unique(out).tolist()) == {0, 7}  # NN: no invented ids

    def test_scale_factor_fixes_mismatched_resolutions(self, tmp_path):
        from cropnerf_tpu.counting.merger import prepare_camera_labels
        sc = tmp_path / "super_cluster_0"
        label_dir = self._make_tree_with_fullres_labels(sc)
        cfg = MergerConfig(frame_sampling_interval=1, scale_factor=0.5,
                           label_dir=label_dir, make_overlays=True)
        prepare_camera_labels(sc, cfg)
        props = process_super_cluster(sc, 2, cfg)
        aff = calc_affinity(props)
        # two different instance labels, properly aligned → negative affinity
        assert aff[0, 1] < 0
        n, _ = partition(aff, "clique")
        assert n == 2
        # overlay debug tree appeared, one per camera
        overlays = sorted((sc / "overlay").glob("label_*.png"))
        assert len(overlays) == 2
        # idempotence: second call is a no-op (overlay/ exists, ≙ :392-393)
        prepare_camera_labels(sc, cfg)

    def test_mismatched_label_without_scaling_is_padded_not_crash(
            self, tmp_path):
        sc = tmp_path / "super_cluster_0"
        self._make_tree_with_fullres_labels(sc)
        cfg = MergerConfig(frame_sampling_interval=1)
        props = process_super_cluster(sc, 2, cfg)  # must not raise
        assert set(props) == {0, 1}

    def test_count_cli_scale_factor(self, tmp_path):
        """count_instances end-to-end with label refresh + overlays."""
        sc = tmp_path / "proj" / "super_cluster_0"
        label_dir = self._make_tree_with_fullres_labels(sc)
        info = np.array([
            {"aabb": np.zeros((2, 2, 3)),
             "pcd": {0: np.zeros((4, 3)), 1: np.zeros((4, 3))}},
        ], dtype=object)
        cfg = MergerConfig(frame_sampling_interval=1, scale_factor=0.5,
                           label_dir=label_dir, make_overlays=True)
        result = count_instances(tmp_path / "proj", info, cfg)
        assert result.total_count == 2
        assert (sc / "overlay").exists()


class TestPly:
    def test_roundtrip(self, tmp_path):
        pts = np.random.RandomState(0).rand(50, 3).astype(np.float32)
        cols = (np.random.RandomState(1).rand(50, 3) * 255).astype(np.uint8)
        p = tmp_path / "test.ply"
        write_ply(p, pts, cols)
        pts2, cols2 = read_ply(p)
        np.testing.assert_allclose(pts, pts2, rtol=1e-6)
        np.testing.assert_array_equal(cols, cols2)

    def test_roundtrip_with_alpha(self, tmp_path):
        pts = np.random.RandomState(0).rand(10, 3).astype(np.float32)
        cols = np.random.RandomState(1).rand(10, 3).astype(np.float32)
        alpha = np.random.RandomState(2).rand(10).astype(np.float32)
        p = tmp_path / "a.ply"
        write_ply(p, pts, cols, alpha)
        pts2, cols2 = read_ply(p)
        np.testing.assert_allclose(pts, pts2, rtol=1e-6)


class TestAttachUnlabeled:
    def test_unlabeled_subcluster_attaches_to_nearest(self, tmp_path):
        """A subcluster with zero camera evidence should not count as its
        own instance when attach_unlabeled=True."""
        import cv2
        from cropnerf_tpu.counting.merger import count_instances
        root = tmp_path / "super_cluster_0"
        H = W = 100
        for c in range(2):
            cam_dir = root / f"cam_{c}"
            cam_dir.mkdir(parents=True)
            label_img = np.zeros((H, W), np.uint8)
            # sub 0: bright, labelled instance 1
            img0 = np.zeros((H, W), np.uint8)
            cv2.circle(img0, (30, 50), 12, 255, -1)
            cv2.imwrite(str(cam_dir / "wo_occ_cluster_0.png"), img0)
            cv2.imwrite(str(cam_dir / "visible_cluster_0.png"), img0)
            cv2.circle(label_img, (30, 50), 14, 1, -1)
            # sub 1: completely dark (occluded core)
            dark = np.zeros((H, W), np.uint8)
            cv2.imwrite(str(cam_dir / "wo_occ_cluster_1.png"), dark)
            cv2.imwrite(str(cam_dir / "visible_cluster_1.png"), dark)
            cv2.imwrite(str(cam_dir / "label_frame_0000.png"), label_img)
        info = np.array([{
            "aabb": np.zeros((2, 2, 3)),
            "pcd": {0: np.zeros((4, 3)), 1: np.ones((4, 3)) * 0.01},
        }], dtype=object)
        cfg = MergerConfig(frame_sampling_interval=1)
        assert count_instances(tmp_path, info, cfg).total_count == 2
        cfg2 = MergerConfig(frame_sampling_interval=1, attach_unlabeled=True)
        assert count_instances(tmp_path, info, cfg2).total_count == 1


def make_grouped_tree(root: Path, groups, n_cams=8, seed=0, noise=0.0,
                      occluded=None, label_scale=1.0):
    """Projection-artifact tree for ``len(groups)`` subclusters whose GT
    instance ids are ``groups[i]`` — the mid-scale fixture the small
    2-subcluster trees can't provide (VERDICT r3 item 3): many instances,
    per-(cam, subcluster) label noise, per-view occlusion, optional
    label-resolution mismatch (``label_scale``).  Returns the supercluster
    ``info`` row (centroids spread like the circle grid so
    ``attach_unlabeled`` geometry is meaningful)."""
    import cv2
    rng = np.random.RandomState(seed)
    n_sub = len(groups)
    H, W = 180, 220
    centers = [(30 + 50 * (i % 4), 30 + 50 * (i // 4)) for i in range(n_sub)]
    occluded = set(occluded or ())
    instance_ids = sorted(set(groups))
    for c in range(n_cams):
        cam_dir = root / f"cam_{c}"
        cam_dir.mkdir(parents=True, exist_ok=True)
        dx, dy = (c % 3) - 1, (c % 5) - 2
        label_img = np.zeros((H, W), np.uint8)
        for i, g in enumerate(groups):
            cx, cy = centers[i][0] + dx, centers[i][1] + dy
            img = np.zeros((H, W), np.uint8)
            if (c, i) not in occluded:
                cv2.circle(img, (cx, cy), 14, 255, -1)
            cv2.imwrite(str(cam_dir / f"wo_occ_cluster_{i}.png"), img)
            cv2.imwrite(str(cam_dir / f"visible_cluster_{i}.png"), img)
            lab = g
            if noise and rng.rand() < noise:
                others = [x for x in instance_ids if x != g]
                if others:
                    lab = others[rng.randint(len(others))]
            if (c, i) not in occluded:
                cv2.circle(label_img, (cx, cy), 16, int(lab), -1)
        if label_scale != 1.0:
            label_img = cv2.resize(
                label_img, (int(W * label_scale), int(H * label_scale)),
                interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(str(cam_dir / "label_frame_0000.png"), label_img)
    pcd = {i: np.array([[centers[i][0], centers[i][1], 0.0]] * 4,
                       np.float32) / 100.0 for i in range(n_sub)}
    return {"aabb": np.zeros((n_sub, 2, 3)), "pcd": pcd}


class TestPartitionAtScale:
    """All three partition algorithms end-to-end through count_instances at
    n_sub >= 6 with label noise, occlusion and ambiguity (VERDICT r3 item 3;
    ≙ merger.py:26-74 three modes, depth merger community default)."""

    def _count(self, tmp_path, info, algo, **kw):
        cfg = MergerConfig(frame_sampling_interval=1, graph_partition=algo,
                           **kw)
        return count_instances(tmp_path, np.array([info], dtype=object), cfg)

    def test_six_sub_three_instances_all_algorithms_agree(self, tmp_path):
        groups = [1, 1, 2, 2, 3, 3]
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=12)
        for algo in ("clique", "bridge", "community"):
            r = self._count(tmp_path, info, algo)
            assert r.total_count == 3, (algo, r.total_count)
            # members of one GT instance share one output label
            labels = r.labels[0]
            for g in set(groups):
                ids = {labels[i] for i, gi in enumerate(groups) if gi == g}
                assert len(ids) == 1, (algo, g, labels)

    def test_eight_sub_label_noise(self, tmp_path):
        """10% of (cam, subcluster) labels flipped to a wrong instance:
        agreement mass still dominates, every algorithm recovers the true
        count on the seeded fixture."""
        groups = [1, 1, 1, 2, 2, 2, 3, 3]
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=15, noise=0.10, seed=7)
        for algo in ("clique", "bridge", "community"):
            r = self._count(tmp_path, info, algo)
            assert r.total_count == 3, (algo, r.total_count)

    def test_occlusion_with_attach_unlabeled(self, tmp_path):
        """One subcluster fully occluded in EVERY view: without
        attach_unlabeled it (correctly, per reference semantics) counts as
        its own clique instance; with the flag it attaches to the nearest
        evidenced subcluster."""
        groups = [1, 1, 2, 2, 3, 3]
        occl = {(c, 5) for c in range(12)}          # subcluster 5 never seen
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=12, occluded=occl)
        r_plain = self._count(tmp_path, info, "clique")
        assert r_plain.total_count == 4
        r_attach = self._count(tmp_path, info, "clique",
                               attach_unlabeled=True)
        assert r_attach.total_count == 3

    def test_partial_occlusion_keeps_count(self, tmp_path):
        """Heavy but partial occlusion (every subcluster hidden in 2/3 of
        views; same-instance members share a visibility schedule so SOME
        co-visible frames survive — zero co-visibility would correctly
        sever the pair): remaining evidence still yields the true count
        for every algorithm."""
        groups = [1, 1, 2, 2, 3, 3, 4, 4]
        n_cams = 18
        occl = {(c, i) for i in range(len(groups)) for c in range(n_cams)
                if (c + i // 2) % 3 != 0}
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=n_cams, occluded=occl)
        for algo in ("clique", "bridge", "community"):
            r = self._count(tmp_path, info, algo)
            assert r.total_count == 4, (algo, r.total_count)

    def test_ambiguous_pair_cross_algorithm_bounds(self, tmp_path):
        """An ambiguous cross-instance pair: subclusters 2 (instance 2) and
        4 (instance 3) share a wrong same-label vote in several views while
        their true-instance evidence is thinned by occlusion.  No algorithm
        may invent instances beyond the subcluster count or lose the
        well-evidenced ones: clique/community stay within [2, 4] and agree
        to within one instance.  Bridge mode deliberately drops singleton
        components (merger.py:53-56), so under this much thinning it may
        report fewer — only its upper bound holds."""
        groups = [1, 1, 2, 2, 3, 3]
        n_cams = 9
        # thin true evidence for 2/4, keep 3 shared noisy views
        occl = ({(c, 2) for c in range(3, n_cams)}
                | {(c, 4) for c in range(3, n_cams)})
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=n_cams, occluded=occl, noise=0.5,
                                 seed=3)
        counts = {}
        for algo in ("clique", "bridge", "community"):
            counts[algo] = self._count(tmp_path, info, algo).total_count
            assert counts[algo] <= 4, counts
        for algo in ("clique", "community"):
            assert 2 <= counts[algo] <= 4, counts
        assert abs(counts["clique"] - counts["community"]) <= 1, counts

    def test_randomized_groupings_all_algorithms(self, tmp_path):
        """Property: for random instance groupings (each instance >= 2
        subclusters, n_sub 6..9) with clean labels, every algorithm returns
        exactly the instance count."""
        rng = np.random.RandomState(42)
        for trial in range(4):
            n_inst = int(rng.randint(2, 5))
            sizes = [2 + int(rng.randint(0, 2)) for _ in range(n_inst)]
            groups = sum(([g + 1] * s for g, s in enumerate(sizes)), [])
            rng.shuffle(groups)
            root = tmp_path / f"trial_{trial}" / "super_cluster_0"
            info = make_grouped_tree(root, groups, n_cams=10,
                                     seed=100 + trial)
            for algo in ("clique", "bridge", "community"):
                cfg = MergerConfig(frame_sampling_interval=1,
                                   graph_partition=algo)
                r = count_instances(tmp_path / f"trial_{trial}",
                                    np.array([info], dtype=object), cfg)
                assert r.total_count == n_inst, (trial, algo, groups,
                                                 r.total_count)


class TestCountingRobustnessProperties:
    """Randomized/property tests of the robustness knobs (VERDICT r3 item 8:
    attach_unlabeled, scale_factor reconciliation, empty projections,
    all-background labels — counting/merger.py:199-221 policy)."""

    def test_label_resolution_2x_and_half(self, tmp_path):
        """GT labels rendered at 2x and 0.5x the projection resolution:
        scale_factor reconciliation reproduces the 1x count."""
        groups = [1, 1, 2, 2, 3, 3]
        base = None
        for scale in (1.0, 2.0, 0.5):
            root = tmp_path / f"s{scale}" / "super_cluster_0"
            info = make_grouped_tree(root, groups, n_cams=10,
                                     label_scale=scale)
            cfg = MergerConfig(frame_sampling_interval=1,
                               scale_factor=1.0 / scale)
            r = count_instances(tmp_path / f"s{scale}",
                                np.array([info], dtype=object), cfg)
            if base is None:
                base = r.total_count
                assert base == 3
            assert r.total_count == base, (scale, r.total_count)

    def test_empty_projections_count_stably(self, tmp_path):
        """All-black projections: zero evidence → each subcluster is its
        own clique instance (reference behavior); attach_unlabeled folds
        them into one."""
        groups = [1, 1, 2, 2]
        occl = {(c, i) for c in range(6) for i in range(4)}
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=6, occluded=occl)
        r = count_instances(
            tmp_path, np.array([info], dtype=object),
            MergerConfig(frame_sampling_interval=1))
        assert r.total_count == len(groups)
        r2 = count_instances(
            tmp_path, np.array([info], dtype=object),
            MergerConfig(frame_sampling_interval=1, attach_unlabeled=True))
        assert r2.total_count == 1

    def test_all_background_labels(self, tmp_path):
        """Projections fine but the GT labels are all background (0):
        dominant label is 0 everywhere → zero affinity → per-subcluster
        singletons; attach_unlabeled collapses to one."""
        import cv2
        groups = [1, 1, 2, 2]
        info = make_grouped_tree(tmp_path / "super_cluster_0", groups,
                                 n_cams=6)
        for lab in (tmp_path / "super_cluster_0").rglob("label_*.png"):
            img = cv2.imread(str(lab), cv2.IMREAD_GRAYSCALE)
            cv2.imwrite(str(lab), np.zeros_like(img))
        r = count_instances(
            tmp_path, np.array([info], dtype=object),
            MergerConfig(frame_sampling_interval=1))
        assert r.total_count == len(groups)
        r2 = count_instances(
            tmp_path, np.array([info], dtype=object),
            MergerConfig(frame_sampling_interval=1, attach_unlabeled=True))
        assert r2.total_count == 1

    def test_attach_unlabeled_random_floaters(self, tmp_path):
        """Property: however many subclusters are fully occluded (1..3 of
        6), attach_unlabeled restores the true instance count as long as
        each instance keeps at least one evidenced subcluster."""
        rng = np.random.RandomState(5)
        groups = [1, 1, 2, 2, 3, 3]
        for trial in range(3):
            # hide one member of some instances (never both members)
            hidden = []
            for g in sorted(set(groups)):
                members = [i for i, gi in enumerate(groups) if gi == g]
                if rng.rand() < 0.7:
                    hidden.append(members[int(rng.randint(len(members)))])
            if not hidden:
                hidden = [0]
            occl = {(c, i) for c in range(10) for i in hidden}
            root = tmp_path / f"t{trial}" / "super_cluster_0"
            info = make_grouped_tree(root, groups, n_cams=10,
                                     occluded=occl, seed=trial)
            r = count_instances(
                tmp_path / f"t{trial}", np.array([info], dtype=object),
                MergerConfig(frame_sampling_interval=1,
                             attach_unlabeled=True))
            assert r.total_count == 3, (trial, hidden, r.total_count)


class TestDressRehearsalSceneInvariants:
    """Geometry invariants of the dress-rehearsal fixture (benchmarks/
    dress_rehearsal.py) — guards against the two scene bugs root-caused in
    round 4: cross-instance surface gaps inside DBSCAN eps (fuses crops
    into superclusters k=2 cannot count) and eps-bridged occluder overlap
    patterns.  Pure geometry, no training."""

    def _scene(self):
        import sys
        sys.path.insert(0, "benchmarks")
        from dress_rehearsal import (CROP_R, EXPECTED_COUNT, OCC_R,
                                     scene_centers)
        crops, occluders = scene_centers()
        return np.asarray(crops), np.asarray(occluders), CROP_R, OCC_R, \
            EXPECTED_COUNT

    def test_expected_count_matches_crop_list(self):
        crops, _, _, _, expected = self._scene()
        assert len(crops) == expected

    def test_pair_merges_and_everything_else_separates(self):
        crops, _, r, _, _ = self._scene()
        eps = 0.2              # 20 * vx_size default (0.01)
        n = len(crops)
        gaps = np.linalg.norm(crops[:, None] - crops[None], axis=-1) - 2 * r
        merged = []
        for i in range(n):
            for j in range(i + 1, n):
                assert gaps[i, j] > 0, (i, j, "crops intersect")
                if gaps[i, j] < eps:
                    merged.append((i, j))
        # exactly ONE designed eps-merged pair (the 2-crop supercluster)
        assert merged == [(8, 9)], merged
        # and it must clear eps with margin elsewhere: every non-pair gap
        # at least 25% above eps so segmentation is robust to fog growth
        for i in range(n):
            for j in range(i + 1, n):
                if (i, j) != (8, 9):
                    assert gaps[i, j] > eps * 1.25, (i, j, gaps[i, j])

    def test_occluders_eps_far_from_every_crop(self):
        """Occluder interiors can leak semantic logits (round-4 root
        cause); they must sit eps-far from EVERY crop so a leak can
        neither merge with a crop nor bridge two of them."""
        crops, occluders, r, ro, _ = self._scene()
        eps = 0.2
        for k, o in enumerate(occluders):
            d = np.linalg.norm(crops - o, axis=-1) - (r + ro)
            assert (d > eps).all(), (k, d.round(3))

    def test_occluders_outside_export_aabb_crops_inside(self):
        """The export AABB is drawn around the crop region only: every
        crop sphere fully inside, every occluder sphere fully outside —
        unobserved occluder interiors can then never enter the semantic
        cloud regardless of logit extrapolation."""
        import sys
        sys.path.insert(0, "benchmarks")
        from dress_rehearsal import EXPORT_AABB
        crops, occluders, r, ro, _ = self._scene()
        lo, hi = np.asarray(EXPORT_AABB)
        assert (crops - r >= lo).all() and (crops + r <= hi).all()
        for o in occluders:
            # sphere fully outside the box: closest box point farther
            # than the radius
            closest = np.clip(o, lo, hi)
            assert np.linalg.norm(o - closest) > ro, (o, closest)
