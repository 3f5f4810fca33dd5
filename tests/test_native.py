"""Native C++ point-cloud ops vs the numpy/sklearn reference paths."""
import numpy as np
import pytest

from cropnerf_tpu.native import pointcloud_ops as nat

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native lib not built")


def blobs(centers, n=300, scale=0.01, seed=0):
    rng = np.random.RandomState(seed)
    return np.concatenate([
        c + rng.randn(n, 3) * scale for c in np.asarray(centers, np.float32)
    ]).astype(np.float32)


class TestNativeVoxelDownsample:
    def test_matches_numpy_cells(self):
        pts = np.random.RandomState(0).rand(2000, 3).astype(np.float32)
        out = nat.voxel_downsample(pts, 0.25)
        # same number of occupied voxels as the numpy path
        keys = np.unique(np.floor(pts / 0.25).astype(np.int64), axis=0)
        assert len(out) == len(keys)
        # centroids of each voxel
        got = {tuple(np.floor(p / 0.25).astype(int)) for p in out}
        want = {tuple(k) for k in keys}
        assert got == want

    def test_averages(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)
        out = nat.voxel_downsample(pts, 1.0)
        np.testing.assert_allclose(out, [[0.15, 0.15, 0.15]], atol=1e-6)


class TestNativeDBSCAN:
    def test_finds_blobs(self):
        pts = blobs([[0, 0, 0], [1, 1, 1], [2, 0, 0]])
        labels = nat.dbscan(pts, eps=0.1, min_points=10)
        assert len(set(labels[labels >= 0])) == 3
        # each blob maps to exactly one cluster
        for b in range(3):
            seg = labels[b * 300:(b + 1) * 300]
            core = seg[seg >= 0]
            assert len(core) > 250
            assert len(set(core)) == 1

    def test_noise(self):
        pts = blobs([[0, 0, 0]], n=300)
        pts = np.concatenate([pts, [[9.0, 9, 9]]]).astype(np.float32)
        labels = nat.dbscan(pts, eps=0.1, min_points=10)
        assert labels[-1] == -1

    def test_agrees_with_sklearn(self):
        from sklearn.cluster import DBSCAN
        pts = blobs([[0, 0, 0], [0.6, 0, 0]], n=200, scale=0.02, seed=3)
        ours = nat.dbscan(pts, eps=0.08, min_points=8)
        ref = DBSCAN(eps=0.08, min_samples=8).fit_predict(pts)
        # same cluster count and same noise set (labels may be permuted)
        assert len(set(ours[ours >= 0])) == len(set(ref[ref >= 0]))
        np.testing.assert_array_equal(ours == -1, ref == -1)


class TestNativeOutlierRemoval:
    def test_drops_far_point(self):
        pts = blobs([[0, 0, 0]], n=400)
        pts = np.concatenate([pts, [[5.0, 5, 5]]]).astype(np.float32)
        keep = nat.statistical_outlier_removal(pts, 20, 2.0)
        assert len(pts) - 1 not in keep
        assert len(keep) > 350

    def test_agrees_with_scipy_path(self):
        from scipy.spatial import cKDTree
        pts = blobs([[0, 0, 0], [1, 0, 0]], n=200, seed=5)
        keep_nat = set(nat.statistical_outlier_removal(pts, 10, 2.0).tolist())
        tree = cKDTree(pts)
        dists, _ = tree.query(pts, k=11)
        mean_d = dists[:, 1:].mean(axis=1)
        thresh = mean_d.mean() + 2.0 * mean_d.std()
        keep_ref = set(np.where(mean_d <= thresh)[0].tolist())
        # identical up to floating-point boundary cases
        sym = keep_nat.symmetric_difference(keep_ref)
        assert len(sym) <= 2, sym


class TestNativeKMeans:
    def test_separates_blobs(self):
        pts = blobs([[0, 0, 0], [1, 0, 0]], n=250)
        labels = nat.kmeans(pts, 2, seed=1)
        first, second = labels[:250], labels[250:]
        assert (first == np.bincount(first).argmax()).mean() > 0.95
        assert (second == np.bincount(second).argmax()).mean() > 0.95
        assert np.bincount(first).argmax() != np.bincount(second).argmax()

    def test_k_clusters_nonempty(self):
        pts = blobs([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], n=100)
        labels = nat.kmeans(pts, 4, seed=0)
        assert len(set(labels)) == 4
