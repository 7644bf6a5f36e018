"""2-D embedding projection (t-SNE/PCA — the UMAP stand-in for the encoder
dashboards, ref encoder/visualizations.py:520-551)."""
import numpy as np

from rtvc_tpu.utils.projection import project_2d, tsne_2d


def _clusters(n_per=12, d=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((3, d)) * 5
    pts = np.concatenate(
        [c + 0.3 * rng.standard_normal((n_per, d)) for c in centers]
    )
    labels = np.repeat(np.arange(3), n_per)
    return pts.astype(np.float32), labels


def test_tsne_separates_clusters():
    pts, labels = _clusters()
    y = tsne_2d(pts, perplexity=8, n_iter=600)
    assert y.shape == (len(pts), 2)
    # clusters must be separable: within-cluster distance far smaller than
    # between-cluster centroid distance
    cents = np.stack([y[labels == k].mean(axis=0) for k in range(3)])
    within = max(
        np.linalg.norm(y[labels == k] - cents[k], axis=1).mean()
        for k in range(3)
    )
    between = min(
        np.linalg.norm(cents[i] - cents[j])
        for i in range(3) for j in range(i + 1, 3)
    )
    assert between > 3 * within, (between, within)


def test_tsne_is_deterministic():
    pts, _ = _clusters(n_per=8)
    y1 = tsne_2d(pts, n_iter=100, seed=3)
    y2 = tsne_2d(pts, n_iter=100, seed=3)
    np.testing.assert_array_equal(y1, y2)


def test_project_2d_small_input_falls_back_to_pca():
    pts = np.random.default_rng(0).standard_normal((5, 16))
    y = project_2d(pts)
    assert y.shape == (5, 2)
