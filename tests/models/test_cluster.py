"""KMeans (beyond the reference — no clustering exists there)."""

import numpy as np
import pytest

from nums_tpu.models.cluster import KMeans


def _blobs(rs, k, n_per, d, spread=8.0):
    centers = rs.randn(k, d) * spread
    X = np.concatenate(
        [c + rs.randn(n_per, d) for c in centers], axis=0
    )
    y = np.repeat(np.arange(k), n_per)
    perm = rs.permutation(len(X))
    return X[perm], y[perm], centers


def _cluster_accuracy(labels, truth, k):
    # Majority-vote mapping from cluster id -> true class.
    acc = 0
    for c in range(k):
        members = truth[labels == c]
        if len(members):
            acc += int((members == np.bincount(members).argmax()).sum())
    return acc / len(truth)


def test_kmeans_recovers_blobs(app_inst):
    rs = np.random.RandomState(0)
    X, y, _ = _blobs(rs, k=4, n_per=300, d=5)
    bX = app_inst.array(X, block_shape=(300, 5))
    km = KMeans(n_clusters=4, seed=3).fit(bX)
    labels = km.labels_.get()
    assert _cluster_accuracy(labels, y, 4) > 0.97
    assert km.cluster_centers_.shape == (4, 5)
    assert km.inertia_ > 0 and km.n_iter_ >= 1
    # predict matches fit assignments on the training data
    assert np.array_equal(km.predict(bX).get(), labels)


def test_kmeans_deterministic_and_ragged(app_inst):
    rs = np.random.RandomState(1)
    X, y, _ = _blobs(rs, k=3, n_per=335, d=4)  # 1005 rows: ragged on 8
    bX = app_inst.array(X, block_shape=(126, 4))
    a = KMeans(n_clusters=3, seed=7).fit(bX)
    b = KMeans(n_clusters=3, seed=7).fit(bX)
    assert np.array_equal(a.labels_.get(), b.labels_.get())
    assert np.allclose(
        a.cluster_centers_.get(), b.cluster_centers_.get()
    )
    assert _cluster_accuracy(a.labels_.get(), y, 3) > 0.97


def test_kmeans_out_of_core(app_inst, tmp_path):
    """Streamed Lloyd's on a DiskArray clusters well-separated blobs and
    predict_ooc writes a labels DiskArray consistent with in-core
    predict."""
    rs = np.random.RandomState(0)
    blobs = [rs.randn(70, 4) * 0.2 + c for c in
             (np.zeros(4), np.full(4, 5.0), np.array([5, 0, 5, 0.0]))]
    real_X = np.concatenate(blobs, axis=0)
    rs.shuffle(real_X)
    X = app_inst.array(real_X, block_shape=(42, 4))
    dX = app_inst.spill(X, str(tmp_path / "kmX"))
    m = KMeans(n_clusters=3, max_iter=50, seed=1).fit(dX)
    assert m.cluster_centers_.shape == (3, 4)
    # Each blob center is ~recovered by some cluster center.
    centers = m.cluster_centers_.get()
    for c in (np.zeros(4), np.full(4, 5.0), np.array([5, 0, 5, 0.0])):
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 0.5
    # inertia ~ within-cluster var * n
    assert m.inertia_ < 100.0
    labels_disk = m.predict_ooc(dX, out=str(tmp_path / "kmL"))
    assert labels_disk.shape == (210,)
    want = m.predict(X).get()
    assert np.array_equal(labels_disk.to_block_array().get(), want)
    # labels_ explains itself after an OOC fit
    try:
        m.labels_
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_kmeans_save_load(nps_app_inst, tmp_path):
    rs = np.random.RandomState(2)
    real_X = _blobs(rs, 3, 40, 4)[0]
    X = nps_app_inst.array(real_X, block_shape=(30, 4))
    m = KMeans(n_clusters=3, seed=5).fit(X)
    m.save(str(tmp_path / "km"))
    m2 = KMeans.load(str(tmp_path / "km"))
    assert np.allclose(
        m2.cluster_centers_.get(), m.cluster_centers_.get()
    )
    assert m2.inertia_ == m.inertia_ and m2.n_iter_ == m.n_iter_
    assert np.array_equal(m2.predict(X).get(), m.predict(X).get())


def test_kmeans_does_not_pin_training_array(app_inst):
    """Review regression: the fitted model keeps only the row grid
    metadata for labels_, not the full training BlockArray."""
    from nums_tpu.models.cluster import KMeans

    rs = np.random.RandomState(0)
    real_X = np.concatenate(
        [rs.randn(40, 3) + 5.0, rs.randn(40, 3) - 5.0], axis=0
    )
    X = app_inst.array(real_X, block_shape=(20, 3))
    m = KMeans(n_clusters=2, max_iter=20, seed=1).fit(X)
    assert not hasattr(m, "_fit_X")
    lab = m.labels_.get()
    assert lab.shape == (80,)
    assert set(np.unique(lab)) == {0, 1}
    # the two blobs get distinct labels
    assert len(set(lab[:40])) == 1 and lab[0] != lab[-1]
