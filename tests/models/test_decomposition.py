"""PCA / TruncatedSVD oracle tests (vs NumPy SVD; sklearn semantics)."""

import numpy as np
import pytest


def _np_pca(X, k):
    """Reference PCA via NumPy with the u-based svd_flip convention."""
    mean = X.mean(axis=0)
    Xc = X - mean
    u, s, vt = np.linalg.svd(Xc, full_matrices=False)
    idx = np.argmax(np.abs(u), axis=0)
    signs = np.sign(u[idx, np.arange(u.shape[1])])
    u = u * signs[None, :]
    vt = vt * signs[:, None]
    n = X.shape[0]
    ev = s**2 / (n - 1)
    return {
        "mean": mean, "components": vt[:k], "singular_values": s[:k],
        "ev": ev[:k], "ratio": ev[:k] / ev.sum(),
        "proj": Xc @ vt[:k].T,
    }


def test_pca_matches_numpy_oracle(nps_app_inst):
    from nums_tpu.models.decomposition import PCA

    rs = np.random.RandomState(0)
    # Anisotropic data: distinct, well-separated spectrum.
    n, d, k = 500, 8, 4
    scales = np.array([10.0, 6.0, 3.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    X_np = rs.randn(n, d) * scales + rs.randn(d)
    want = _np_pca(X_np, k)

    X = nps_app_inst.array(X_np, block_shape=(125, d))
    pca = PCA(n_components=k)
    Z = pca.fit_transform(X)

    assert pca.n_components_ == k
    assert np.allclose(pca.mean_.get(), want["mean"], atol=1e-8)
    assert np.allclose(
        pca.singular_values_.get(), want["singular_values"], atol=1e-6
    )
    assert np.allclose(pca.explained_variance_.get(), want["ev"], atol=1e-6)
    assert np.allclose(
        pca.explained_variance_ratio_.get(), want["ratio"], atol=1e-8
    )
    assert np.allclose(pca.components_.get(), want["components"], atol=1e-6)
    assert np.allclose(Z.get(), want["proj"], atol=1e-6)
    # transform == fit_transform on the training data.
    assert np.allclose(pca.transform(X).get(), want["proj"], atol=1e-6)


def test_pca_reconstruction_and_whiten(nps_app_inst):
    from nums_tpu.models.decomposition import PCA

    rs = np.random.RandomState(1)
    n, d = 300, 6
    X_np = rs.randn(n, d) * np.array([5.0, 4.0, 3.0, 2.0, 1.0, 0.5]) + 2.0
    X = nps_app_inst.array(X_np, block_shape=(100, d))

    # Full-rank: inverse_transform(transform(X)) == X.
    pca = PCA().fit(X)
    assert pca.n_components_ == d
    assert float(pca.noise_variance_.get()) == 0.0
    rec = pca.inverse_transform(pca.transform(X))
    assert np.allclose(rec.get(), X_np, atol=1e-8)

    # Whiten: projected covariance is the identity.
    pw = PCA(n_components=4, whiten=True)
    Z = pw.fit_transform(X).get()
    cov = Z.T @ Z / (n - 1)
    assert np.allclose(cov, np.eye(4), atol=1e-6)
    # Whitened round-trip restores the low-rank approximation.
    rec_w = pw.inverse_transform(pw.transform(X)).get()
    pk = PCA(n_components=4).fit(X)
    rec_k = pk.inverse_transform(pk.transform(X)).get()
    assert np.allclose(rec_w, rec_k, atol=1e-8)
    # noise_variance_ = mean of the dropped eigenvalues.
    ev_all = np.linalg.svd(
        X_np - X_np.mean(axis=0), compute_uv=False
    ) ** 2 / (n - 1)
    assert np.isclose(float(pw.noise_variance_.get()), ev_all[4:].mean())


def test_truncated_svd(nps_app_inst):
    from nums_tpu.models.decomposition import TruncatedSVD

    rs = np.random.RandomState(2)
    n, d, k = 400, 7, 3
    X_np = np.abs(rs.randn(n, d)) * np.array(
        [8.0, 5.0, 3.0, 1.0, 0.7, 0.4, 0.2]
    )
    X = nps_app_inst.array(X_np, block_shape=(100, d))

    svd = TruncatedSVD(n_components=k)
    Z = svd.fit_transform(X)

    u, s, vt = np.linalg.svd(X_np, full_matrices=False)
    assert np.allclose(svd.singular_values_.get(), s[:k], atol=1e-6)
    # Components match up to the deterministic sign fix.
    got_c = svd.components_.get()
    for i in range(k):
        assert np.allclose(got_c[i], vt[i], atol=1e-6) or np.allclose(
            got_c[i], -vt[i], atol=1e-6
        )
    # Projection magnitude matches the oracle's.
    assert np.allclose(np.abs(Z.get()), np.abs(X_np @ vt[:k].T), atol=1e-6)
    # transform agrees with fit_transform.
    assert np.allclose(svd.transform(X).get(), Z.get(), atol=1e-6)
    # Low-rank reconstruction error equals the optimal (Eckart–Young).
    rec = svd.inverse_transform(Z).get()
    opt = (u[:, :k] * s[:k]) @ vt[:k]
    assert np.isclose(
        np.linalg.norm(X_np - rec), np.linalg.norm(X_np - opt), rtol=1e-6
    )


def test_pca_ragged_rows(nps_app_inst):
    """Row count indivisible by the mesh (pad-and-mask path)."""
    from nums_tpu.models.decomposition import PCA

    rs = np.random.RandomState(3)
    n, d = 203, 5
    X_np = rs.randn(n, d) * np.array([4.0, 3.0, 2.0, 1.0, 0.5])
    X = nps_app_inst.array(X_np, block_shape=(64, d))
    pca = PCA(n_components=2).fit(X)
    want = _np_pca(X_np, 2)
    assert np.allclose(pca.components_.get(), want["components"], atol=1e-6)
    assert np.allclose(
        pca.transform(X).get(), want["proj"], atol=1e-6
    )


def test_randomized_svd_app_level(nps_app_inst):
    """Top-k triplets of a low-rank + noise matrix match the exact SVD."""
    rs = np.random.RandomState(7)
    m, n, k = 300, 120, 5
    A = rs.randn(m, k) @ (rs.randn(k) * np.array([50, 40, 30, 20, 10]))[
        :, None
    ] * 0  # placeholder, replaced below
    # Construct: exact rank-k signal with decaying spectrum + small noise.
    U0, _ = np.linalg.qr(rs.randn(m, k))
    V0, _ = np.linalg.qr(rs.randn(n, k))
    S0 = np.array([50.0, 40.0, 30.0, 20.0, 10.0])
    X_np = (U0 * S0) @ V0.T + 0.01 * rs.randn(m, n)
    X = nps_app_inst.array(X_np, block_shape=(100, 60))

    u, s, vt = nps_app_inst.randomized_svd(X, k, n_iter=3, seed=0)
    s_exact = np.linalg.svd(X_np, compute_uv=False)[:k]
    assert u.shape == (m, k) and s.shape == (k,) and vt.shape == (k, n)
    assert np.allclose(s.get(), s_exact, rtol=1e-4)
    # U, V orthonormal; reconstruction error at the optimal level.
    ug = u.get()
    assert np.allclose(ug.T @ ug, np.eye(k), atol=1e-6)
    rec = (ug * s.get()) @ vt.get()
    opt_err = np.linalg.svd(X_np, compute_uv=False)[k:].sum()
    assert np.linalg.norm(X_np - rec, "fro") <= np.sqrt(
        (np.linalg.svd(X_np, compute_uv=False)[k:] ** 2).sum()
    ) * (1 + 1e-3)
    del opt_err, A


def test_pca_randomized_solver(nps_app_inst):
    from nums_tpu.models.decomposition import PCA

    rs = np.random.RandomState(8)
    n, d, k = 400, 40, 3
    scales = np.concatenate([[20.0, 12.0, 8.0], 0.1 * np.ones(d - 3)])
    X_np = rs.randn(n, d) * scales + rs.randn(d)
    X = nps_app_inst.array(X_np, block_shape=(100, 20))

    full = PCA(n_components=k).fit(X)
    rand = PCA(
        n_components=k, svd_solver="randomized", power_iters=3, seed=1
    ).fit(X)
    assert np.allclose(
        rand.singular_values_.get(), full.singular_values_.get(), rtol=1e-5
    )
    # Components agree up to sign per row.
    fc, rc = full.components_.get(), rand.components_.get()
    for i in range(k):
        assert np.allclose(rc[i], fc[i], atol=1e-4) or np.allclose(
            rc[i], -fc[i], atol=1e-4
        )
    assert np.allclose(
        rand.explained_variance_ratio_.get(),
        full.explained_variance_ratio_.get(), rtol=1e-5,
    )
    # noise_variance_ from the randomized (top-k-only) path matches.
    assert np.isclose(
        float(rand.noise_variance_.get()), float(full.noise_variance_.get()),
        rtol=1e-4,
    )
    # transform round-trips.
    assert np.allclose(
        np.abs(rand.transform(X).get()), np.abs(full.transform(X).get()),
        atol=1e-4,
    )


def test_pca_save_load(nps_app_inst, tmp_path):
    from nums_tpu.models.decomposition import PCA

    rs = np.random.RandomState(8)
    x = rs.randn(120, 6) + 3.0
    X = nps_app_inst.array(x, block_shape=(40, 6))
    m = PCA(n_components=2, whiten=True).fit(X)
    m.save(str(tmp_path / "pca"))
    m2 = PCA.load(str(tmp_path / "pca"))
    assert m2.whiten is True
    assert np.allclose(m2.components_.get(), m.components_.get())
    assert np.allclose(m2.transform(X).get(), m.transform(X).get())
    assert np.isclose(
        float(m2.noise_variance_.get()), float(m.noise_variance_.get())
    )


def test_truncated_svd_save_load(nps_app_inst, tmp_path):
    from nums_tpu.models.decomposition import TruncatedSVD

    rs = np.random.RandomState(9)
    x = rs.randn(100, 5) + 4.0
    X = nps_app_inst.array(x, block_shape=(25, 5))
    m = TruncatedSVD(n_components=2).fit(X)
    m.save(str(tmp_path / "tsvd"))
    m2 = TruncatedSVD.load(str(tmp_path / "tsvd"))
    assert np.allclose(m2.components_.get(), m.components_.get())
    assert np.allclose(m2.transform(X).get(), m.transform(X).get())
    assert np.allclose(
        m2.explained_variance_ratio_.get(),
        m.explained_variance_ratio_.get(),
    )


def test_pca_transform_ooc_matches_incore(nps_app_inst, tmp_path):
    """Review regression: the OOC projection runs on DEVICE via
    ooc_put + a jitted GEMM (KMeans.predict_ooc pattern) and must
    match the in-core transform, including whitening."""
    from nums_tpu.models.decomposition import PCA

    rs = np.random.RandomState(3)
    real_X = rs.randn(96, 6) * np.array([5, 3, 1, 0.5, 0.2, 0.1]) + 2.0
    X = nps_app_inst.array(real_X, block_shape=(24, 6))
    for whiten in (False, True):
        m = PCA(n_components=3, whiten=whiten).fit(X)
        want = m.transform(X).get()
        dX = nps_app_inst.spill(X, str(tmp_path / f"pcaX{whiten}"))
        got = m.transform(dX, out=str(tmp_path / f"pcaT{whiten}"))
        got_host = nps_app_inst.read_fs(got.path).get() if hasattr(
            got, "path"
        ) else got.get()
        assert np.allclose(got_host, want, atol=1e-4), whiten
