"""Feature-scaling oracle tests vs hand-computed sklearn formulas."""

import numpy as np

from nums_tpu.models import preprocessing


def test_standard_scaler(nps_app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(60, 4) * [1.0, 5.0, 0.1, 2.0] + [0.0, 10.0, -3.0, 1.0]
    x[:, 3] = 7.0  # zero-variance feature
    bx = nps_app_inst.array(x, block_shape=(20, 4))
    sc = preprocessing.StandardScaler().fit(bx)
    got = sc.transform(bx).get()
    std = x.std(axis=0)
    std[std == 0] = 1.0
    want = (x - x.mean(axis=0)) / std
    assert np.allclose(got, want)
    assert np.allclose(got[:, 3], 0.0)  # constant feature stays constant
    back = sc.inverse_transform(sc.transform(bx)).get()
    assert np.allclose(back, x)
    got2 = preprocessing.StandardScaler().fit_transform(bx).get()
    assert np.allclose(got2, want)


def test_standard_scaler_flags(nps_app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(30, 3) + 5.0
    bx = nps_app_inst.array(x, block_shape=(10, 3))
    got = preprocessing.StandardScaler(with_std=False).fit_transform(bx)
    assert np.allclose(got.get(), x - x.mean(axis=0))


def test_minmax_scaler(nps_app_inst):
    rs = np.random.RandomState(2)
    x = rs.randn(40, 3) * 3.0
    x[:, 2] = 4.0  # constant feature
    bx = nps_app_inst.array(x, block_shape=(10, 3))
    sc = preprocessing.MinMaxScaler(feature_range=(-1.0, 1.0)).fit(bx)
    got = sc.transform(bx).get()
    assert np.allclose(got[:, :2].min(axis=0), -1.0)
    assert np.allclose(got[:, :2].max(axis=0), 1.0)
    assert np.allclose(sc.inverse_transform(sc.transform(bx)).get(), x)


def test_normalize(nps_app_inst):
    rs = np.random.RandomState(3)
    x = rs.randn(20, 5)
    x[4] = 0.0  # zero row must not divide by zero
    bx = nps_app_inst.array(x, block_shape=(5, 5))
    for norm, red in (
        ("l2", lambda v: np.sqrt((v * v).sum(axis=1, keepdims=True))),
        ("l1", lambda v: np.abs(v).sum(axis=1, keepdims=True)),
        ("max", lambda v: np.abs(v).max(axis=1, keepdims=True)),
    ):
        got = preprocessing.normalize(bx, norm=norm).get()
        d = red(x)
        d[d == 0] = 1.0
        assert np.allclose(got, x / d), norm
