"""Statistical/shape oracle tests for the legacy ``numpy.random``
facade methods that only the coverage CLI exercised (seed/rand/randn/
randint/uniform/standard_* and the distribution passthroughs)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_seed_reproducibility_and_shapes():
    nps.random.seed(1234)
    a = nps.random.rand(4, 3).get()
    nps.random.seed(1234)
    b = nps.random.rand(4, 3).get()
    assert a.shape == (4, 3) and np.array_equal(a, b)
    assert ((0 <= a) & (a < 1)).all()
    z = nps.random.randn(500).get()
    assert abs(z.mean()) < 0.2 and abs(z.std() - 1) < 0.2
    s = nps.random.random_sample()  # scalar draw
    assert 0.0 <= float(s) < 1.0


def test_integer_and_uniform_ranges():
    r = nps.random.randint(10, size=(200,)).get()  # low-only form
    assert r.min() >= 0 and r.max() < 10
    r2 = nps.random.randint(5, 9, size=50).get()
    assert r2.min() >= 5 and r2.max() < 9
    u = nps.random.uniform(-2.0, 3.0, size=(300,)).get()
    assert u.min() >= -2.0 and u.max() < 3.0
    n = nps.random.normal(loc=4.0, scale=0.5, size=(800,)).get()
    assert abs(n.mean() - 4.0) < 0.2


def test_standard_families():
    z = nps.random.standard_normal(size=(600,)).get()
    assert abs(z.mean()) < 0.2
    e = nps.random.standard_exponential(size=(600,)).get()
    assert e.min() >= 0 and abs(e.mean() - 1.0) < 0.25
    g = nps.random.standard_gamma(3.0, size=(600,)).get()
    assert g.min() >= 0 and abs(g.mean() - 3.0) < 0.5


def test_distribution_passthroughs():
    mean = np.array([1.0, -1.0])
    cov = np.array([[1.0, 0.3], [0.3, 1.0]])
    mv = nps.random.multivariate_normal(mean, cov, size=400).get()
    assert mv.shape == (400, 2)
    assert np.abs(mv.mean(axis=0) - mean).max() < 0.3
    d = nps.random.dirichlet(np.array([2.0, 3.0, 4.0]), size=100).get()
    assert d.shape == (100, 3)
    assert np.allclose(d.sum(axis=1), 1.0, atol=1e-5)
    m = nps.random.multinomial(20, np.array([0.2, 0.3, 0.5]),
                               size=50).get()
    assert m.shape == (50, 3) and (m.sum(axis=1) == 20).all()
    c = nps.random.choice(7, size=100).get()
    assert c.min() >= 0 and c.max() < 7
