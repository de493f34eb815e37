"""RNG tests (parity: reference test_random.py — reproducibility across
block shapes, which for counter-based whole-array sampling is structural)."""

import numpy as np
import pytest


def test_reproducibility_across_block_shapes(app_inst):
    """Same seed ⇒ same array regardless of block shape (the reference's
    PCG64 jump-ahead goal, numpy_compute.py:56-68)."""
    a = app_inst.random_state(1337).normal(shape=(60, 10), block_shape=(10, 10))
    b = app_inst.random_state(1337).normal(shape=(60, 10), block_shape=(60, 5))
    c = app_inst.random_state(1337).normal(shape=(60, 10), block_shape=(7, 3))
    assert np.allclose(a.get(), b.get())
    assert np.allclose(a.get(), c.get())
    d = app_inst.random_state(42).normal(shape=(60, 10), block_shape=(10, 10))
    assert not np.allclose(a.get(), d.get())


def test_uniform_range_and_moments(app_inst):
    rs = app_inst.random_state(0)
    u = rs.random(shape=(2000,), block_shape=(500,)).get()
    assert (0 <= u).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.05
    n = rs.normal(loc=2.0, scale=3.0, shape=(5000,), block_shape=(1000,)).get()
    assert abs(n.mean() - 2.0) < 0.2
    assert abs(n.std() - 3.0) < 0.2


def test_integers_and_permutation(app_inst):
    rs = app_inst.random_state(7)
    ints = rs.integers(5, 15, shape=(1000,), block_shape=(250,)).get()
    assert ints.min() >= 5 and ints.max() < 15
    assert ints.dtype == np.int64 or ints.dtype == np.int32
    perm = rs.permutation(100, 25).get()
    assert np.array_equal(np.sort(perm), np.arange(100))


DISTS = [
    ("beta", (2.0, 3.0), lambda s: ((0 < s) & (s < 1)).all()),
    ("exponential", (2.0,), lambda s: (s >= 0).all() and abs(s.mean() - 2.0) < 0.3),
    ("gamma", (2.0, 2.0), lambda s: (s > 0).all() and abs(s.mean() - 4.0) < 0.5),
    ("poisson", (3.0,), lambda s: (s >= 0).all() and abs(s.mean() - 3.0) < 0.3),
    ("chisquare", (4.0,), lambda s: (s > 0).all() and abs(s.mean() - 4.0) < 0.5),
    ("gumbel", (0.0, 1.0), lambda s: np.isfinite(s).all()),
    ("laplace", (0.0, 1.0), lambda s: abs(s.mean()) < 0.2),
    ("logistic", (0.0, 1.0), lambda s: abs(s.mean()) < 0.3),
    ("lognormal", (0.0, 0.5), lambda s: (s > 0).all()),
    ("pareto", (3.0,), lambda s: (s >= 0).all()),
    ("power", (3.0,), lambda s: ((0 <= s) & (s <= 1)).all()),
    ("rayleigh", (1.0,), lambda s: (s >= 0).all()),
    ("standard_cauchy", (), lambda s: np.isfinite(s).all()),
    ("standard_t", (5.0,), lambda s: abs(np.median(s)) < 0.3),
    ("triangular", (0.0, 0.5, 1.0), lambda s: ((0 <= s) & (s <= 1)).all()),
    ("wald", (1.0, 1.0), lambda s: (s > 0).all()),
    ("weibull", (2.0,), lambda s: (s >= 0).all()),
    ("binomial", (10, 0.5), lambda s: ((0 <= s) & (s <= 10)).all()),
    ("geometric", (0.5,), lambda s: (s >= 1).all()),
    ("f", (5.0, 7.0), lambda s: (s > 0).all()),
    ("negative_binomial", (5, 0.5), lambda s: (s >= 0).all()),
    ("noncentral_chisquare", (4.0, 2.0), lambda s: (s > 0).all()),
    ("vonmises", (0.0, 1.0), lambda s: ((-np.pi <= s) & (s <= np.pi)).all()),
    ("zipf", (3.0,), lambda s: (s >= 1).all()),
    ("logseries", (0.5,), lambda s: (s >= 1).all()),
    ("hypergeometric", (20, 10, 10), lambda s: ((0 <= s) & (s <= 10)).all()),
]


@pytest.mark.parametrize("name,args,check", DISTS, ids=[d[0] for d in DISTS])
def test_distribution_zoo(app_inst, name, args, check):
    rs = app_inst.random_state(123)
    ba = getattr(rs, name)(*args, shape=(500,), block_shape=(125,))
    s = ba.get()
    assert s.shape == (500,)
    assert check(s), name


def test_numpy_escape_hatch(app_inst):
    rs = app_inst.random_state(5)
    gen = rs.numpy()
    assert isinstance(gen.integers(10), (int, np.integer))


def test_generator_extras(app_inst):
    rs = app_inst.random_state(9)
    assert rs.standard_normal(shape=(50,), block_shape=(25,)).shape == (50,)
    se = rs.standard_exponential(shape=(50,), block_shape=(50,)).get()
    assert (se >= 0).all()
    sg = rs.standard_gamma(2.0, shape=(50,), block_shape=(50,)).get()
    assert (sg > 0).all()
    mvn = rs.multivariate_normal([0.0, 5.0], np.eye(2), shape=(200,))
    assert mvn.shape == (200, 2)
    assert abs(mvn.get()[:, 1].mean() - 5.0) < 0.5
    d = rs.dirichlet([1.0, 2.0, 3.0], shape=(100,)).get()
    assert np.allclose(d.sum(axis=1), 1.0)
    m = rs.multinomial(10, [0.3, 0.7], shape=(20,)).get()
    assert (m.sum(axis=1) == 10).all()
    c = rs.choice(5, shape=(100,)).get()
    assert ((0 <= c) & (c < 5)).all()
    x = app_inst.array(np.arange(30.0), block_shape=(10,))
    assert rs.shuffle(x) is None  # in place, numpy contract
    shuffled = x.get()
    assert np.array_equal(np.sort(shuffled), np.arange(30.0))
    assert not np.array_equal(shuffled, np.arange(30.0))


def test_device_rejection_samplers_stats(app_inst):
    """vonmises/zipf/logseries now sample ON DEVICE (rejection/inversion);
    check pmf/moments against NumPy's generators."""
    rs = app_inst.random_state(0)
    n = 50000
    vm = rs.vonmises(1.0, 4.0, shape=(n,), block_shape=(n,)).get()
    assert ((-np.pi <= vm) & (vm <= np.pi)).all()
    # circular mean near mu=1.0
    assert abs(np.angle(np.exp(1j * vm).mean()) - 1.0) < 0.05
    z = rs.zipf(3.0, shape=(n,), block_shape=(n,)).get()
    zref = np.random.default_rng(0).zipf(3.0, n)
    assert (z >= 1).all()
    for k in (1, 2, 3):
        assert abs((z == k).mean() - (zref == k).mean()) < 0.02, k
    ls = rs.logseries(0.6, shape=(n,), block_shape=(n,)).get()
    lref = np.random.default_rng(0).logseries(0.6, n)
    for k in (1, 2, 3):
        assert abs((ls == k).mean() - (lref == k).mean()) < 0.02, k
    # reproducible across block shapes (now structural for these too)
    a = app_inst.random_state(5).zipf(2.5, shape=(100,), block_shape=(10,))
    b = app_inst.random_state(5).zipf(2.5, shape=(100,), block_shape=(100,))
    assert np.array_equal(a.get(), b.get())


def test_rng_state_roundtrip(nps_app_inst):
    """get_state/set_state reproduce the stream exactly (coverage-CLI
    parity: the four state functions were the gap on numpy.random)."""
    import nums_tpu.numpy.random as npsr

    rs = npsr.RandomState(123)
    _ = rs.normal(size=(8,))
    state = rs.get_state()
    a = rs.normal(size=(8,)).get()
    rs.set_state(state)
    b = rs.normal(size=(8,)).get()
    assert np.allclose(a, b)
    bg = rs.get_bit_generator()
    c = rs.normal(size=(8,)).get()
    rs.set_bit_generator(bg)
    d = rs.normal(size=(8,)).get()
    assert np.allclose(c, d)
    # module-level
    npsr.seed(5)
    s = npsr.get_state()
    x1 = npsr.normal(size=(4,)).get()
    npsr.set_state(s)
    x2 = npsr.normal(size=(4,)).get()
    assert np.allclose(x1, x2)


def test_hypergeometric_device_path(app_inst):
    """Device-side exact without-replacement chain: bounds, moments,
    determinism, and cross-blocking invariance."""
    ngood, nbad, nsample = 30, 20, 15
    rs = app_inst.random_state(77)
    x = rs.hypergeometric(ngood, nbad, nsample, shape=(4000,),
                          block_shape=(500,))
    v = x.get()
    assert v.min() >= max(0, nsample - nbad)
    assert v.max() <= min(nsample, ngood)
    mean = nsample * ngood / (ngood + nbad)
    n, g, b = nsample, ngood, nbad
    var = n * (g / (g + b)) * (b / (g + b)) * ((g + b - n) / (g + b - 1))
    assert abs(v.mean() - mean) < 4 * np.sqrt(var / v.size)
    assert abs(v.var() - var) < 0.35 * var
    # determinism + block-shape invariance (same seed ⇒ same array)
    y = app_inst.random_state(77).hypergeometric(
        ngood, nbad, nsample, shape=(4000,), block_shape=(4000,)
    )
    assert np.array_equal(v, y.get())
    # huge nsample falls back to host without error
    z = app_inst.random_state(1).hypergeometric(
        10**6, 10**6, 10**5, shape=(8,), block_shape=(8,)
    )
    assert z.shape == (8,)


def test_hypergeometric_dtype_consistent_across_paths(app_inst):
    """Review regression: the host fallback (huge nsample) must return
    the same int64 dtype as the device path."""
    from nums_tpu.core.ops import random_ops

    rs = app_inst.random_state(7)
    thr = random_ops.HYPERGEOMETRIC_DEVICE_MAX_NSAMPLE
    dev = rs.hypergeometric(thr * 2, thr * 2, 16, shape=(5,))
    host = rs.hypergeometric(thr * 2, thr * 2, thr + 1, shape=(5,))
    assert dev.dtype == np.int64
    assert host.dtype == np.int64


def test_shuffle_matches_sort_convention_2d(app_inst):
    """shuffle permutes rows in place (axis 0 only), numpy contract."""
    x_np = np.arange(24.0).reshape(8, 3)
    x = app_inst.array(x_np, block_shape=(4, 3))
    rs = app_inst.random_state(11)
    assert rs.shuffle(x) is None
    got = x.get()
    # rows intact, order permuted
    assert sorted(map(tuple, got)) == sorted(map(tuple, x_np))


def test_wald_matches_inverse_gaussian_moments(app_inst):
    """Review regression: wald(mean, scale) is IG(mean, scale) —
    mean `mean`, variance mean^3/scale (the old scaling returned
    IG(scale*mean, scale): mean off by the scale factor)."""
    rs = app_inst.random_state(3)
    n = 100_000
    w = rs.wald(3.0, 2.0, shape=(n,), block_shape=(n,)).get()
    assert abs(w.mean() - 3.0) < 0.1
    assert abs(w.var() - 13.5) < 0.8


def test_noncentral_chisquare_small_df(app_inst):
    """Review regression: df <= 1 uses the Poisson-mixture
    construction (the chi2(df-1) decomposition is NaN there)."""
    rs = app_inst.random_state(4)
    n = 100_000
    s = rs.noncentral_chisquare(0.5, 1.0, shape=(n,), block_shape=(n,)).get()
    assert np.isfinite(s).all() and (s >= 0).all()
    assert abs(s.mean() - 1.5) < 0.1  # E = df + nonc


def test_noncentral_f_mean(app_inst):
    """Review regression: numerator/denominator keys must be
    independent (fold_in(key, 1) collides with split(key))."""
    rs = app_inst.random_state(5)
    n = 200_000
    f = rs.noncentral_f(5.0, 20.0, 3.0, shape=(n,), block_shape=(n,)).get()
    want = 20.0 / 18.0 * (5.0 + 3.0) / 5.0  # dfden/(dfden-2)*(dfnum+nonc)/dfnum
    assert abs(f.mean() - want) < 0.05


def test_integers_endpoint_at_dtype_max(app_inst):
    """Review regression: endpoint=True at the dtype max must not
    overflow high+1 into an inverted range."""
    rs = app_inst.random_state(6)
    hi = np.iinfo(np.int32).max
    v = rs.integers(hi - 2, hi, shape=(2000,), block_shape=(2000,),
                    dtype=np.int32, endpoint=True).get()
    assert v.min() >= hi - 2 and v.max() == hi
    assert set(np.unique(v)) == {hi - 2, hi - 1, hi}


def test_hypergeometric_large_population_exact_urn(app_inst):
    """Review regression: the device urn is int32 (exact for every
    numpy-legal population; f32 counts stopped depleting past 2^24),
    and populations >= 1e9 raise numpy's own ValueError."""
    rs = app_inst.random_state(8)
    g = b = 2**29  # > f32 exactness, < numpy's 1e9 cap
    h = rs.hypergeometric(g, b, 64, shape=(500,), block_shape=(500,))
    assert h.dtype == np.int64
    v = h.get()
    assert (0 <= v).all() and (v <= 64).all()
    assert abs(v.mean() - 32.0) < 1.0  # E = nsample * g/(g+b)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="1000000000"):
        rs.hypergeometric(10**9, 10, 5, shape=(3,))
