"""Oracle tests for the device-resolved dynamic-shape family.

These functions (unique family, 1-D set ops, compress/extract,
trim_zeros, packed boolean-mask assignment) produce data-dependent
output shapes; they are resolved ON DEVICE via the capacity+slice idiom
(`core/ops/masking.py`) — one scalar host sync, O(result) transfer.
The reference computes `where` worker-side
(nums/core/systems/numpy_compute.py:188-201) and has no distributed
unique/set ops at all.
"""

import numpy as np
import pytest

import nums_tpu.numpy as nps
from nums_tpu.numpy import extra3


def _eq(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        return False
    if a.size == 0:
        return True
    if a.dtype.kind in "fc":
        return bool(np.allclose(a, b, equal_nan=True))
    return bool(np.array_equal(a, b))


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 9, size=(5, 7)).astype(np.float64)
    x[1, 2] = np.nan
    x[4, 0] = np.nan
    return x


def test_unique_kwargs_oracle(nps_app_inst, data):
    x = nps.array(data)
    for kwargs in (
        {},
        dict(return_index=True),
        dict(return_inverse=True),
        dict(return_counts=True),
        dict(return_index=True, return_counts=True),
        dict(return_index=True, return_inverse=True, return_counts=True),
    ):
        ours = nps.unique(x, **kwargs)
        ref = np.unique(data, **kwargs)
        if not isinstance(ref, tuple):
            ours, ref = (ours,), (ref,)
        for o, r in zip(ours, ref):
            assert _eq(o.get(), r), kwargs


def test_unique_int_and_bool(nps_app_inst):
    for arr in (
        np.array([3, 1, 3, 2, 1, 3]),
        np.array([True, False, True]),
        np.array([5]),
        np.array([], dtype=np.int64),
    ):
        assert _eq(nps.unique(nps.array(arr)).get(), np.unique(arr))


def test_unique_axis_fallback(nps_app_inst):
    x = np.array([[1, 2], [1, 2], [3, 4]])
    assert _eq(nps.unique(nps.array(x), axis=0).get(), np.unique(x, axis=0))


def test_unique_namedtuples_oracle(nps_app_inst, data):
    flat = data.ravel()
    for ours_fn, np_fn in (
        (nps.unique_values, np.unique_values),
        (nps.unique_counts, np.unique_counts),
        (nps.unique_inverse, np.unique_inverse),
        (nps.unique_all, np.unique_all),
    ):
        ours = ours_fn(nps.array(flat))
        ref = np_fn(flat)
        if hasattr(ref, "_fields"):
            assert type(ours) is type(ref)
            for f in ref._fields:
                got = getattr(ours, f).get()
                want = getattr(ref, f)
                if f == "inverse_indices":
                    # With equal_nan=False the two NaN slots are
                    # interchangeable — assert the defining property
                    # (values[inverse] reconstructs the input), not the
                    # tie-break numpy happened to pick.
                    vals = np.asarray(ours.values.get())
                    assert _eq(vals[got], flat)
                else:
                    assert _eq(got, want), f
        else:
            assert _eq(ours.get(), ref)


@pytest.mark.parametrize(
    "a,b",
    [
        (np.array([1, 3, 4, 3, 9, 2]), np.array([3, 4, 5, 7])),
        (np.array([1.5, 2.5]), np.array([9.0, 10.0])),  # disjoint
        (np.array([2, 2, 2]), np.array([2])),  # identical
        (np.array([], dtype=np.int64), np.array([1, 2])),  # empty lhs
        (np.array([1, 2]), np.array([], dtype=np.int64)),  # empty rhs
    ],
)
def test_setops_oracle(nps_app_inst, a, b):
    for ours_fn, np_fn in (
        (nps.intersect1d, np.intersect1d),
        (nps.setdiff1d, np.setdiff1d),
        (nps.setxor1d, np.setxor1d),
        (nps.union1d, np.union1d),
    ):
        got = ours_fn(nps.array(a), nps.array(b)).get()
        want = np_fn(a, b)
        assert _eq(got, want), (ours_fn.__name__, got, want)


def test_compress_extract_oracle(nps_app_inst, data):
    cond = np.array([True, False, True, False, True])
    x = nps.array(data)
    assert _eq(
        nps.compress(nps.array(cond), x, axis=0).get(),
        np.compress(cond, data, axis=0),
    )
    cond7 = data[0] > 3  # nan > 3 is False: mixed mask
    assert _eq(
        nps.compress(nps.array(cond7), x, axis=1).get(),
        np.compress(cond7, data, axis=1),
    )
    # axis=None ravels; condition shorter than a.size
    assert _eq(
        nps.compress(nps.array(cond), x).get(), np.compress(cond, data)
    )
    # host-side (np.ndarray) condition still works
    assert _eq(
        nps.compress(cond, x, axis=0).get(),
        np.compress(cond, data, axis=0),
    )
    mask = data > 4  # 2-D condition: extract ravels
    assert _eq(
        nps.extract(nps.array(mask), x).get(), np.extract(mask, data)
    )


def test_trim_zeros_oracle(nps_app_inst):
    cases = [
        np.array([0.0, 0.0, 1.0, 2.0, 0.0]),
        np.array([1.0, 0.0, 2.0]),
        np.zeros(4),
        np.array([0, 3, 0, 0], dtype=np.int64),
    ]
    for arr in cases:
        for trim in ("fb", "f", "b", "FB"):
            got = nps.trim_zeros(nps.array(arr), trim).get()
            want = np.trim_zeros(arr, trim)
            assert _eq(got, want), (arr, trim, got, want)


def test_packed_mask_setitem_device_mask(nps_app_inst):
    rng = np.random.default_rng(3)
    y = rng.normal(size=(6, 5))
    w = nps.array(y.copy())
    mask = nps.array(y > 0)  # device-held BlockArray mask
    vals = np.arange((y > 0).sum(), dtype=np.float64)
    w[mask] = nps.array(vals)
    want = y.copy()
    want[y > 0] = vals
    assert np.allclose(w.get(), want)
    # scalar broadcast form stays fully on-device
    w2 = nps.array(y.copy())
    w2[nps.array(y < 0)] = 0.0
    want2 = np.where(y < 0, 0.0, y)
    assert np.allclose(w2.get(), want2)


def test_device_unique_transposed_and_padded(nps_app_inst):
    # Lazy transpose + ragged (pad-and-mask) buffers must be sliced to
    # logical shape before uniquing — pads would otherwise leak in.
    rng = np.random.default_rng(11)
    x = rng.integers(0, 5, size=(5, 3)).astype(np.float64)
    bx = nps_app_inst.array(x, block_shape=(2, 2)).T  # transposed, ragged
    assert _eq(nps.unique(bx).get(), np.unique(x.T))
    got = nps.intersect1d(bx, nps.array(np.array([0.0, 2.0, 99.0]))).get()
    assert _eq(got, np.intersect1d(x.T, np.array([0.0, 2.0, 99.0])))


def test_unique_inverse_transposed_nonsquare(nps_app_inst):
    """Review regression: the inverse must be reshaped to the
    USER-VISIBLE (transposed) shape, not the raw buffer's — a
    transposed non-square input previously got a (raw-shaped)
    scrambled inverse."""
    x = np.array([[1.0, 2.0, 2.0], [3.0, 1.0, 3.0]])
    bx = nps_app_inst.array(x, block_shape=(2, 3)).T  # view (3, 2)
    vals, inv = nps.unique(bx, return_inverse=True)
    nv, ninv = np.unique(x.T, return_inverse=True)
    assert inv.shape == (3, 2)
    assert np.array_equal(vals.get(), nv)
    assert np.array_equal(inv.get(), ninv.reshape(x.T.shape))
    # values reconstruct the logical array through the inverse
    assert np.array_equal(vals.get()[inv.get()], x.T)
