"""Error-path behavior: wrong usage must fail loudly and informatively."""

import numpy as np
import pytest


def test_shape_mismatch_errors(app_inst):
    a = app_inst.array(np.ones((4, 3)), (2, 3))
    b = app_inst.array(np.ones((5, 3)), (5, 3))
    with pytest.raises(TypeError):
        (a @ b).touch()  # 3 vs 5 contraction
    with pytest.raises(ValueError):
        a.reshape(7, 2)
    with pytest.raises(ValueError):
        a.reshape(-1, -1)
    with pytest.raises(Exception):
        a[0:2] = np.ones((3, 3))  # wrong assignment shape


def test_unsupported_kwargs_raise(app_inst):
    a = app_inst.array(np.ones(4), (4,))
    with pytest.raises(NotImplementedError):
        app_inst.map_uop("exp", a, out=a)
    with pytest.raises(NotImplementedError):
        app_inst.map_bop("add", a, a, where=False)


def test_bool_of_multielement_nonbool_is_truthy(app_inst):
    # parity quirk: reference __bool__ (blockarray.py:620-628)
    a = app_inst.array(np.zeros(5), (5,))
    assert bool(a) is True  # non-bool dtype => truthy regardless of values
    flag = app_inst.array(np.array([False]), (1,))
    assert bool(flag) is False
    with pytest.raises(ValueError):
        float(a)  # scalar conversion needs size 1


def test_scalar_conversions(app_inst):
    s = app_inst.scalar(7)
    assert int(s) == 7 and float(s) == 7.0 and complex(s) == 7 + 0j
    with pytest.raises(TypeError):
        len(s)


def test_invalid_ops(app_inst):
    a = app_inst.array(np.ones((4, 3)), (2, 3))
    with pytest.raises(NotImplementedError):
        app_inst.argop("argmin", a)  # >1-D parity restriction
    with pytest.raises(ValueError):
        a.check_or_convert_other(object())
    with pytest.raises(NotImplementedError):
        app_inst.split(a, [1, 2])  # non-int sections (parity)


def test_glm_validation(nps_app_inst):
    from nums_tpu.models.glms import LogisticRegression

    with pytest.raises(NotImplementedError):
        LogisticRegression(fit_intercept=False)
    with pytest.raises(NotImplementedError):
        LogisticRegression(penalty="l1")
    m = LogisticRegression(solver="not-a-solver")
    X = nps_app_inst.array(np.ones((10, 2)), (5, 2))
    y = nps_app_inst.array(np.ones(10), (5,))
    with pytest.raises(Exception, match="Unsupported optimizer"):
        m.fit(X, y)