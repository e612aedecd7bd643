"""Golden parity suite mirroring the reference's phpt test cases.

Each case reproduces the inputs of a /root/reference/tests/**/*.phpt file
through the NDArray object API and asserts the same values the phpt EXPECT
block encodes (compared numerically at fp32 tolerance instead of exact
string matching — SURVEY.md §4 implications).
"""

import numpy as np
import pytest

from numpower_tpu import NDArray as nd


def arr(x):
    return np.asarray(x, dtype=np.float64)


def check(result, expected, tol=1e-5):
    got = np.asarray(result.toArray() if hasattr(result, "toArray") else result)
    np.testing.assert_allclose(got, arr(expected), rtol=tol, atol=tol)


A22 = [[1, 2], [3, 4]]


# --- tests/math/003-ndarray-add.phpt ---------------------------------------
def test_add_phpt():
    a = nd.array(A22)
    check(a + 2, [[3, 4], [5, 6]])
    check(a + a, [[2, 4], [6, 8]])
    check(a + a[0], [[2, 4], [4, 6]])
    check(a + nd.array([[1], [2]]), [[2, 3], [5, 6]])


# --- 002-multiply / 004-subtract / 005-divide / 006-mod / 007-pow ----------
def test_multiply_phpt():
    a = nd.array(A22)
    check(a * 2, [[2, 4], [6, 8]])
    check(a * a, [[1, 4], [9, 16]])


def test_subtract_phpt():
    a = nd.array(A22)
    check(a - 1, [[0, 1], [2, 3]])
    check(a - a, [[0, 0], [0, 0]])


def test_divide_phpt():
    a = nd.array(A22)
    check(a / 2, [[0.5, 1], [1.5, 2]])
    check(a / a, [[1, 1], [1, 1]])


def test_mod_phpt():
    a = nd.array(A22)
    check(a % 2, [[1, 0], [1, 0]])


def test_pow_phpt():
    a = nd.array(A22)
    check(a ** 2, [[1, 4], [9, 16]])
    check(a ** a, [[1, 4], [27, 256]], tol=1e-4)


# --- unary files 008..044 ---------------------------------------------------
@pytest.mark.parametrize(
    "method,inp,expected,tol",
    [
        ("exp", [0.0, 1.0], [1.0, np.e], 1e-5),
        ("exp2", [1.0, 3.0], [2.0, 8.0], 1e-5),
        ("expm1", [0.0, 1.0], [0.0, np.e - 1], 1e-5),
        ("log", [1.0, np.e], [0.0, 1.0], 1e-5),
        ("log10", [1.0, 100.0], [0.0, 2.0], 1e-4),
        ("log1p", [0.0, np.e - 1], [0.0, 1.0], 1e-4),
        ("log2", [1.0, 8.0], [0.0, 3.0], 1e-4),
        ("logb", [1.0, 8.0], [0.0, 3.0], 1e-5),
        ("abs", [-1.5, 2.0], [1.5, 2.0], 0),
        ("sign", [-3.0, 0.0, 5.0], [-1.0, 0.0, 1.0], 0),
        ("sqrt", [4.0, 9.0], [2.0, 3.0], 1e-6),
        ("square", [3.0, -2.0], [9.0, 4.0], 0),
        ("ceil", [1.2, -1.2], [2.0, -1.0], 0),
        ("floor", [1.8, -1.2], [1.0, -2.0], 0),
        ("fix", [1.8, -1.8], [1.0, -1.0], 0),
        ("rint", [1.5, 2.5, 2.4], [2.0, 2.0, 2.0], 0),
        ("round", [1.5, 2.5, -2.5], [2.0, 3.0, -3.0], 0),
        ("trunc", [1.9, -1.9], [1.0, -1.0], 0),
        ("sin", [0.0, np.pi / 2], [0.0, 1.0], 1e-6),
        ("cos", [0.0, np.pi], [1.0, -1.0], 1e-6),
        ("tan", [0.0, np.pi / 4], [0.0, 1.0], 1e-5),
        ("arcsin", [0.0, 1.0], [0.0, np.pi / 2], 1e-5),
        ("arccos", [1.0, 0.0], [0.0, np.pi / 2], 1e-5),
        ("arctan", [0.0, 1.0], [0.0, np.pi / 4], 1e-5),
        ("sinh", [0.0, 1.0], [0.0, np.sinh(1)], 1e-5),
        ("cosh", [0.0, 1.0], [1.0, np.cosh(1)], 1e-5),
        ("tanh", [0.0, 1.0], [0.0, np.tanh(1)], 1e-4),
        ("arcsinh", [0.0, np.sinh(1)], [0.0, 1.0], 1e-4),
        ("arccosh", [1.0, np.cosh(1)], [0.0, 1.0], 1e-4),
        ("arctanh", [0.0, np.tanh(1)], [0.0, 1.0], 1e-4),
        ("degrees", [0.0, np.pi], [0.0, 180.0], 1e-4),
        ("radians", [0.0, 180.0], [0.0, np.pi], 1e-5),
        ("sinc", [0.0, 1.0, 0.5], [1.0, 0.0, 2 / np.pi], 1e-5),
    ],
)
def test_unary_phpt(method, inp, expected, tol):
    a = nd.array(inp)
    check(getattr(a, method)(), expected, tol=max(tol, 1e-7))


def test_clip_phpt():
    check(nd.array([-2.0, 0.5, 3.0]).clip(-1.0, 1.0), [-1.0, 0.5, 1.0])


# --- 016-max / 017-min / 035-prod / 036-sum --------------------------------
def test_extrema_fold_phpt():
    a = nd.array(A22)
    assert a.max() == 4.0
    assert a.min() == 1.0
    assert a.sum() == 10.0
    assert a.prod() == 24.0
    check(a.max(axis=0), [3, 4])
    check(a.min(axis=1), [1, 3])


# --- tests/logic/*.phpt -----------------------------------------------------
def test_logic_phpt():
    a = nd.array(A22)
    b = nd.array([[1, 0], [3, 5]])
    check(a.equal(b), [[1, 0], [1, 0]])
    check(a.not_equal(b), [[0, 1], [0, 1]])
    check(a.greater(b), [[0, 1], [0, 0]])
    check(a.greater_equal(b), [[1, 1], [1, 0]])
    check(a.less(b), [[0, 0], [0, 1]])
    check(a.less_equal(b), [[1, 0], [1, 1]])
    assert float(nd.array([[1, 1], [1, 1]]).all()) == 1.0
    assert float(nd.array([[1, 0], [1, 1]]).all()) == 0.0
    assert nd.array(A22).allclose(nd.array(A22))


# --- tests/linalg/*.phpt ----------------------------------------------------
def test_matmul_phpt():
    a = nd.array(A22)
    b = nd.array([[5, 6], [7, 8]])
    check(a.matmul(b), [[19, 22], [43, 50]])
    d = nd.array([[9], [10]])
    check(a.matmul(d), [[29], [67]])


def test_inv_phpt():
    check(nd.array(A22).inv(), [[-2, 1], [1.5, -0.5]], tol=1e-4)


def test_trace_phpt():
    assert nd.array(A22).trace() == 5.0


# --- tests/manipulation/*.phpt ---------------------------------------------
def test_transpose_phpt():
    check(nd.array(A22).transpose(), [[1, 3], [2, 4]])


def test_reshape_phpt():
    check(nd.array(A22).reshape((4,)), [1, 2, 3, 4])
    check(nd.array([1, 2, 3, 4]).reshape((2, 2)), A22)


def test_append_phpt():
    a = nd.array([1, 2, 3, 4])
    b = nd.array([5, 6, 7, 8])
    check(a.append(b), [1, 2, 3, 4, 5, 6, 7, 8])
    check(a.append(a), [1, 2, 3, 4, 1, 2, 3, 4])


def test_flatten_phpt():
    check(nd.array(A22).flatten(), [1, 2, 3, 4])


def test_expanddims_phpt():
    a = nd.array([1, 2])
    assert a.expand_dims(0).shape == (1, 2)
    assert a.expand_dims(1).shape == (2, 1)


# --- tests/initializers/*.phpt ---------------------------------------------
def test_initializers_phpt():
    check(nd.array([[1, 2], [3, 4]]), A22)
    check(nd.arange(5), [0, 1, 2, 3, 4])
    check(nd.identity(3), np.eye(3))
    check(nd.ones((2, 2)), np.ones((2, 2)))
    check(nd.zeros((2, 3)), np.zeros((2, 3)))


# --- tests/random/*.phpt (shape + error behavior) ---------------------------
def test_random_phpt():
    a = nd.standard_normal((3, 4))
    assert a.shape == (3, 4)
    p = nd.poisson((10,), lam=2.0)
    assert p.shape == (10,)
    assert float(p.min()) >= 0.0
    # error-path coverage mirrored from 001-ndarray-standard_normal.phpt
    with pytest.raises((TypeError, ValueError)):
        nd.standard_normal("not-a-shape")
