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


# ============================================================================
# Round-2 completion: every remaining phpt case ported (VERDICT r1 #4),
# error-behavior coverage mirroring the reference's error-first style
# (tests/random/001 & 002 assert exception messages verbatim), and a
# traceable phpt -> pytest map asserted complete against /root/reference.
# ============================================================================

import os

import jax


# --- math/002-multiply, 006-mod: slice + column-broadcast cases -------------
def test_multiply_broadcast_cases_phpt():
    a = nd.array(A22)
    check(a * a[0], [[1, 4], [3, 8]])
    check(a * nd.array([[1], [2]]), [[1, 2], [6, 8]])


def test_mod_broadcast_cases_phpt():
    a = nd.array(A22)
    check(a % a, [[0, 0], [0, 0]])
    check(a % a[0], [[0, 0], [0, 0]])
    check(a % nd.array([[1], [2]]), [[0, 0], [1, 0]])


# --- math/016-max, 017-min: slice and nested-list inputs ---------------------
def test_max_min_variants_phpt():
    a = nd.array(A22)
    assert float(a.max()) == 4.0
    assert float(a[0].max()) == 2.0
    assert float(nd.array([[1], [2]]).max()) == 2.0
    assert float(a[0].min()) == 1.0
    assert float(nd.array([[1], [2]]).min()) == 1.0


# --- logic/001-all: slice and 1-d input --------------------------------------
def test_all_variants_phpt():
    a = nd.array([[1, 0], [3, 4]])
    assert float(a.all()) == 0.0
    assert float(a[0].all()) == 0.0  # row [1, 0]
    assert float(nd.array([9, 10]).all()) == 1.0


# --- logic/002-allclose: disjoint and 1-d -------------------------------------
def test_allclose_variants_phpt():
    a = nd.array(A22)
    b = nd.array([[5, 6], [7, 8]])
    c = nd.array([9, 10])
    assert not a.allclose(b)
    assert a.allclose(a)
    assert c.allclose(c)


# --- manipulation/001-transpose: non-square, 1-d, 3-d ------------------------
def test_transpose_variants_phpt():
    b = nd.array([[1, 3, 2], [3, 4, 1]])
    check(b.transpose(), [[1, 3], [3, 4], [2, 1]])
    c = nd.array([1, 2, 3, 4])
    check(c.transpose(), [1, 2, 3, 4])  # 1-d transpose is identity
    d = nd.array([[[1, 2, 3, 4]]])       # (1,1,4) -> (4,1,1)
    assert d.transpose().shape == (4, 1, 1)
    check(d.transpose().flatten(), [1, 2, 3, 4])


# --- manipulation/002-reshape: all five case shapes ---------------------------
def test_reshape_variants_phpt():
    a = nd.array(A22)
    b = nd.array([1, 2, 3, 4])
    check(a.reshape((1, 4)), [[1, 2, 3, 4]])
    assert a.reshape((1, 2, 2)).shape == (1, 2, 2)
    check(b.reshape((2, 2)), A22)
    check(b.reshape((2, 2)).reshape((1, 4)), [[1, 2, 3, 4]])


# --- manipulation/004-flatten: 1-d/2-d/3-d ------------------------------------
def test_flatten_variants_phpt():
    check(nd.array([[1, 2, 3, 4]]).flatten(), [1, 2, 3, 4])
    c = nd.array([[[5, 6], [7, 8]], [[5, 6], [7, 8]]])
    check(c.flatten(), [5, 6, 7, 8, 5, 6, 7, 8])
    check(nd.array([1, 2, 3, 4]).flatten(), [1, 2, 3, 4])


# --- manipulation/005-expanddims: full axis matrix incl. axis lists ----------
def test_expanddims_variants_phpt():
    a = nd.array([[1, 2, 3, 4]])
    b = nd.array([[5, 6], [7, 8]])
    c = nd.array([[[5, 6], [7, 8]], [[5, 6], [7, 8]]])
    assert a.expand_dims(-1).shape == (1, 4, 1)
    assert a.expand_dims(-2).shape == (1, 1, 4)
    assert a.expand_dims(1).shape == (1, 1, 4)
    assert b.expand_dims(0).shape == (1, 2, 2)
    assert b.expand_dims(-1).shape == (2, 2, 1)
    assert b.expand_dims(-2).shape == (2, 1, 2)
    assert b.expand_dims(1).shape == (2, 1, 2)
    assert c.expand_dims(0).shape == (1, 2, 2, 2)
    assert c.expand_dims(-1).shape == (2, 2, 2, 1)
    assert c.expand_dims(-2).shape == (2, 2, 1, 2)
    assert c.expand_dims(1).shape == (2, 1, 2, 2)
    # axis lists (reference passes [0, -1, 1] etc.)
    assert c.expand_dims((0, -1, 1)).shape == (1, 1, 2, 2, 2, 1)
    assert c.expand_dims((0, -1)).shape == (1, 2, 2, 2, 1)
    assert c.expand_dims((2, 1, 0)).shape == (1, 1, 1, 2, 2, 2)


# --- initializers/001: empty array + instance construction -------------------
def test_array_empty_and_ctor_phpt():
    assert nd.array([]).toArray() == []
    check(nd([[1, 2], [3, 4]]), A22)  # `new NDArray(...)` form
    assert nd([]).toArray() == []


# --- linalg/003-trace: non-square input ---------------------------------------
def test_trace_nonsquare_phpt():
    assert float(nd.array([[9], [10]]).trace()) == 9.0


# --- random/001 + 002: exception-message parity --------------------------------
# The reference asserts these messages VERBATIM in its phpt EXPECT blocks —
# error behavior is a first-class test target (SURVEY.md §4).
@pytest.mark.parametrize("ctor", ["standard_normal", "poisson", "uniform",
                                  "normal", "zeros", "ones", "full"])
@pytest.mark.parametrize("bad,typename", [
    (1, "int"), (3.5, "float"), ("test", "str"), (None, "NoneType"),
])
def test_shape_type_errors_phpt(ctor, bad, typename):
    fn = getattr(nd, ctor)
    args = (7.0,) if ctor == "full" else ()
    with pytest.raises(TypeError) as ei:
        fn(bad, *args) if ctor == "full" else fn(bad)
    msg = str(ei.value)
    assert f"NDArray::{ctor}()" in msg
    assert "must be of type array" in msg
    assert typename in msg


@pytest.mark.parametrize("ctor", ["standard_normal", "poisson"])
@pytest.mark.parametrize("bad_el", [[], 3.5, "test", None])
def test_shape_element_errors_phpt(ctor, bad_el):
    with pytest.raises(ValueError, match="Shape elements must be integers"):
        getattr(nd, ctor)([bad_el])


@pytest.mark.parametrize("ctor", ["standard_normal", "poisson", "zeros"])
def test_shape_empty_errors_phpt(ctor):
    with pytest.raises(ValueError, match="Expected a non-empty array"):
        getattr(nd, ctor)([])


def test_random_value_types_phpt():
    """random/001 case 5 / 002 case 6: shape structure of the results."""
    a = nd.standard_normal([4])
    assert len(a.toArray()) == 4
    assert all(isinstance(v, float) for v in a.toArray())
    b = nd.poisson([4, 4])
    assert all(len(row) == 4 for row in b.toArray())
    assert float(b.min()) >= 0.0
    assert np.allclose(np.asarray(b.toArray()), np.round(np.asarray(b.toArray())))


# --- reference error-first style across linalg / slicing / arithmetic --------
def test_linalg_error_paths():
    a = nd.array(A22)
    with pytest.raises(ValueError):
        nd.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]).inv()  # non-square
    with pytest.raises(TypeError):
        a.matmul(nd.ones((3, 3)))  # inner-dim mismatch (linalg.c:230-238)
    with pytest.raises(ValueError, match="not positive definite"):
        nd.array([[1.0, 5.0], [5.0, 1.0]]).cholesky()  # linalg.c:1072


def test_indexing_error_paths():
    a = nd.array(A22)
    with pytest.raises(IndexError):
        a[5]                      # numpower.c offsetGet bounds check
    with pytest.raises(ValueError):
        a.slice([0, 2, 0])        # zero step (indexing.c:59-107)
    with pytest.raises(TypeError):
        a + nd.ones((3, 3))       # broadcast mismatch (ndarray.c:1191)


def test_reshape_error_path():
    with pytest.raises(TypeError):
        nd.array(A22).reshape((3, 3))  # size mismatch (manipulation.c:137-162)


def test_load_missing_file_error_path():
    with pytest.raises((FileNotFoundError, OSError)):
        nd.load("/nonexistent/no_such_file.npy")


# ============================================================================
# Traceability map: EVERY reference phpt file -> the pytest functions that
# mirror its cases. test_phpt_map_complete asserts nothing on disk is missing.
# ============================================================================

PHPT_MAP = {
    "initializers/001-ndarray-array-phparray.phpt": [
        "test_initializers_phpt", "test_array_empty_and_ctor_phpt"],
    "initializers/045-ndarray-arange.phpt": ["test_initializers_phpt"],
    "initializers/046-ndarray-identity.phpt": ["test_initializers_phpt"],
    "initializers/047-ndarray-ones.phpt": [
        "test_initializers_phpt", "test_shape_type_errors_phpt"],
    "initializers/048-ndarray-zeros.phpt": [
        "test_initializers_phpt", "test_shape_type_errors_phpt",
        "test_shape_empty_errors_phpt"],
    "linalg/001-ndarray-matmul.phpt": [
        "test_matmul_phpt", "test_linalg_error_paths"],
    "linalg/002-ndarray-inv.phpt": ["test_inv_phpt", "test_linalg_error_paths"],
    "linalg/003-ndarray-trace.phpt": [
        "test_trace_phpt", "test_trace_nonsquare_phpt"],
    "logic/001-ndarray-all.phpt": ["test_logic_phpt", "test_all_variants_phpt"],
    "logic/002-ndarray-allclose.phpt": [
        "test_logic_phpt", "test_allclose_variants_phpt"],
    "logic/003-ndarray-equal.phpt": ["test_logic_phpt"],
    "logic/004-ndarray-greater.phpt": ["test_logic_phpt"],
    "logic/005-ndarray-greater_equal.phpt": ["test_logic_phpt"],
    "logic/006-ndarray-less.phpt": ["test_logic_phpt"],
    "logic/007-ndarray-less_equal.phpt": ["test_logic_phpt"],
    "logic/008-ndarray-not_equal.phpt": ["test_logic_phpt"],
    "manipulation/001-ndarray-transpose.phpt": [
        "test_transpose_phpt", "test_transpose_variants_phpt"],
    "manipulation/002-ndarray-reshape.phpt": [
        "test_reshape_phpt", "test_reshape_variants_phpt",
        "test_reshape_error_path"],
    "manipulation/003-ndarray-append.phpt": ["test_append_phpt"],
    "manipulation/004-ndarray-flatten.phpt": [
        "test_flatten_phpt", "test_flatten_variants_phpt"],
    "manipulation/005-ndarray-expanddims.phpt": [
        "test_expanddims_phpt", "test_expanddims_variants_phpt"],
    "math/002-ndarray-multiply.phpt": [
        "test_multiply_phpt", "test_multiply_broadcast_cases_phpt"],
    "math/003-ndarray-add.phpt": ["test_add_phpt", "test_indexing_error_paths"],
    "math/004-ndarray-subtract.phpt": ["test_subtract_phpt"],
    "math/005-ndarray-divide.phpt": ["test_divide_phpt"],
    "math/006-ndarray-mod.phpt": [
        "test_mod_phpt", "test_mod_broadcast_cases_phpt"],
    "math/007-ndarray-pow.phpt": ["test_pow_phpt"],
    "math/016-ndarray-max.phpt": [
        "test_extrema_fold_phpt", "test_max_min_variants_phpt"],
    "math/017-ndarray-min.phpt": [
        "test_extrema_fold_phpt", "test_max_min_variants_phpt"],
    "math/025-ndarray-clip.phpt": ["test_clip_phpt"],
    "math/035-ndarray-prod.phpt": ["test_extrema_fold_phpt"],
    "math/036-ndarray-sum.phpt": ["test_extrema_fold_phpt"],
    "random/001-ndarray-standard_normal.phpt": [
        "test_random_phpt", "test_shape_type_errors_phpt",
        "test_shape_element_errors_phpt", "test_shape_empty_errors_phpt",
        "test_random_value_types_phpt"],
    "random/002-ndarray-poisson.phpt": [
        "test_random_phpt", "test_shape_type_errors_phpt",
        "test_shape_element_errors_phpt", "test_shape_empty_errors_phpt",
        "test_random_value_types_phpt"],
}

# unary math files 008..044 all map to test_unary_phpt's parameter table
_UNARY_FILES = {
    "math/008-ndarray-exp.phpt": "exp", "math/009-ndarray-exp2.phpt": "exp2",
    "math/010-ndarray-expm1.phpt": "expm1", "math/011-ndarray-log.phpt": "log",
    "math/012-ndarray-log10.phpt": "log10",
    "math/013-ndarray-log1p.phpt": "log1p", "math/014-ndarray-log2.phpt": "log2",
    "math/015-ndarray-logb.phpt": "logb",
    "math/018-ndarray-arccosh.phpt": "arccosh",
    "math/019-ndarray-arcsinh.phpt": "arcsinh",
    "math/020-ndarray-arctanh.phpt": "arctanh",
    "math/021-ndarray-cosh.phpt": "cosh", "math/022-ndarray-sinh.phpt": "sinh",
    "math/023-ndarray-tanh.phpt": "tanh", "math/024-ndarray-abs.phpt": "abs",
    "math/026-ndarray-sign.phpt": "sign", "math/027-ndarray-sinc.phpt": "sinc",
    "math/028-ndarray-sqrt.phpt": "sqrt",
    "math/029-ndarray-square.phpt": "square",
    "math/030-ndarray-ceil.phpt": "ceil", "math/031-ndarray-fix.phpt": "fix",
    "math/031-ndarray-floor.phpt": "floor",
    "math/032-ndarray-rint.phpt": "rint", "math/033-ndarray-round.phpt": "round",
    "math/034-ndarray-trunc.phpt": "trunc",
    "math/037-ndarray-arccos.phpt": "arccos",
    "math/038-ndarray-arcsin.phpt": "arcsin",
    "math/039-ndarray-arctan.phpt": "arctan",
    "math/040-ndarray-cos.phpt": "cos",
    "math/041-ndarray-degrees.phpt": "degrees",
    "math/042-ndarray-radians.phpt": "radians",
    "math/043-ndarray-sin.phpt": "sin", "math/044-ndarray-tan.phpt": "tan",
}
for _f, _m in _UNARY_FILES.items():
    PHPT_MAP[_f] = [f"test_unary_phpt[{_m}]"]

_REF_TESTS = "/root/reference/tests"


@pytest.mark.skipif(not os.path.isdir(_REF_TESTS),
                    reason="reference tree unavailable")
def test_phpt_map_complete():
    """Every phpt file in the reference suite has a pytest mirror here, and
    the map names only tests that exist in this module."""
    on_disk = set()
    for root, _, files in os.walk(_REF_TESTS):
        for f in files:
            if f.endswith(".phpt"):
                rel = os.path.relpath(os.path.join(root, f), _REF_TESTS)
                on_disk.add(rel)
    mapped = set(PHPT_MAP)
    assert on_disk - mapped == set(), f"unmapped phpt files: {sorted(on_disk - mapped)}"
    assert mapped - on_disk == set(), f"stale map entries: {sorted(mapped - on_disk)}"
    # unary table names must exist as parametrized ids of test_unary_phpt
    table_methods = {p[0] for p in
                     test_unary_phpt.pytestmark[0].args[1]}
    g = globals()
    for tests in PHPT_MAP.values():
        for t in tests:
            base = t.split("[")[0]
            assert base in g, f"map references missing test {base}"
            if "[" in t:
                m = t[t.index("[") + 1:-1]
                assert m in table_methods, f"{m} not in unary table"
