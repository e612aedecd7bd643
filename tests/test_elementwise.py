"""Elementwise/arithmetic parity tests.

Mirrors /root/reference/tests/math/*.phpt (e.g. 003-ndarray-add.phpt covers
scalar broadcast, self-add, row-slice broadcast, column broadcast) plus the
full double_math.h unary surface checked against numpy.
"""

import numpy as np
import pytest

from numpower_tpu import ops

A = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
B = np.array([[5.0, 6.0], [7.0, 8.0]], np.float32)


def test_add_cases():
    # mirrors tests/math/003-ndarray-add.phpt
    np.testing.assert_array_equal(np.asarray(ops.add(A, B)), A + B)
    np.testing.assert_array_equal(np.asarray(ops.add(A, 2.0)), A + 2)  # scalar broadcast
    np.testing.assert_array_equal(np.asarray(ops.add(A, A)), A + A)  # self add
    row = np.array([10.0, 20.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.add(A, row)), A + row)  # row broadcast
    col = np.array([[10.0], [20.0]], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.add(A, col)), A + col)  # col broadcast


def test_binary_ops():
    np.testing.assert_array_equal(np.asarray(ops.subtract(A, B)), A - B)
    np.testing.assert_array_equal(np.asarray(ops.multiply(A, B)), A * B)
    np.testing.assert_allclose(np.asarray(ops.divide(A, B)), A / B, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.pow(A, 2.0)), A**2, rtol=1e-5)


def test_mod_c_semantics():
    # C fmodf: sign follows dividend (not Python %)
    a = np.array([5.0, -5.0, 5.0], np.float32)
    b = np.array([3.0, 3.0, -3.0], np.float32)
    np.testing.assert_allclose(np.asarray(ops.mod(a, b)), np.fmod(a, b))


def test_nd_broadcast_beyond_reference():
    # The reference only broadcasts 0d/1d/2d cases (ndarray.c:1167-1294);
    # we support full NumPy ND broadcast.
    x = np.ones((2, 3, 4), np.float32)
    y = np.arange(4, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(ops.add(x, y)), x + y)
    z = np.ones((3, 1), np.float32)
    np.testing.assert_array_equal(np.asarray(ops.multiply(x, z)), x * z)


@pytest.mark.parametrize(
    "name,ref",
    [
        ("abs", np.abs), ("sqrt", np.sqrt), ("exp", np.exp), ("exp2", np.exp2),
        ("expm1", np.expm1), ("log", np.log), ("log2", np.log2),
        ("log10", np.log10), ("log1p", np.log1p), ("sin", np.sin),
        ("cos", np.cos), ("tan", np.tan), ("sinh", np.sinh), ("cosh", np.cosh),
        ("tanh", np.tanh), ("arcsin", None), ("arctan", np.arctan),
        ("arcsinh", np.arcsinh), ("floor", np.floor), ("ceil", np.ceil),
        ("trunc", np.trunc), ("rint", np.rint), ("sign", np.sign),
        ("square", np.square), ("negative", np.negative),
        ("reciprocal", None), ("degrees", np.degrees), ("radians", np.radians),
        ("sinc", np.sinc), ("fix", np.fix),
    ],
)
def test_unary_surface(name, ref):
    x = np.array([0.1, 0.5, 0.9], np.float32)
    got = np.asarray(getattr(ops, name)(x))
    if ref is None:
        ref_map = {"arcsin": np.arcsin, "reciprocal": lambda v: 1.0 / v}
        expected = ref_map[name](x)
    else:
        expected = ref(x)
    # XLA's vectorized fp32 transcendentals are accurate to ~1e-4 relative;
    # this sits inside the 1e-4 parity budget (BASELINE.md).
    np.testing.assert_allclose(got, expected.astype(np.float32), rtol=2e-4, atol=1e-6)


def test_rsqrt():
    x = np.array([1.0, 4.0, 16.0], np.float32)
    np.testing.assert_allclose(np.asarray(ops.rsqrt(x)), 1 / np.sqrt(x), rtol=1e-3)


def test_round_half_away_from_zero():
    # C roundf semantics (double_math.c float_round), NOT banker's rounding
    x = np.array([2.5, -2.5, 0.5, -0.5, 1.4], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.round(x)), [3.0, -3.0, 1.0, -1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(ops.round(np.float32(1.2345), 2)), 1.23, atol=1e-6
    )


def test_logb():
    x = np.array([1.0, 8.0, 0.25], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.logb(x)), [0.0, 3.0, -2.0])


def test_clip():
    x = np.array([-1.0, 0.5, 2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.clip(x, 0.0, 1.0)), [0.0, 0.5, 1.0])


def test_arctan2():
    y = np.array([1.0, -1.0], np.float32)
    x = np.array([1.0, 1.0], np.float32)
    np.testing.assert_allclose(np.asarray(ops.arctan2(y, x)), np.arctan2(y, x), rtol=1e-6)


def test_maximum_minimum():
    np.testing.assert_array_equal(np.asarray(ops.maximum(A, B.T)), np.maximum(A, B.T))
    np.testing.assert_array_equal(np.asarray(ops.minimum(A, 2.5)), np.minimum(A, 2.5))
