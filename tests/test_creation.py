"""Initializer parity tests.

Mirrors /root/reference/tests/initializers/*.phpt (array/arange/identity/
ones/zeros golden-output tests) with value assertions instead of exact string
matching.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from numpower_tpu import ops


def test_array_nested():
    a = ops.array([[1, 2], [3, 4]])
    assert a.shape == (2, 2)
    assert a.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), [[1, 2], [3, 4]])


def test_array_scalar_is_0d():
    a = ops.array(5)
    assert a.shape == ()
    assert float(a) == 5.0


def test_zeros_ones_full():
    np.testing.assert_array_equal(np.asarray(ops.zeros((2, 3))), np.zeros((2, 3)))
    np.testing.assert_array_equal(np.asarray(ops.ones(4)), np.ones(4))
    np.testing.assert_array_equal(np.asarray(ops.full((2, 2), 7.5)), np.full((2, 2), 7.5))


def test_identity_eye():
    np.testing.assert_array_equal(np.asarray(ops.identity(3)), np.eye(3))
    np.testing.assert_array_equal(np.asarray(ops.eye(2, 4, k=1)), np.eye(2, 4, k=1))


def test_arange():
    np.testing.assert_array_equal(np.asarray(ops.arange(5)), np.arange(5))
    np.testing.assert_array_equal(np.asarray(ops.arange(1, 10, 2)), np.arange(1, 10, 2))
    assert ops.arange(5).dtype == jnp.float32  # fp32 default like reference


def test_diag_roundtrip():
    m = ops.diag([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(m), np.diag([1, 2, 3]))
    np.testing.assert_array_equal(np.asarray(ops.diagonal(m)), [1, 2, 3])


def test_fill_copy():
    a = ops.zeros((2, 2))
    b = ops.fill(a, 3.0)
    np.testing.assert_array_equal(np.asarray(b), np.full((2, 2), 3.0))
    c = ops.copy(b)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(b))


def test_linspace():
    np.testing.assert_allclose(
        np.asarray(ops.linspace(0, 1, 5)), np.linspace(0, 1, 5), rtol=1e-6
    )


def test_dtype_string_registry():
    # reference types.c: "float32" / "double64" descriptors
    from numpower_tpu import ops

    assert ops.zeros((2,), dtype="float32").dtype == jnp.float32
    assert ops.get_type_size("float32") == 4
    assert ops.get_type_size("double64") == 8
    assert ops.is_type("float32", "float32")
    assert not ops.is_type("float32", "double64")
    a = ops.array([1, 2], dtype="float32")
    assert a.dtype == jnp.float32
    with pytest.raises(ValueError):
        ops.zeros((2,), dtype="floatX")
