"""Manipulation parity tests.

Mirrors /root/reference/tests/manipulation/*.phpt (transpose, reshape,
append, flatten, expand_dims) plus ops the reference declares but leaves
broken/empty (flip — manipulation.c:1075-1079).
"""

import numpy as np
import pytest

from numpower_tpu import ops

A = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
M = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)


def test_transpose():
    np.testing.assert_array_equal(np.asarray(ops.transpose(M)), M.T)
    np.testing.assert_array_equal(np.asarray(ops.transpose(A, (2, 0, 1))), A.transpose(2, 0, 1))


def test_reshape_flatten():
    np.testing.assert_array_equal(np.asarray(ops.reshape(A, (6, 4))), A.reshape(6, 4))
    np.testing.assert_array_equal(np.asarray(ops.reshape(A, -1)), A.ravel())
    np.testing.assert_array_equal(np.asarray(ops.flatten(A)), A.ravel())


def test_flip_implemented():
    # reference NDArray_Flip is empty (manipulation.c:1075-1079); ours works
    np.testing.assert_array_equal(np.asarray(ops.flip(M)), np.flip(M))
    np.testing.assert_array_equal(np.asarray(ops.flip(M, 0)), np.flip(M, 0))
    np.testing.assert_array_equal(np.asarray(ops.flip(A, (0, 2))), np.flip(A, (0, 2)))


def test_expand_squeeze():
    np.testing.assert_array_equal(np.asarray(ops.expand_dims(M, 0)), M[None])
    np.testing.assert_array_equal(np.asarray(ops.expand_dims(M, -1)), M[..., None])
    np.testing.assert_array_equal(np.asarray(ops.squeeze(M[None])), M)


def test_axis_moves():
    np.testing.assert_array_equal(np.asarray(ops.swapaxes(A, 0, 2)), A.swapaxes(0, 2))
    np.testing.assert_array_equal(np.asarray(ops.rollaxis(A, 2)), np.rollaxis(A, 2))
    np.testing.assert_array_equal(np.asarray(ops.moveaxis(A, 0, -1)), np.moveaxis(A, 0, -1))


def test_concat_family():
    np.testing.assert_array_equal(
        np.asarray(ops.concatenate([M, M], axis=0)), np.concatenate([M, M], 0)
    )
    np.testing.assert_array_equal(
        np.asarray(ops.concatenate([M, M], axis=1)), np.concatenate([M, M], 1)
    )
    np.testing.assert_array_equal(np.asarray(ops.concatenate([M, M], axis=None)),
                                  np.concatenate([M.ravel(), M.ravel()]))
    np.testing.assert_array_equal(np.asarray(ops.vstack([M, M])), np.vstack([M, M]))
    np.testing.assert_array_equal(np.asarray(ops.hstack([M, M])), np.hstack([M, M]))
    np.testing.assert_array_equal(np.asarray(ops.dstack([M, M])), np.dstack([M, M]))
    v = np.array([1.0, 2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.column_stack([v, v])), np.column_stack([v, v]))


def test_append():
    v = np.array([1.0, 2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.append(v, [3.0])), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(ops.append(M, M, axis=0)), np.append(M, M, 0))


def test_atleast():
    assert ops.atleast_1d(np.float32(5)).shape == (1,)
    assert ops.atleast_2d(np.array([1.0, 2.0], np.float32)).shape == (1, 2)
    assert ops.atleast_3d(M).shape == (2, 2, 1)


def test_slice_semantics():
    # Slice_GetIndices (indexing.c:59-107): negative indices, step, clamping
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(ops.slice(x, [2, 7])), x[2:7])
    np.testing.assert_array_equal(np.asarray(ops.slice(x, [2, 9, 2])), x[2:9:2])
    np.testing.assert_array_equal(np.asarray(ops.slice(x, [-3])), x[-3:])
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(ops.slice(m, [0, 2], [1, 3])), m[0:2, 1:3])
    np.testing.assert_array_equal(np.asarray(ops.slice(m, 1)), m[1])


def test_broadcast_utilities():
    assert ops.is_broadcastable(np.ones((2, 3)), np.ones((3,)))
    assert not ops.is_broadcastable(np.ones((2, 3)), np.ones((4,)))
    np.testing.assert_array_equal(
        np.asarray(ops.broadcast_to(np.ones(3), (2, 3))), np.ones((2, 3))
    )


def test_tile_repeat_roll():
    v = np.array([1.0, 2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.tile(v, 2)), np.tile(v, 2))
    np.testing.assert_array_equal(np.asarray(ops.repeat(v, 2)), np.repeat(v, 2))
    np.testing.assert_array_equal(np.asarray(ops.roll(v, 1)), np.roll(v, 1))
