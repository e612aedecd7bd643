"""NDArray object-API tests.

Mirrors the reference's class protocol surface: operators
(ndarray_do_operation, numpower.c:193-282), ArrayAccess/Iterator/Countable
(numpower.c:4899-4957), 0-d → float returns (numpower.c:142-149),
serialization (numpower.c:4959-4991), and the buffer-registry leak counters
(src/buffer.c).
"""

import pickle

import numpy as np
import pytest

from numpower_tpu import NDArray, runtime


def test_operators():
    a = NDArray([[1, 2], [3, 4]])
    b = NDArray([[5, 6], [7, 8]])
    assert (a + b).toArray() == [[6, 8], [10, 12]]
    assert (a - b).toArray() == [[-4, -4], [-4, -4]]
    assert (a * 2).toArray() == [[2, 4], [6, 8]]
    assert (a / 2).toArray() == [[0.5, 1], [1.5, 2]]
    assert (a ** 2).toArray() == [[1, 4], [9, 16]]
    assert (a % 2).toArray() == [[1, 0], [1, 0]]
    assert (a @ b).toArray() == [[19, 22], [43, 50]]
    assert (-a).toArray() == [[-1, -2], [-3, -4]]
    assert abs(NDArray([-1, 2])).toArray() == [1, 2]
    assert (2 + a).toArray() == [[3, 4], [5, 6]]
    assert (10 - a).toArray() == [[9, 8], [7, 6]]


def test_object_compare_is_array_equal():
    # numpower.c:175-186: == compares contents
    a = NDArray([[1, 2], [3, 4]])
    assert a == NDArray([[1, 2], [3, 4]])
    assert a == [[1, 2], [3, 4]]
    assert a != NDArray([[1, 2], [3, 5]])


def test_0d_returns_float():
    a = NDArray([[1, 2], [3, 4]])
    s = a.sum()
    assert isinstance(s, float) and s == 10.0
    assert isinstance(a.mean(), float)
    assert isinstance(a.min(), float)


def test_array_access():
    a = NDArray([[1, 2], [3, 4]])
    assert a[0].toArray() == [1, 2]
    assert a[0, 1] == 2.0  # scalar access -> float
    a[0] = [9, 9]
    assert a.toArray() == [[9, 9], [3, 4]]
    a[1, 0] = 7.0
    assert a.toArray() == [[9, 9], [7, 4]]


def test_iterator_countable():
    a = NDArray([[1, 2], [3, 4], [5, 6]])
    assert len(a) == 3
    rows = [row.toArray() for row in a]
    assert rows == [[1, 2], [3, 4], [5, 6]]


def test_shape_size_ndim():
    a = NDArray.zeros((2, 3, 4))
    assert a.shape == (2, 3, 4)
    assert a.size == 24
    assert a.ndim == 3


def test_static_constructors():
    assert NDArray.identity(2).toArray() == [[1, 0], [0, 1]]
    assert NDArray.full((2, 2), 3).toArray() == [[3, 3], [3, 3]]
    # reference argument order: arange(stop, start, step)
    assert NDArray.arange(5).toArray() == [0, 1, 2, 3, 4]
    assert NDArray.arange(5, 1).toArray() == [1, 2, 3, 4]


def test_fill_rebinds():
    a = NDArray.zeros((2, 2))
    a.fill(7.0)
    assert a.toArray() == [[7, 7], [7, 7]]


def test_method_chaining():
    a = NDArray([[1.0, 4.0], [9.0, 16.0]])
    assert a.sqrt().toArray() == [[1, 2], [3, 4]]
    assert a.transpose().toArray() == [[1, 9], [4, 16]]
    assert a.T.flatten().toArray() == [1, 9, 4, 16]


def test_pickle_roundtrip():
    a = NDArray([[1, 2], [3, 4]])
    b = pickle.loads(pickle.dumps(a))
    assert b.toArray() == a.toArray()


def test_contains():
    a = NDArray([1.0, 2.0, 3.0])
    assert 2.0 in a
    assert 9.0 not in a


def test_runtime_registry_counts():
    before = runtime.stats()
    arrays = [NDArray.zeros((4, 4)) for _ in range(10)]
    mid = runtime.stats()
    assert mid["total_registered"] >= before["total_registered"] + 10
    assert mid["live_count"] >= before["live_count"] + 10
    del arrays
    import gc

    gc.collect()
    after = runtime.stats()
    # the 10 wrappers were unregistered (leak accounting, buffer.c analogue)
    assert after["live_count"] <= mid["live_count"] - 10


def test_save_load_roundtrip(tmp_path):
    a = NDArray([[1.5, 2.5], [3.5, 4.5]])
    path = str(tmp_path / "arr.npy")
    a.save(path)
    b = NDArray.load(path)
    assert b.toArray() == a.toArray()


def test_device_shims():
    a = NDArray([[1, 2], [3, 4]])
    c = a.cpu()
    assert c.toArray() == a.toArray()
    g = a.gpu()  # no accelerator under the test env; still returns an array
    assert g.toArray() == a.toArray()
