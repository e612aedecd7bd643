"""Logic + reduction parity tests.

Mirrors /root/reference/tests/logic/*.phpt (one file per comparison op,
fp32 0/1 mask convention) and the reduce machinery semantics
(SURVEY.md §3.4, §7 hard parts: NaN propagation, population std,
linear-interpolation quantile).
"""

import jax.numpy as jnp
import numpy as np

from numpower_tpu import ops

A = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)


def test_comparisons_fp32_masks():
    # reference logic.c produces fp32 0/1 arrays, not bools
    m = ops.equal(A, np.float32(2.0))
    assert m.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(m), [[0, 1], [0, 0]])
    np.testing.assert_array_equal(np.asarray(ops.greater(A, 2.0)), [[0, 0], [1, 1]])
    np.testing.assert_array_equal(np.asarray(ops.greater_equal(A, 2.0)), [[0, 1], [1, 1]])
    np.testing.assert_array_equal(np.asarray(ops.less(A, 3.0)), [[1, 1], [0, 0]])
    np.testing.assert_array_equal(np.asarray(ops.less_equal(A, 3.0)), [[1, 1], [1, 0]])
    np.testing.assert_array_equal(np.asarray(ops.not_equal(A, 1.0)), [[0, 1], [1, 1]])


def test_all_allclose_array_equal():
    assert float(ops.all(np.ones((3, 3), np.float32))) == 1.0
    assert float(ops.all(np.array([1.0, 0.0], np.float32))) == 0.0
    assert ops.allclose(A, A + 1e-9)
    assert not ops.allclose(A, A + 1.0)
    assert ops.array_equal(A, A.copy())
    assert not ops.array_equal(A, A.T)


def test_sum_prod_axis():
    np.testing.assert_array_equal(np.asarray(ops.sum(A)), A.sum())
    np.testing.assert_array_equal(np.asarray(ops.sum(A, axis=0)), A.sum(0))
    np.testing.assert_array_equal(np.asarray(ops.sum(A, axis=1, keepdims=True)), A.sum(1, keepdims=True))
    np.testing.assert_array_equal(np.asarray(ops.prod(A, axis=1)), A.prod(1))


def test_mean_median():
    assert float(ops.mean(A)) == A.mean()
    np.testing.assert_array_equal(np.asarray(ops.mean(A, axis=0)), A.mean(0))
    x = np.array([3.0, 1.0, 4.0, 1.0, 5.0], np.float32)
    assert float(ops.median(x)) == np.median(x)
    x_even = np.array([3.0, 1.0, 4.0, 2.0], np.float32)
    assert float(ops.median(x_even)) == np.median(x_even)  # midpoint rule


def test_min_max_axis():
    np.testing.assert_array_equal(np.asarray(ops.min(A, axis=0)), A.min(0))
    np.testing.assert_array_equal(np.asarray(ops.max(A, axis=1)), A.max(1))
    assert float(ops.max(A)) == 4.0


def test_argminmax_nan_propagation():
    # calculation.c:15-27: NaN wins (first NaN index returned)
    x = np.array([1.0, np.nan, 0.5], np.float32)
    assert int(ops.argmin(x)) == 1
    assert int(ops.argmax(x)) == 1
    y = np.array([[1.0, 5.0], [np.nan, 0.0]], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.argmax(y, axis=1)), np.argmax(y, 1))


def test_argminmax_keepdims():
    np.testing.assert_array_equal(
        np.asarray(ops.argmax(A, axis=1, keepdims=True)),
        np.argmax(A, 1, keepdims=True),
    )
    assert ops.argmax(A, keepdims=True).shape == (1, 1)


def test_std_population():
    # statistics.c:88-103 — POPULATION std (ddof=0)
    x = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    np.testing.assert_allclose(float(ops.std(x)), x.std(ddof=0), rtol=1e-6)
    np.testing.assert_allclose(float(ops.variance(x)), x.var(ddof=0), rtol=1e-6)


def test_quantile_linear_interpolation():
    # statistics.c:32-44 — linear interpolation
    x = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    np.testing.assert_allclose(float(ops.quantile(x, 0.5)), 2.5, rtol=1e-6)
    np.testing.assert_allclose(float(ops.quantile(x, 0.25)), np.quantile(x, 0.25), rtol=1e-6)


def test_average_weighted():
    x = np.array([1.0, 2.0, 3.0], np.float32)
    w = np.array([3.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(float(ops.average(x, weights=w)), np.average(x, weights=w), rtol=1e-6)
    np.testing.assert_allclose(float(ops.average(x)), x.mean(), rtol=1e-6)


def test_where_isnan():
    x = np.array([1.0, np.nan, 3.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.isnan(x)), [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(
        np.asarray(ops.where(ops.isnan(x), 0.0, x)), [1.0, 0.0, 3.0]
    )


def test_sort_take():
    x = np.array([3.0, 1.0, 2.0], np.float32)
    np.testing.assert_array_equal(np.asarray(ops.sort(x)), np.sort(x))
    np.testing.assert_array_equal(np.asarray(ops.argsort(x)), np.argsort(x))
    np.testing.assert_array_equal(np.asarray(ops.take(x, [2, 0])), [2.0, 3.0])
    assert int(ops.searchsorted(np.sort(x), 1.5)) == 1


def test_ndarray_astype_item_sort():
    from numpower_tpu import NDArray

    a = NDArray([3.0, 1.0, 2.0])
    assert a.astype("int32").dtype == jnp.int32
    # double64 resolves (jax demotes to fp32 unless x64 is enabled)
    assert a.astype("double64").dtype in (jnp.float64, jnp.float32)
    assert a.sort().toArray() == [1.0, 2.0, 3.0]
    assert NDArray([7.0]).item() == 7.0
