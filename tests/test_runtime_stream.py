"""Native scenario-stream data-loader tests."""

import numpy as np
import pytest

from numpower_tpu import runtime
from numpower_tpu.runtime.stream import ScenarioStream


def test_native_lib_builds():
    assert runtime.native_available()


def test_stream_normal_statistics():
    with ScenarioStream(batch=512, shape=(16,), seed=1, dist="normal",
                        scale=2.0) as s:
        assert s.native
        batches = [next(s) for _ in range(4)]
    all_data = np.concatenate(batches)
    assert all_data.shape == (2048, 16)
    assert abs(all_data.mean()) < 0.15
    assert abs(all_data.std() - 2.0) < 0.15


def test_stream_uniform_bounds():
    with ScenarioStream(batch=256, shape=(8, 4), seed=2, dist="uniform",
                        scale=0.5) as s:
        w = next(s)
    assert w.shape == (256, 8, 4)
    assert w.min() >= -0.5 and w.max() < 0.5
    assert abs(w.mean()) < 0.05


def test_stream_deterministic_per_seed():
    with ScenarioStream(batch=64, shape=(4,), seed=7) as s1:
        a1, a2 = next(s1), next(s1)
    with ScenarioStream(batch=64, shape=(4,), seed=7) as s2:
        b1, b2 = next(s2), next(s2)
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)
    assert not np.array_equal(a1, a2)  # different batches differ


def test_stream_many_batches_ordered():
    # exercise the ring buffer across many acquire/release cycles
    with ScenarioStream(batch=32, shape=(2,), seed=3, n_slots=2, n_threads=3) as s:
        sums = [float(next(s).sum()) for _ in range(50)]
    with ScenarioStream(batch=32, shape=(2,), seed=3, n_slots=4, n_threads=1) as s:
        sums2 = [float(next(s).sum()) for _ in range(50)]
    # order and content independent of slot/thread config
    np.testing.assert_allclose(sums, sums2, rtol=1e-6)


def test_stream_fallback_when_no_native(monkeypatch):
    monkeypatch.setattr(runtime, "_load", lambda: None)
    with ScenarioStream(batch=16, shape=(3,), seed=0) as s:
        assert not s.native
        w = next(s)
    assert w.shape == (16, 3) and w.dtype == np.float32
