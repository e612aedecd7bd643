"""RNG distribution tests + IO tests.

Reference tests/random/*.phpt check shapes and error behavior; draws are
irreproducible rand() so SURVEY.md §7 directs distribution-level checks for
the keyed jax.random redesign.
"""

import numpy as np
import pytest

from numpower_tpu import ops
from numpower_tpu.ops import random as ndrand


def test_standard_normal_shape_and_moments():
    x = np.asarray(ndrand.standard_normal((200, 200), key=ndrand.key(0)))
    assert x.shape == (200, 200)
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 1.0) < 0.02


def test_normal_loc_scale():
    x = np.asarray(ndrand.normal((100, 100), loc=5.0, scale=2.0, key=ndrand.key(1)))
    assert abs(x.mean() - 5.0) < 0.1
    assert abs(x.std() - 2.0) < 0.1


def test_uniform_range():
    x = np.asarray(ndrand.uniform((100, 100), low=2.0, high=4.0, key=ndrand.key(2)))
    assert x.min() >= 2.0 and x.max() < 4.0
    assert abs(x.mean() - 3.0) < 0.05


def test_poisson_moments():
    x = np.asarray(ndrand.poisson((100, 100), lam=4.0, key=ndrand.key(3)))
    assert abs(x.mean() - 4.0) < 0.15
    assert abs(x.var() - 4.0) < 0.3


def test_binomial_moments():
    x = np.asarray(ndrand.random_binomial((100, 100), n=10, p=0.3, key=ndrand.key(4)))
    assert abs(x.mean() - 3.0) < 0.1
    assert x.min() >= 0 and x.max() <= 10


def test_seeded_reproducibility():
    # capability the reference lacks (unseedable rand())
    ndrand.seed(123)
    a = np.asarray(ndrand.uniform((10,)))
    ndrand.seed(123)
    b = np.asarray(ndrand.uniform((10,)))
    np.testing.assert_array_equal(a, b)


def test_explicit_keys_reproducible():
    a = np.asarray(ndrand.normal((5,), key=ndrand.key(7)))
    b = np.asarray(ndrand.normal((5,), key=ndrand.key(7)))
    np.testing.assert_array_equal(a, b)


def test_save_load_roundtrip(tmp_path):
    a = ops.array([[1.5, -2.5], [3.0, 4.0]])
    p = str(tmp_path / "x.npy")
    ops.save(p, a)
    b = ops.load(p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_large_uses_native(tmp_path):
    from numpower_tpu import runtime

    a = ops.arange(100000).reshape((100, 1000))
    p = str(tmp_path / "big.npy")
    ops.save(p, a)
    b = ops.load(p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # file must be numpy-compatible
    np.testing.assert_array_equal(np.load(p), np.asarray(a))


def test_serialize_roundtrip():
    a = ops.array([[1.0, 2.0]])
    data = ops.serialize(a)
    b = ops.deserialize(data)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_to_list():
    assert ops.to_list(ops.array([[1, 2], [3, 4]])) == [[1.0, 2.0], [3.0, 4.0]]


def test_image_roundtrip():
    img = (np.arange(2 * 3 * 3) % 256).reshape(2, 3, 3).astype(np.uint8)
    t = ops.from_image(img, channel_first=True)
    assert t.shape == (3, 2, 3)  # CHW
    back = ops.to_image(t, channel_first=True)
    np.testing.assert_array_equal(back, img)
    tn = ops.from_image(img, channel_first=False, normalize=True)
    assert tn.shape == (2, 3, 3)
    assert float(np.asarray(tn).max()) <= 1.0


def test_load_large_uses_mmap_reader(tmp_path):
    """VERDICT r1 #6: ops.load must route >=1MB files through the native
    mmap reader (runtime.npy_read_fast) and return identical data."""
    import numpy as np

    from numpower_tpu import ops, runtime

    rng = np.random.default_rng(0)
    arr = rng.standard_normal((512, 1024)).astype(np.float32)  # 2 MB
    p = str(tmp_path / "big.npy")
    np.save(p, arr)
    if runtime.native_available():
        fast = runtime.npy_read_fast(p)
        assert fast is not None and fast.dtype == np.float32
        np.testing.assert_array_equal(fast, arr)
    loaded = ops.load(p)
    np.testing.assert_array_equal(np.asarray(loaded), arr)


def test_npy_read_fast_rejects_fortran(tmp_path):
    import numpy as np

    from numpower_tpu import runtime

    if not runtime.native_available():
        import pytest

        pytest.skip("native runtime unavailable")
    arr = np.asfortranarray(np.arange(12.0, dtype=np.float32).reshape(3, 4))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    assert runtime.npy_read_fast(p) is None  # caller falls back to np.load


def test_set_device_selects_accelerator(monkeypatch):
    """VERDICT r1 #6: setDevice(i) must be honored by subsequent gpu()
    placements (reference numpower.c:615-635)."""
    import numpower_tpu.ndarray as nda

    class FakeDev:
        def __init__(self, platform, i):
            self.platform, self.id = platform, i

    devs = [FakeDev("cpu", 0), FakeDev("tpu", 1), FakeDev("tpu", 2)]
    monkeypatch.setattr(nda.jax, "devices", lambda *a: devs)
    try:
        nda.NDArray.setDevice(1)
        assert nda._accel_device() is devs[2]  # accels = [devs[1], devs[2]]
        nda.NDArray.setDevice(0)
        assert nda._accel_device() is devs[1]
        nda.NDArray.setDevice(5)  # modulo wraparound
        assert nda._accel_device() is devs[2]
    finally:
        nda.NDArray.setDevice(0)
