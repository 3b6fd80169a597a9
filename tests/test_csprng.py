"""Native AES-CTR CSPRNG tests (FIPS-197 vector + distribution sanity)."""

import ctypes

import numpy as np
import pytest

from fhe_regex_tpu.crypto.csprng import _LIB_PATH, _load_lib, Csprng

needs_native = pytest.mark.skipif(_load_lib() is None,
                                  reason="native lib not built (make -C native)")


@needs_native
def test_fips197_vector():
    lib = ctypes.CDLL(str(_LIB_PATH))
    key = bytes(range(16))
    pt = bytes((i * 0x11) % 256 for i in range(16))
    out = (ctypes.c_uint8 * 16)()
    lib.aes128_encrypt_block((ctypes.c_uint8 * 16)(*key),
                             (ctypes.c_uint8 * 16)(*pt), out)
    assert bytes(out).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


@needs_native
def test_aes_stream_deterministic_and_distinct():
    a = Csprng(seed=1, backend="aes")
    b = Csprng(seed=1, backend="aes")
    c = Csprng(seed=2, backend="aes")
    x = a.uniform_torus(1000)
    assert np.array_equal(x, b.uniform_torus(1000))
    assert not np.array_equal(x, c.uniform_torus(1000))


@needs_native
def test_distributions():
    rng = Csprng(seed=3, backend="aes")
    u = rng.uniform_torus(200_000).astype(np.float64)
    assert abs(u.mean() / 2**32 - 0.5) < 0.01
    b = rng.binary(100_000)
    assert set(np.unique(b)) <= {0, 1}
    assert abs(b.mean() - 0.5) < 0.01
    g = rng.gaussian_torus(200_000, std=1000.0).view(np.int32).astype(np.float64)
    assert abs(g.mean()) < 20.0
    assert abs(g.std() - 1000.0) < 20.0


def test_pcg_fallback_works():
    rng = Csprng(seed=4, backend="pcg64")
    assert rng.uniform_torus(10).shape == (10,)
    assert rng.gaussian_torus((5,), std=0.0).tolist() == [0] * 5
