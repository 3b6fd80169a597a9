"""Native single-thread f64-FFT PBS (native/pbs_fft.cpp) vs the golden model.

The measured-CPU-baseline engine must produce ciphertexts that decrypt to
the same LUT outputs as the exact golden pipeline (bit-exactness is not
expected — the f64 transform carries the same rounding floor as the
reference's concrete-fft; the decrypt gate is the correctness contract,
exactly as for the reference itself)."""

import dataclasses

import numpy as np
import pytest

from fhe_regex_tpu.crypto import golden, lwe as L
from fhe_regex_tpu.crypto.keys import gen_keys
from fhe_regex_tpu.crypto.native_fft import NativeFftPbs, available
from fhe_regex_tpu.params import TEST_PARAMS_64

pytestmark = pytest.mark.skipif(not available(),
                                reason="native/libpbsfft.so not built")

# noisy small 64-bit set: real noise, fast keygen (l=3 exercises the
# generic multi-level decompose path too)
P = dataclasses.replace(TEST_PARAMS_64, name="T64_FFT",
                        lwe_noise_std=float(1 << 18),
                        glwe_noise_std=float(1 << 16))


@pytest.fixture(scope="module")
def keys():
    return gen_keys(P, seed=31)


def test_fft_pbs_decrypts_all_slots(keys):
    ck, sk = keys
    eng = NativeFftPbs(P, sk.bsk, sk.ksk)
    f = lambda m: (3 * m + 1) % 16
    lut = golden.make_lut_poly(P, f)
    for m in range(16):
        ct = L.encrypt_lwe(P, ck.lwe_key, m, ck.rng)
        got = L.decrypt_lwe(P, ck.lwe_key, eng.pbs(ct, lut))
        assert got == f(m), m


def test_fft_pbs_output_close_to_golden(keys):
    """Same input ct through golden (exact) and FFT paths: phases must
    agree to well within the LUT margin (the f64 rounding floor)."""
    ck, sk = keys
    eng = NativeFftPbs(P, sk.bsk, sk.ksk)
    lut = golden.make_lut_poly(P, lambda m: int(m == 3))
    ct = L.encrypt_lwe(P, ck.lwe_key, 3, ck.rng)
    a = golden.pbs(P, sk.bsk, sk.ksk, ct, lut)
    b = eng.pbs(ct, lut)
    n = P.lwe_dimension
    with np.errstate(over="ignore"):
        pa = (a[n] - (a[:n] * ck.lwe_key.astype(np.uint64)).sum()).astype(
            np.uint64)
        pb = (b[n] - (b[:n] * ck.lwe_key.astype(np.uint64)).sum()).astype(
            np.uint64)
        d = np.int64(pa - pb)
    assert abs(int(d)) < P.delta // 64   # far inside the decision margin


def test_fft_pbs_rejects_32bit():
    from fhe_regex_tpu.params import TEST_PARAMS
    with pytest.raises(ValueError, match="64-bit"):
        NativeFftPbs(TEST_PARAMS, np.zeros(1), np.zeros(1))
