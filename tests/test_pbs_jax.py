"""JAX batched PBS vs the NumPy golden model (bit-exact on zero noise)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_regex_tpu.params import TEST_PARAMS, TEST_PARAMS_NOISY
from fhe_regex_tpu.crypto import lwe
from fhe_regex_tpu.crypto.golden import make_lut_poly, pbs as golden_pbs
from fhe_regex_tpu.ops import pbs as jpbs


def _run_batch(params, ck, sk, msgs, funcs):
    luts = np.stack([make_lut_poly(params, f) for f in funcs])
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng) for m in msgs])
    bsk, ksk = jpbs.server_key_device_arrays(sk)
    lut_idx = jnp.asarray(np.arange(len(msgs)) % len(funcs), dtype=jnp.int32)
    out = jpbs.pbs_batch(params, bsk, ksk, jnp.asarray(luts.view(np.int32)),
                         lut_idx, jnp.asarray(cts.view(np.int32)))
    return cts, luts, np.asarray(out).view(np.uint32)


def test_pbs_batch_matches_golden_bitexact(keys):
    P = TEST_PARAMS
    ck, sk = keys
    msgs = [0, 1, 5, 7, 12, 15, 3, 9]
    funcs = [lambda x: x, lambda x: (2 * x + 3) % 16]
    cts, luts, out = _run_batch(P, ck, sk, msgs, funcs)
    for i, m in enumerate(msgs):
        want = funcs[i % 2](m)
        assert lwe.decrypt_lwe(P, ck.lwe_key, out[i]) == want
    # bit-exact against golden (zero noise -> fully deterministic pipeline)
    g = golden_pbs(P, sk.bsk, sk.ksk, cts[3], luts[1])
    assert np.array_equal(g, out[3])


def test_pbs_batch_noisy_decrypts(noisy_keys):
    P = TEST_PARAMS_NOISY
    ck, sk = noisy_keys
    msgs = [0, 4, 9, 15]
    funcs = [lambda x: (x * x) % 16]
    _, _, out = _run_batch(P, ck, sk, msgs, funcs)
    for i, m in enumerate(msgs):
        assert lwe.decrypt_lwe(P, ck.lwe_key, out[i]) == (m * m) % 16


def test_trivial_ct_through_pbs(keys):
    """Trivial (noiseless, keyless) cts run through the real pipeline —
    the reference's test strategy (engine.rs:282-286)."""
    P = TEST_PARAMS
    ck, sk = keys
    triv = np.stack([lwe.trivial_lwe(P, m) for m in [2, 13]])
    bsk, ksk = jpbs.server_key_device_arrays(sk)
    luts = jnp.asarray(make_lut_poly(P, lambda x: 15 - x)[None].view(np.int32))
    out = jpbs.pbs_batch(P, bsk, ksk, luts, jnp.zeros(2, jnp.int32),
                         jnp.asarray(triv.view(np.int32)))
    out = np.asarray(out).view(np.uint32)
    assert lwe.decrypt_lwe(P, ck.lwe_key, out[0]) == 13
    assert lwe.decrypt_lwe(P, ck.lwe_key, out[1]) == 2
