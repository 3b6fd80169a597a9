"""FFT-formulation PBS (ops/pbs_fft.py) vs the jnp reference path.

limb_bits=8 must be BIT-EXACT vs the exact matmul path (measured worst f32
pipeline error 0.25 < 0.5, so rounding recovers the integers); limb_bits=16
carries a bounded FFT noise term (~2^7 per step) that still decrypts
correctly everywhere the budget admits it.
"""

import numpy as np
import jax.numpy as jnp

from fhe_regex_tpu.params import TEST_PARAMS, TEST_PARAMS_NOISY
from fhe_regex_tpu.crypto import lwe
from fhe_regex_tpu.crypto.golden import make_lut_poly
from fhe_regex_tpu.ops.pbs import make_pbs_fn, prepare_server_key
from fhe_regex_tpu.ops import pbs_fft


def test_limbs_signed_exact_mod_2_32():
    rng = np.random.default_rng(0)
    x = rng.integers(-2**31, 2**31, size=10000, dtype=np.int64).astype(np.int32)
    for plan in ((8, 8, 8, 8), (16, 16), (16, 8, 8)):
        limbs = pbs_fft._limbs_signed(x, plan)
        ws = pbs_fft.plan_weights(plan)
        for lb, bits in enumerate(plan):
            assert np.abs(limbs[lb]).max() <= 1 << (bits - 1)
        recon = sum(limbs[lb] << ws[lb] for lb in range(len(plan)))
        assert np.array_equal((recon & 0xFFFFFFFF).astype(np.uint32),
                              x.view(np.uint32))


def test_negacyclic_fft_host_exact():
    """Host f64 spectral transform round-trips the negacyclic product."""
    rng = np.random.default_rng(1)
    N = 256
    a = rng.integers(-64, 65, N)
    b = rng.integers(-128, 128, N)
    full = np.convolve(a, b)
    ref = np.zeros(N, np.int64)
    ref[:N] += full[:N]
    ref[:len(full) - N] -= full[N:]
    spec = (pbs_fft.negacyclic_fft_host(a.astype(np.float64))
            * pbs_fft.negacyclic_fft_host(b.astype(np.float64)))
    M = N // 2
    v = np.fft.ifft(spec) * np.conj(pbs_fft._twist(N))
    got = np.concatenate([v.real, v.imag])
    assert np.abs(got - ref).max() < 1e-6


def test_scramble_matches_four_step_order():
    """Host natural->scrambled reorder == the device four-step output order."""
    rng = np.random.default_rng(2)
    M = 128
    xr = rng.standard_normal(M).astype(np.float32)
    xi = rng.standard_normal(M).astype(np.float32)
    nat = np.fft.fft(xr + 1j * xi)
    M1, M2 = pbs_fft._split_factors(M)
    scr = pbs_fft._scramble(nat[None], M1, M2)[0]
    dr, di = pbs_fft._fft_fwd(jnp.asarray(xr[None]), jnp.asarray(xi[None]),
                              "matmul")
    dev = np.asarray(dr)[0] + 1j * np.asarray(di)[0]
    assert np.abs(dev - scr).max() / np.abs(nat).max() < 1e-4


def _run(params, keys, msgs, f, **opts):
    ck, sk = keys
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng) for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    ref = make_pbs_fn(prepare_server_key(params, sk, "jnp"))(luts, idx, ctsj)
    got = make_pbs_fn(prepare_server_key(params, sk, "fft", **opts))(
        luts, idx, ctsj)
    return np.asarray(ref), np.asarray(got), ck


def test_fft8_bitexact_zero_noise(keys, monkeypatch):
    monkeypatch.setenv("FHE_REGEX_FFT_LIMBS", "8")
    f = lambda x: (2 * x + 3) % 16
    msgs = [0, 1, 5, 7, 12, 15, 3, 9]
    ref, got, ck = _run(TEST_PARAMS, keys, msgs, f)
    assert np.array_equal(ref, got)
    o = got.view(np.uint32)
    dec = [lwe.decrypt_lwe(TEST_PARAMS, ck.lwe_key, o[i]) for i in range(len(msgs))]
    assert dec == [f(m) % 16 for m in msgs]


def test_fft8_bitexact_noisy(noisy_keys, monkeypatch):
    monkeypatch.setenv("FHE_REGEX_FFT_LIMBS", "8")
    f = lambda x: (x * 7 + 2) % 16
    msgs = [0, 3, 8, 15, 6, 1, 9, 12]
    ref, got, ck = _run(TEST_PARAMS_NOISY, noisy_keys, msgs, f)
    assert np.array_equal(ref, got)


def test_fft8_xla_transform_bitexact(noisy_keys, monkeypatch):
    monkeypatch.setenv("FHE_REGEX_FFT_LIMBS", "8")
    monkeypatch.setenv("FHE_REGEX_FFT_TRANSFORM", "xla")
    f = lambda x: (x + 9) % 16
    msgs = [2, 5, 10, 13, 4, 7, 11, 14]
    ref, got, ck = _run(TEST_PARAMS_NOISY, noisy_keys, msgs, f)
    assert np.array_equal(ref, got)


def test_fft_mixed_default_decrypts(noisy_keys):
    """The default plan (16,8,8): exact hi limbs, bounded lo-limb noise."""
    f = lambda x: (x * 3 + 4) % 16
    msgs = [1, 6, 11, 14, 0, 5, 8, 13]
    ref, got, ck = _run(TEST_PARAMS_NOISY, noisy_keys, msgs, f)
    P = TEST_PARAMS_NOISY
    o = got.view(np.uint32)
    dec = [lwe.decrypt_lwe(P, ck.lwe_key, o[i]) for i in range(len(msgs))]
    assert dec == [f(m) % 16 for m in msgs]


def test_fft16_rejected_at_production_params():
    """(16,16) would accumulate ~2^25.5 error over 866 steps at N=2048 —
    prepare_bsk_fft must refuse it."""
    import pytest
    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2 as P
    dummy = np.zeros((1, 1, 1, P.polynomial_size), np.uint32)
    with pytest.raises(ValueError, match="limb plan"):
        pbs_fft.prepare_bsk_fft(P, dummy, plan="16")


def test_budget_includes_fft_plan():
    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2 as P
    assert P.noise_budget_report(fft_plan=(16, 8, 8))["sigma_margin"] >= 5.0
    assert P.noise_budget_report(fft_plan=(8, 8, 8, 8))["sigma_margin"] \
        == P.noise_budget_report()["sigma_margin"]
    assert P.noise_budget_report(fft_plan=(16, 16))["sigma_margin"] < 5.0


def test_fft_production_geometry_n2048():
    """FFT backend at the FULL production GLWE geometry (N=2048 -> M=1024,
    four-step 32x32, l=3 decomposition) for BOTH limb plans, vs the exact
    jnp path.  Only the CMUX step count n is shrunk (866 -> 16) to bound
    CPU runtime — same derivation as tests/test_parallel.py's
    TEST_PROD_SHAPE.  This is the only CPU test that reaches the
    _round_mod32 fold branch (5 + 16 + log2(2048) >= 31), which never
    triggers at the N=256 test shapes above."""
    import dataclasses
    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2

    P = dataclasses.replace(
        TPU_MESSAGE_2_CARRY_2, name="TEST_PROD_SHAPE_FFT",
        lwe_dimension=16, lwe_noise_std=0.0, glwe_noise_std=0.0)
    from fhe_regex_tpu.crypto.keys import gen_keys
    ck, sk = gen_keys(P, seed=11)
    f = lambda x: (x * 3 + 1) % 16
    msgs = [0, 3, 6, 9, 12, 15, 5, 10]
    cts = np.stack([lwe.encrypt_lwe(P, ck.lwe_key, m, ck.rng) for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(P, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    ref = np.asarray(
        make_pbs_fn(prepare_server_key(P, sk, "jnp"))(luts, idx, ctsj))
    for plan in ("8", "mixed"):
        got = np.asarray(make_pbs_fn(
            prepare_server_key(P, sk, "fft", fft_plan=plan,
                               fft_transform="matmul"))(luts, idx, ctsj))
        o = got.view(np.uint32)
        dec = [lwe.decrypt_lwe(P, ck.lwe_key, o[i]) for i in range(len(msgs))]
        assert dec == [f(m) % 16 for m in msgs], (plan, dec)
        if plan == "8":
            assert np.array_equal(ref, got)


def test_fft_lowering_pins_dot_precision():
    """EVERY dot/einsum in the FFT PBS lowering must carry HIGHEST
    precision: on TPU a default-precision f32 dot runs one bf16 MXU pass,
    which with ~2^20 spectral magnitudes breaks the +-0.5 rounding
    contract (the round-2 on-chip failure, bench_fft.err 1732/1792 wrong).
    CPU tests compute true f32 and cannot catch it numerically, so pin it
    at the HLO level."""
    import re
    import jax
    from fhe_regex_tpu.params import TEST_PARAMS as P
    from fhe_regex_tpu.ops import pbs_fft as pf

    n, N = P.lwe_dimension, P.polynomial_size
    k, l = P.glwe_dimension, P.pbs_level
    B, M = 2, N // 2
    plan = pf.resolve_plan("mixed")
    L = len(plan)
    bsk_spec = jnp.zeros((n, (k + 1) * l, k + 1, L, 2, M), jnp.float32)
    ksk = jnp.zeros((4, k * N * P.ks_level, n + 1), jnp.int8)
    luts = jnp.zeros((1, N), jnp.int32)
    idx = jnp.zeros(B, jnp.int32)
    cts = jnp.zeros((B, n + 1), jnp.int32)
    txt = jax.jit(
        pf.pbs_batch_fft, static_argnums=(0, 5, 6)
    ).lower(P, bsk_spec, ksk, luts, idx, plan, "matmul", cts).as_text()
    # flag any dot whose BOTH operands are f32 without pinned precision
    # (bf16-operand dots like the keyswitch are exact by range analysis)
    bad = [ln.strip() for ln in txt.splitlines()
           if "dot_general" in ln
           and re.search(r"\(tensor<[^)]*f32>,\s*tensor<[^)]*f32>\)", ln)
           and not re.search(r"precision\s*=\s*\[HIGHEST", ln)]
    assert not bad, "f32 dots without HIGHEST precision:\n" + "\n".join(bad)


def test_fft16_rejected_everywhere():
    """(16,16) puts a noisy 16-bit limb at weight 2^16; with the analytic
    f32-ulp floor in the noise model (advisor, round 2) that is
    inadmissible at EVERY parameter set — a 16-bit limb is only admissible
    at weight 2^0 (the 'mixed' plan, whose noisy-limb numeric behavior is
    covered by test_fft_mixed_default_decrypts)."""
    import pytest
    dummy = np.zeros(
        (1, 1, 1, TEST_PARAMS_NOISY.polynomial_size), np.uint32)
    with pytest.raises(ValueError, match="limb plan"):
        pbs_fft.prepare_bsk_fft(TEST_PARAMS_NOISY, dummy, plan="16")


def test_fft_mixed_phases_match_reference(noisy_keys):
    """'mixed'-plan outputs: ciphertext coefficients legitimately diverge
    from the exact path (digit representations differ), but the decryption
    PHASES must agree far inside the margin."""
    f = lambda x: (x * 5 + 1) % 16
    msgs = [0, 4, 9, 15, 2, 6, 11, 13]
    ref, got, ck = _run(TEST_PARAMS_NOISY, noisy_keys, msgs, f)
    P = TEST_PARAMS_NOISY

    def phases(c):
        n = P.lwe_dimension
        a = c[:, :n].astype(np.int64)
        b = c[:, n].astype(np.int64)
        s = ck.lwe_key.astype(np.int64)
        return (b - a @ s) & 0xFFFFFFFF
    d = (phases(got.view(np.uint32)) - phases(ref.view(np.uint32))) & 0xFFFFFFFF
    d = np.abs(((d + (1 << 31)) & 0xFFFFFFFF) - (1 << 31))
    assert d.max() < 2 ** (P.torus_bits - P.message_bits - P.carry_bits - 3)
