"""Pallas blind-rotation kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles to Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from fhe_regex_tpu.params import TEST_PARAMS, TEST_PARAMS_NOISY
from fhe_regex_tpu.crypto import lwe
from fhe_regex_tpu.crypto.golden import make_lut_poly
from fhe_regex_tpu.ops.pbs import make_pbs_fn, prepare_server_key
from fhe_regex_tpu.ops.pbs_pallas import _limbs_int8


def test_limb_decomposition_exact_mod_2_32():
    rng = np.random.default_rng(0)
    x = rng.integers(-2**31, 2**31, size=10000, dtype=np.int64).astype(np.int32)
    limbs = _limbs_int8(x).astype(np.int64)
    recon = sum(limbs[..., l] << (8 * l) for l in range(4))
    assert np.array_equal((recon & 0xFFFFFFFF).astype(np.uint32), x.view(np.uint32))


def _compare(params, keys, msgs, f):
    ck, sk = keys
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng) for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    ref = make_pbs_fn(prepare_server_key(params, sk, "jnp"))(luts, idx, ctsj)
    pal = make_pbs_fn(prepare_server_key(params, sk, "pallas"))(luts, idx, ctsj)
    assert np.array_equal(np.asarray(ref), np.asarray(pal))
    o = np.asarray(pal).view(np.uint32)
    got = [lwe.decrypt_lwe(params, ck.lwe_key, o[i]) for i in range(len(msgs))]
    assert got == [f(m) % 16 for m in msgs]


def test_pallas_pbs_bitexact_zero_noise(keys):
    _compare(TEST_PARAMS, keys, [0, 1, 5, 7, 12, 15, 3, 9],
             lambda x: (2 * x + 3) % 16)


def _compare_fused(params, keys, msgs, f, stack_rows=False, bank_split=False):
    ck, sk = keys
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng) for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    ref = make_pbs_fn(prepare_server_key(params, sk, "jnp"))(luts, idx, ctsj)
    fus = make_pbs_fn(prepare_server_key(params, sk, "pallas-fused",
                                         stack_rows=stack_rows,
                                         bank_split=bank_split))(
        luts, idx, ctsj)
    assert np.array_equal(np.asarray(ref), np.asarray(fus))
    o = np.asarray(fus).view(np.uint32)
    got = [lwe.decrypt_lwe(params, ck.lwe_key, o[i]) for i in range(len(msgs))]
    assert got == [f(m) % 16 for m in msgs]


def test_fused_blindrot_bitexact_zero_noise(keys):
    """Single-launch blind rotation == jnp reference path, bit-exact."""
    _compare_fused(TEST_PARAMS, keys, [0, 1, 5, 7, 12, 15, 3, 9],
                   lambda x: (2 * x + 3) % 16)


def test_fused_blindrot_bitexact_noisy(noisy_keys):
    _compare_fused(TEST_PARAMS_NOISY, noisy_keys, [0, 3, 8, 15, 6, 1, 9, 12],
                   lambda x: (x * 7 + 2) % 16)


def test_fused_blindrot_stack_rows_bitexact(keys):
    """Deep-K (stacked-row) external product == jnp reference, bit-exact."""
    _compare_fused(TEST_PARAMS, keys, [0, 1, 5, 7, 12, 15, 3, 9],
                   lambda x: (2 * x + 3) % 16, stack_rows=True)


def test_fused_blindrot_stack_rows_noisy(noisy_keys):
    _compare_fused(TEST_PARAMS_NOISY, noisy_keys, [0, 3, 8, 15, 6, 1, 9, 12],
                   lambda x: (x * 7 + 2) % 16, stack_rows=True)


def test_fused_blindrot_bank_split_bitexact(noisy_keys):
    """packed-roll + in-kernel limb extraction == the per-limb int32 build."""
    _compare_fused(TEST_PARAMS_NOISY, noisy_keys, [0, 3, 8, 15, 6, 1, 9, 12],
                   lambda x: (x * 7 + 2) % 16, stack_rows=True, bank_split=True)
    _compare_fused(TEST_PARAMS_NOISY, noisy_keys, [2, 5, 10, 13, 4, 7, 11, 14],
                   lambda x: (x + 9) % 16, bank_split=True)


def test_pallas_pbs_noisy(noisy_keys):
    _compare(TEST_PARAMS_NOISY, noisy_keys, [0, 4, 9, 15, 2, 6, 11, 13],
             lambda x: (x * 5 + 1) % 16)


def _compare_bg(params, keys, msgs, f):
    ck, sk = keys
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng)
                    for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    ref = make_pbs_fn(prepare_server_key(params, sk, "jnp"))(luts, idx, ctsj)
    got = make_pbs_fn(prepare_server_key(params, sk, "pallas-bg"))(
        luts, idx, ctsj)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    o = np.asarray(got).view(np.uint32)
    dec = [lwe.decrypt_lwe(params, ck.lwe_key, o[i]) for i in range(len(msgs))]
    assert dec == [f(m) % 16 for m in msgs]


def test_bg_blindrot_bitexact_zero_noise(keys):
    """Batch-grid (B-independent-compile) blind rotation == jnp reference,
    bit-exact, at NB=2 blocks."""
    _compare_bg(TEST_PARAMS, keys,
                [0, 1, 5, 7, 12, 15, 3, 9, 2, 4, 6, 8, 10, 11, 13, 14],
                lambda x: (2 * x + 3) % 16)


def test_bg_blindrot_interleave_bitexact(noisy_keys):
    """The software-interleaved schedule (stage-1 of component c+1 under
    the MXU dots of component c) must be BIT-EXACT vs the serial order —
    partial external products commute mod 2^32."""
    params = TEST_PARAMS_NOISY
    ck, sk = noisy_keys
    msgs = [0, 3, 8, 15, 6, 1, 9, 12, 2, 5, 10, 13, 4, 7, 11, 14]
    f = lambda x: (x * 7 + 2) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng)
                    for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    from fhe_regex_tpu.ops import pbs_pallas as pp
    from fhe_regex_tpu.ops.pbs import mod_switch
    dev = prepare_server_key(params, sk, "pallas-bg")
    ms = mod_switch(params, jnp.asarray(cts.view(np.int32)))
    ser = pp.blind_rotate_fused_bg(params, dev.bsk_raw, luts, idx, ms,
                                   interleave=False)
    inter = pp.blind_rotate_fused_bg(params, dev.bsk_raw, luts, idx, ms,
                                     interleave=True)
    assert np.array_equal(np.asarray(ser), np.asarray(inter))
    # block-major: batch blocks outer, acc resident for all steps — same
    # math in a different grid order, bit-exact (with + without interleave)
    bm = pp.blind_rotate_fused_bg(params, dev.bsk_raw, luts, idx, ms,
                                  block_major=True)
    assert np.array_equal(np.asarray(ser), np.asarray(bm))
    bmi = pp.blind_rotate_fused_bg(params, dev.bsk_raw, luts, idx, ms,
                                   interleave=True, block_major=True)
    assert np.array_equal(np.asarray(ser), np.asarray(bmi))


def test_fused_blindrot_interleave_bitexact(noisy_keys):
    """Monolithic fused kernel: the interleaved schedule (stack+split) ==
    the serial stack+split order, bit-exact, and == the jnp reference."""
    params = TEST_PARAMS_NOISY
    ck, sk = noisy_keys
    msgs = [0, 3, 8, 15, 6, 1, 9, 12]
    f = lambda x: (x * 7 + 2) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng)
                    for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(params, f)]).view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    from fhe_regex_tpu.ops import pbs_pallas as pp
    dev = prepare_server_key(params, sk, "pallas-fused", stack_rows=True,
                             bank_split=True)
    ref = make_pbs_fn(prepare_server_key(params, sk, "jnp"))(luts, idx, ctsj)
    ser = pp.pbs_batch_fused(params, dev.bsk_fused, dev.ksk_limbs, luts,
                             idx, jnp.int8, (0, 1, 2, 3), True, True, ctsj)
    inter = pp.pbs_batch_fused(params, dev.bsk_fused, dev.ksk_limbs, luts,
                               idx, jnp.int8, (0, 1, 2, 3), True, True,
                               ctsj, interleave=True)
    assert np.array_equal(np.asarray(ser), np.asarray(inter))
    assert np.array_equal(np.asarray(ref), np.asarray(inter))


def test_bg64_blindrot_interleave_bitexact():
    """64-bit twin: interleaved partial (lo, hi) pairs with explicit
    carries == the serial weight-class accumulation, bit-exact."""
    from fhe_regex_tpu.crypto.keys import gen_keys
    from fhe_regex_tpu.ops import pbs_pallas as pp
    from fhe_regex_tpu.ops.pbs64 import mod_switch64
    from fhe_regex_tpu.params import TEST_PARAMS_64
    from fhe_regex_tpu.regex.executor import _np_to_limbs

    params = TEST_PARAMS_64
    ck, sk = gen_keys(params, seed=7)
    msgs = [0, 3, 8, 15, 6, 1, 9, 12]
    f = lambda x: (x * 5 + 3) % 16
    cts = np.stack([lwe.encrypt_lwe(params, ck.lwe_key, m, ck.rng)
                    for m in msgs])
    luts = _np_to_limbs(np.stack([make_lut_poly(params, f)]), 64)
    lo, hi = jnp.asarray(luts[..., 0]), jnp.asarray(luts[..., 1])
    idx = jnp.zeros(len(msgs), jnp.int32)
    dev = prepare_server_key(params, sk, "pallas64-bg")
    ctsl = _np_to_limbs(cts, 64)
    ms = mod_switch64(params, jnp.asarray(ctsl[..., 0]),
                      jnp.asarray(ctsl[..., 1]))
    ser = pp.blind_rotate_fused64_bg(params, dev.bsk_raw64, lo, hi, idx, ms,
                                     dev.drop64, interleave=False)
    inter = pp.blind_rotate_fused64_bg(params, dev.bsk_raw64, lo, hi, idx,
                                       ms, dev.drop64, interleave=True)
    assert np.array_equal(np.asarray(ser[0]), np.asarray(inter[0]))
    assert np.array_equal(np.asarray(ser[1]), np.asarray(inter[1]))


def test_bg_blindrot_bitexact_noisy_single_block(noisy_keys):
    """NB=1 (one grid block) must also be exact — the DMA accumulator has
    explicit ordering, no prefetch-distance dependence."""
    _compare_bg(TEST_PARAMS_NOISY, noisy_keys, [0, 3, 8, 15, 6, 1, 9, 12],
                lambda x: (x * 7 + 2) % 16)


def test_bg_blindrot_production_geometry():
    """Batch-grid kernel at the FULL production GLWE geometry (N=2048,
    l=3, base 2^7 — everything that shapes the banks, digit layout and MXU
    tiles), n shrunk 866 -> 12 to bound interpret-mode runtime, with the
    batch split across NB=3 blocks."""
    import dataclasses
    from fhe_regex_tpu.crypto.keys import gen_keys
    from fhe_regex_tpu.params import TPU_MESSAGE_2_CARRY_2

    P = dataclasses.replace(
        TPU_MESSAGE_2_CARRY_2, name="TEST_PROD_SHAPE_BG",
        lwe_dimension=12, lwe_noise_std=0.0, glwe_noise_std=0.0)
    ck, sk = gen_keys(P, seed=13)
    f = lambda x: (x * 3 + 1) % 16
    msgs = [i % 16 for i in range(24)]
    cts = np.stack([lwe.encrypt_lwe(P, ck.lwe_key, m, ck.rng) for m in msgs])
    luts = jnp.asarray(make_lut_poly(P, f)[None].view(np.int32))
    idx = jnp.zeros(len(msgs), jnp.int32)
    ctsj = jnp.asarray(cts.view(np.int32))
    ref = make_pbs_fn(prepare_server_key(P, sk, "jnp"))(luts, idx, ctsj)
    from fhe_regex_tpu.ops import pbs_pallas as pp
    from fhe_regex_tpu.ops.pbs import key_arrays
    dev = prepare_server_key(P, sk, "pallas-bg")
    got = pp.pbs_batch_fused_bg(P, dev.bsk_raw, dev.ksk_limbs, luts, idx,
                                dev.matmul_dtype, dev.limbs, None, ctsj)
    # force NB=3 blocks of 8 explicitly through the tb override
    from fhe_regex_tpu.ops.pbs import mod_switch, sample_extract
    acc = pp.blind_rotate_fused_bg(P, dev.bsk_raw, luts, idx,
                                   mod_switch(P, ctsj), tb=8)
    got3 = pp.key_switch_mxu(P, dev.ksk_limbs, sample_extract(P, acc))
    assert np.array_equal(np.asarray(got), np.asarray(got3))
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    o = np.asarray(got).view(np.uint32)
    dec = [lwe.decrypt_lwe(P, ck.lwe_key, o[i]) for i in range(len(msgs))]
    assert dec == [f(m) for m in msgs]


def test_pallas_drop_limbs_fast_mode(noisy_keys):
    """drop_limbs=1 skips the low-limb matmuls; rounding noise stays far
    inside the margin on these parameters, so results still decrypt."""
    P = TEST_PARAMS_NOISY
    ck, sk = noisy_keys
    msgs = [0, 3, 8, 15, 5, 9, 12, 7]
    cts = np.stack([lwe.encrypt_lwe(P, ck.lwe_key, m, ck.rng) for m in msgs])
    luts = jnp.asarray(np.stack([make_lut_poly(P, lambda x: 15 - x)]).view(np.int32))
    dev = prepare_server_key(P, sk, "pallas", drop_limbs=1)
    assert dev.limbs == (1, 2, 3)
    out = make_pbs_fn(dev)(luts, jnp.zeros(8, jnp.int32),
                           jnp.asarray(cts.view(np.int32)))
    o = np.asarray(out).view(np.uint32)
    got = [lwe.decrypt_lwe(P, ck.lwe_key, o[i]) for i in range(8)]
    assert got == [15 - m for m in msgs]


def test_executor_runs_on_bg_backends(keys):
    """End-to-end has_match through the EXECUTOR on the batch-grid
    backends (make_pbs_core integration — the bench path exercises
    make_pbs_fn, which is a different code path; round 4 caught a stale
    core signature here)."""
    from fhe_regex_tpu import decrypt, has_match, trivial_encrypt_str
    from fhe_regex_tpu.params import TEST_PARAMS

    ck, sk = keys
    ct = trivial_encrypt_str(TEST_PARAMS, "abc")
    res = has_match(sk, ct, "/b/", backend="pallas-bg")
    assert decrypt(ck, res) == 1
    res = has_match(sk, ct, "/xq/", backend="pallas-bg")
    assert decrypt(ck, res) == 0


def test_executor_runs_on_bg64_backend():
    from fhe_regex_tpu import decrypt, has_match, trivial_encrypt_str
    from fhe_regex_tpu.crypto.keys import gen_keys
    from fhe_regex_tpu.params import TEST_PARAMS_64

    ck, sk = gen_keys(TEST_PARAMS_64, seed=17)
    ct = trivial_encrypt_str(TEST_PARAMS_64, "ab")
    res = has_match(sk, ct, "/ab/", backend="pallas64-bg")
    assert decrypt(ck, res) == 1
