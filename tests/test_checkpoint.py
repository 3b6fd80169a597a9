"""Checkpoint/resume of encrypted artifacts (SURVEY.md §5) at both widths."""

import numpy as np

from fhe_regex_tpu.params import TEST_PARAMS, TEST_PARAMS_64
from fhe_regex_tpu.utils.checkpoint import (
    load_ciphertext,
    load_slab,
    save_ciphertext,
    save_slab,
)
from fhe_regex_tpu import trivial_encrypt_str


def test_ciphertext_roundtrip_32(tmp_path):
    ct = trivial_encrypt_str(TEST_PARAMS, "abc")
    p = tmp_path / "ct32.npz"
    save_ciphertext(p, ct)
    back = load_ciphertext(p)
    assert back.dtype == np.uint32
    assert np.array_equal(back, ct)


def test_ciphertext_roundtrip_64(tmp_path):
    ct = trivial_encrypt_str(TEST_PARAMS_64, "abc")
    assert ct.dtype == np.uint64
    p = tmp_path / "ct64.npz"
    save_ciphertext(p, ct)
    back = load_ciphertext(p)
    assert back.dtype == np.uint64          # no silent 32-bit truncation
    assert np.array_equal(back, ct)


def test_slab_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    slab = rng.integers(-2**31, 2**31, size=(64, 17), dtype=np.int64).astype(np.int32)
    p = tmp_path / "slab.npz"
    save_slab(p, slab, level_idx=3)
    back, lvl = load_slab(p)
    assert lvl == 3
    assert np.array_equal(back, slab)


def test_slab_roundtrip_limb_pairs(tmp_path):
    """64-bit executor slabs are int32 limb-pair arrays [S, n+1, 2]."""
    rng = np.random.default_rng(1)
    slab = rng.integers(-2**31, 2**31, size=(16, 17, 2), dtype=np.int64).astype(np.int32)
    p = tmp_path / "slab64.npz"
    save_slab(p, slab, level_idx=1)
    back, lvl = load_slab(p)
    assert lvl == 1
    assert np.array_equal(back, slab)


def test_resume_mid_circuit(keys):
    """Save the slab between levels, reload, finish the remaining levels:
    identical result to an uninterrupted run."""
    import jax.numpy as jnp

    from fhe_regex_tpu import decrypt
    from fhe_regex_tpu.ops.pbs import prepare_server_key
    from fhe_regex_tpu.regex.engine import compile_match
    from fhe_regex_tpu.regex.executor import Executor, compile_circuit

    ck, sk = keys
    params = sk.params
    builder, root = compile_match(3, "/ab?c/", fold="tree")
    circuit = compile_circuit(params, builder, root)
    assert len(circuit.levels) >= 2
    ex = Executor(params, prepare_server_key(params, sk, "jnp"))

    content = trivial_encrypt_str(params, "abc")
    full = ex.run(circuit, content)

    # manual two-phase run with a checkpoint in the middle (tmp-free: memory)
    n1 = params.lwe_dimension + 1
    slab_np = np.zeros((circuit.num_slots, n1), np.int32)
    flat = content.reshape(-1, n1).view(np.int32)
    slab_np[1:1 + flat.shape[0]] = flat
    slab = jnp.asarray(slab_np)
    luts = jnp.asarray(circuit.luts.view(np.int32))
    mid = len(circuit.levels) // 2
    for lv in circuit.levels[:mid]:
        slab = ex._level_jit(ex._key_args, slab, luts,
                             jnp.asarray(lv.in_slots), jnp.asarray(lv.in_coefs),
                             jnp.asarray(lv.consts), jnp.asarray(lv.lut_idx),
                             jnp.asarray(lv.out_idx))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        save_slab(d + "/mid.npz", np.asarray(slab), mid)
        restored, lvl = load_slab(d + "/mid.npz")
    slab = jnp.asarray(restored)
    for lv in circuit.levels[lvl:]:
        slab = ex._level_jit(ex._key_args, slab, luts,
                             jnp.asarray(lv.in_slots), jnp.asarray(lv.in_coefs),
                             jnp.asarray(lv.consts), jnp.asarray(lv.lut_idx),
                             jnp.asarray(lv.out_idx))
    resumed = ex._finalize(circuit, slab)
    assert np.array_equal(resumed, full)
    assert decrypt(ck, resumed) == 1


def test_executor_checkpoint_resume(tmp_path, keys):
    """Executor.run with mid-circuit checkpointing, resumed from the saved
    slab, decrypts identically to an uninterrupted run."""
    from fhe_regex_tpu import decrypt
    from fhe_regex_tpu.ops.pbs import prepare_server_key
    from fhe_regex_tpu.regex.engine import compile_match
    from fhe_regex_tpu.regex.executor import Executor, compile_circuit

    ck, sk = keys
    P = TEST_PARAMS
    content = "xxabcxxx"
    builder, root = compile_match(len(content), "/ab?c/", P.num_blocks,
                                  fold="tree")
    circuit = compile_circuit(P, builder, root)
    assert len(circuit.levels) >= 3
    ex = Executor(P, prepare_server_key(P, sk, "jnp"))
    ct = np.ascontiguousarray(trivial_encrypt_str(P, content))

    plain = ex.run(circuit, ct)

    cp = tmp_path / "run.npz"
    chk = ex.run(circuit, ct, checkpoint=str(cp), checkpoint_every=2)
    assert np.array_equal(chk, plain)
    assert cp.exists()

    _, lvl = load_slab(cp)
    assert 0 < lvl < len(circuit.levels)
    resumed = ex.run(circuit, ct, resume=str(cp))
    assert np.array_equal(resumed, plain)
    assert decrypt(ck, resumed) == 1


def test_run_many_checkpoint_kill_and_resume(tmp_path, keys):
    """run_many checkpoint/resume (VERDICT r4 weak #7): kill the packed
    batch mid-plan (a launch step raises), resume from the saved slab, and
    get results identical to an uninterrupted run for EVERY content."""
    from fhe_regex_tpu import decrypt
    from fhe_regex_tpu.ops.pbs import prepare_server_key
    from fhe_regex_tpu.regex.engine import compile_match
    from fhe_regex_tpu.regex.executor import Executor, compile_circuit

    ck, sk = keys
    P = TEST_PARAMS
    contents = ["xxabcxxx", "xabcxxxx", "xxxxxxxx", "abcabcab"]
    builder, root = compile_match(8, "/ab?c/", P.num_blocks, fold="tree")
    circuit = compile_circuit(P, builder, root)
    ex = Executor(P, prepare_server_key(P, sk, "jnp"))
    cts = np.stack([trivial_encrypt_str(P, c) for c in contents])

    plain = ex.run_many(circuit, cts)
    assert [decrypt(ck, r) for r in plain] == [1, 1, 0, 1]

    # checkpoint every step, and KILL the run partway: the wrapped level
    # launch raises after 2 steps (simulating a mid-batch crash — the last
    # completed step's checkpoint survives on disk)
    cp = tmp_path / "many.npz"
    real = ex._level_jit
    calls = {"n": 0}

    def dying(*a, **k):
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real(*a, **k)

    ex._level_jit = dying
    try:
        import pytest
        with pytest.raises(RuntimeError, match="simulated crash"):
            ex.run_many(circuit, cts, checkpoint=str(cp), checkpoint_every=1)
    finally:
        ex._level_jit = real
    assert cp.exists()

    from fhe_regex_tpu.utils.checkpoint import load_many_slab
    _, step, ck_C, total = load_many_slab(cp)
    assert step == 2 and ck_C == len(contents) and total > step

    resumed = ex.run_many(circuit, cts, resume=str(cp))
    assert np.array_equal(resumed, plain)

    # plan-mismatch guards: wrong C is refused loudly
    with pytest.raises(ValueError, match="C="):
        ex.run_many(circuit, cts[:2], resume=str(cp))


def test_run_many_checkpoint_resume_multivalue(tmp_path, keys):
    """The mv serving path checkpoints at plan-entry granularity and
    resumes to identical results."""
    import pytest

    from fhe_regex_tpu import decrypt
    from fhe_regex_tpu.ops.pbs import prepare_server_key
    from fhe_regex_tpu.regex.engine import compile_match
    from fhe_regex_tpu.regex.executor import Executor, compile_circuit

    ck, sk = keys
    P = TEST_PARAMS
    contents = ["abq", "abd", "xyz"]
    builder, root = compile_match(3, "/ab[c-e]/", P.num_blocks, fold="tree")
    circuit = compile_circuit(P, builder, root, multivalue=True)
    ex = Executor(P, prepare_server_key(P, sk, "jnp"))
    cts = np.stack([trivial_encrypt_str(P, c) for c in contents])

    plain = ex.run_many(circuit, cts)
    assert [decrypt(ck, r) for r in plain] == [0, 1, 0]

    cp = tmp_path / "many_mv.npz"
    chk = ex.run_many(circuit, cts, checkpoint=str(cp), checkpoint_every=1)
    assert np.array_equal(chk, plain)
    assert cp.exists()

    from fhe_regex_tpu.utils.checkpoint import load_many_slab
    _, step, ck_C, total = load_many_slab(cp)
    assert 0 < step < total and ck_C == len(contents)
    resumed = ex.run_many(circuit, cts, resume=str(cp))
    assert np.array_equal(resumed, plain)
    with pytest.raises(ValueError, match="not a run_many checkpoint"):
        save_slab(tmp_path / "plain.npz", np.zeros((4, 17), np.int32), 1)
        load_many_slab(tmp_path / "plain.npz")


def test_checkpoint_resume_multiroot(tmp_path, keys):
    """Mid-circuit checkpoint/resume of a multi-root (pattern-set) run."""
    from fhe_regex_tpu import decrypt, trivial_encrypt_str
    from fhe_regex_tpu.ops.pbs import prepare_server_key
    from fhe_regex_tpu.params import TEST_PARAMS
    from fhe_regex_tpu.regex.engine import compile_match_multi
    from fhe_regex_tpu.regex.executor import Executor, compile_circuit

    ck, sk = keys
    builder, roots = compile_match_multi(3, ["/ab/", "/bc$/", "/zz/"])
    circuit = compile_circuit(TEST_PARAMS, builder, roots)
    assert len(circuit.levels) >= 2
    ex = Executor(TEST_PARAMS, prepare_server_key(TEST_PARAMS, sk, "jnp"))
    ct = trivial_encrypt_str(TEST_PARAMS, "abc")
    plain = ex.run(circuit, ct)
    cp = tmp_path / "multi.npz"
    chk = ex.run(circuit, ct, checkpoint=str(cp), checkpoint_every=1)
    assert np.array_equal(chk, plain)
    resumed = ex.run(circuit, None, resume=str(cp))
    assert np.array_equal(resumed, plain)
    assert [decrypt(ck, r) for r in resumed] == [1, 1, 0]
