"""Two-shape level-width scheme (TPU: {SMALL_LEVEL_BATCH, MAX_LEVEL_BATCH})
compiles and still decrypts correctly — exercised on CPU with the same
min_bucket the TPU path uses."""

import numpy as np

from fhe_regex_tpu import decrypt, has_match, trivial_encrypt_str
from fhe_regex_tpu.params import TEST_PARAMS
from fhe_regex_tpu.regex.engine import compile_match
from fhe_regex_tpu.regex.executor import (MAX_LEVEL_BATCH, SMALL_LEVEL_BATCH,
                                          Executor, compile_circuit)
from fhe_regex_tpu.crypto.keys import gen_keys
from fhe_regex_tpu.ops.pbs import prepare_server_key


def test_two_shape_widths_and_correctness(keys):
    ck, sk = keys
    P = TEST_PARAMS
    content = "xxxxxabcxxxxxxxx"
    builder, root = compile_match(len(content), "/abc/", P.num_blocks,
                                  fold="tree")
    circuit = compile_circuit(P, builder, root,
                              min_bucket=SMALL_LEVEL_BATCH)
    widths = {lv.lut_idx.shape[0] for lv in circuit.levels}
    assert widths <= {SMALL_LEVEL_BATCH, MAX_LEVEL_BATCH}, widths

    ex = Executor(P, prepare_server_key(P, sk, "jnp"))
    ct = trivial_encrypt_str(P, content)
    res = ex.run(circuit, np.ascontiguousarray(ct))
    assert decrypt(ck, res) == 1

    ct2 = trivial_encrypt_str(P, "xxxxxaqcxxxxxxxx")
    assert decrypt(ck, ex.run(circuit, np.ascontiguousarray(ct2))) == 0


def test_wide_level_chunks_to_max_batch(keys):
    """A level wider than MAX_LEVEL_BATCH splits into max-width chunks plus
    a bucketed tail."""
    ck, sk = keys
    P = TEST_PARAMS
    content = "ab" * 24                     # many start positions
    builder, root = compile_match(len(content), "/ab/", P.num_blocks,
                                  fold="tree")
    circuit = compile_circuit(P, builder, root,
                              min_bucket=SMALL_LEVEL_BATCH)
    for lv in circuit.levels:
        assert lv.lut_idx.shape[0] in (SMALL_LEVEL_BATCH, MAX_LEVEL_BATCH)
    ex = Executor(P, prepare_server_key(P, sk, "jnp"))
    ct = trivial_encrypt_str(P, content)
    assert decrypt(ck, ex.run(circuit, np.ascontiguousarray(ct))) == 1
