"""C++ circuit compiler vs the Python builder — byte-exact parity."""

import numpy as np
import pytest

from fhe_regex_tpu.regex import native
from fhe_regex_tpu.regex.engine import compile_match

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")

PATTERNS = [
    (2, "/ab/"), (1, "/ab/"), (2, "/a?b/"), (4, "/^ab|cd$/"),
    (9, "/abc/"), (6, "/a*bc/"), (4, "/a+bc/"), (2, "/ab/i"),
    (5, "/^a[b-d]{2,4}e$/i"), (2, "/^[a-d][^xyz]$/i"),
    (8, "/^ab{2,4}c+d*$/"), (12, "/^(ab|cd)[a-z]{3,}e?$/i"),
    (3, "/^cdxe?$/"), (5, "/[^ab]c/"), (4, "/x|y|z/"),
]


@pytest.mark.parametrize("fold", ["reference", "tree"])
@pytest.mark.parametrize("n,pattern", PATTERNS,
                         ids=[f"{n}~{p}" for n, p in PATTERNS])
@needs_native
def test_native_matches_python(n, pattern, fold):
    pb, proot = compile_match(n, pattern, fold=fold)
    nb, nroot = native.compile_match_native(n, pattern, fold=fold)

    assert (nb.ct_ops, nb.cache_hits) == (pb.ct_ops, pb.cache_hits)
    assert nb.num_content_slots == pb.num_content_slots
    assert nroot.val == proot.val
    assert len(nb.ops) == len(pb.ops)
    for a, b in zip(nb.ops, pb.ops):
        assert a == b, (a, b)


@needs_native
def test_native_end_to_end(keys):
    """Native-compiled circuit through the real executor + PBS."""
    from fhe_regex_tpu import decrypt, trivial_encrypt_str
    from fhe_regex_tpu.ops.pbs import prepare_server_key
    from fhe_regex_tpu.params import TEST_PARAMS as P
    from fhe_regex_tpu.regex.executor import Executor, compile_circuit

    ck, sk = keys
    nb, nroot = native.compile_match_native(6, "/a*bc/", fold="tree")
    circuit = compile_circuit(P, nb, nroot)
    ex = Executor(P, prepare_server_key(P, sk, "jnp"))
    res = ex.run(circuit, trivial_encrypt_str(P, "cdaabc"))
    assert decrypt(ck, res) == 1
