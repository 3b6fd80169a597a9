"""Branch-budget guard: bounded variant expansion with a clean error.

The reference's branch enumeration (engine.rs:45-214) is exponential for
nested quantifiers; ``branch_budget`` turns unbounded compile time into a
clean BranchBudgetExceeded.  The metric (one unit per lazy branch node) must
be identical between the Python engine and the native C++ compiler: both
accept/reject every (pattern, content_len, budget) triple the same way.
"""

import pytest

from fhe_regex_tpu.regex import native
from fhe_regex_tpu.regex.engine import BranchBudgetExceeded, compile_match

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")

CASES = [
    (6, "/a*bc/"),
    (8, "/^ab{2,4}c+d*$/"),
    (12, "/^(ab|cd)[a-z]{3,}e?$/i"),
    (5, "/^a[b-d]{2,4}e$/i"),
    (4, "/x|y|z/"),
]


def _python_threshold(n, pattern):
    """Smallest budget that compiles, by bisection on the Python engine."""
    lo, hi = 0, 1
    while True:
        try:
            compile_match(n, pattern, branch_budget=hi)
            break
        except BranchBudgetExceeded:
            lo, hi = hi, hi * 2
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        try:
            compile_match(n, pattern, branch_budget=mid)
            hi = mid
        except BranchBudgetExceeded:
            lo = mid
    return hi


@pytest.mark.parametrize("n,pattern", CASES,
                         ids=[f"{n}~{p}" for n, p in CASES])
def test_budget_python(n, pattern):
    thr = _python_threshold(n, pattern)
    assert thr > 0
    # exactly at the threshold compiles; one below raises
    compile_match(n, pattern, branch_budget=thr)
    with pytest.raises(BranchBudgetExceeded):
        compile_match(n, pattern, branch_budget=thr - 1)
    # budgeted result identical to unbudgeted
    b1, r1 = compile_match(n, pattern, branch_budget=thr)
    b0, r0 = compile_match(n, pattern)
    assert (b1.ct_ops, b1.cache_hits) == (b0.ct_ops, b0.cache_hits)
    assert r1.val == r0.val


@pytest.mark.parametrize("n,pattern", CASES,
                         ids=[f"{n}~{p}" for n, p in CASES])
@needs_native
def test_budget_native_threshold_parity(n, pattern):
    """C++ charges the budget at exactly the same points as Python."""
    thr = _python_threshold(n, pattern)
    nb, nroot = native.compile_match_native(n, pattern, branch_budget=thr)
    pb, proot = compile_match(n, pattern, branch_budget=thr)
    assert (nb.ct_ops, nb.cache_hits) == (pb.ct_ops, pb.cache_hits)
    assert nroot.val == proot.val
    with pytest.raises(BranchBudgetExceeded):
        native.compile_match_native(n, pattern, branch_budget=thr - 1)


def test_budget_zero_trivial_false():
    """Empty content produces zero branches -> no budget charged (Q8)."""
    b, root = compile_match(0, "/abc/", branch_budget=0)
    assert root.val.sign == 0 and root.val.const == 0


@needs_native
def test_budget_default_unlimited():
    nb, _ = native.compile_match_native(6, "/a*bc/")
    pb, _ = compile_match(6, "/a*bc/")
    assert nb.ct_ops == pb.ct_ops


def test_has_match_budget_plumbing(keys):
    """Public API surfaces the budget error before any FHE work."""
    from fhe_regex_tpu import has_match, trivial_encrypt_str

    ck, sk = keys
    ct = trivial_encrypt_str(sk.params, "abcabc")
    for engine in ("python", "native") if native.available() else ("python",):
        with pytest.raises(BranchBudgetExceeded):
            has_match(sk, ct, "/a*bc/", engine=engine, branch_budget=1)
