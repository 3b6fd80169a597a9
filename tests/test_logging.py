"""Per-op debug/trace logging parity (SURVEY.md §5; execution.rs:214-218,
engine.rs:50).

The reference logs every cache-miss op at debug! with the pretty-printed
``Executed`` expression ("evaluation for: ..."), every cache hit at trace!
("cache hit: ..."), and the engine's program pointer at trace!.  These tests
pin the format (reference Debug impl, execution.rs:225-276) and that the
builder emits line-comparable logs.
"""

import logging

import pytest

from fhe_regex_tpu.regex.circuit import (
    TRACE,
    CircuitBuilder,
    expr_const,
    expr_ctpos,
    format_expr,
)
from fhe_regex_tpu.regex.engine import compile_match


def test_format_expr_reference_debug_format():
    # constants: 0 -> f, 1 -> t, chars -> the char (execution.rs:227-232)
    assert format_expr(expr_const(0)) == "f"
    assert format_expr(expr_const(1)) == "t"
    assert format_expr(expr_const(ord("a"))) == "a"
    assert format_expr(expr_ctpos(3)) == "ct_3"
    # infix ops parenthesized exactly as the reference prints them
    eq = ("eq", expr_ctpos(0), expr_const(ord("a")))
    assert format_expr(eq) == "(ct_0==a)"
    ge = ("ge", expr_ctpos(1), expr_const(ord("b")))
    le = ("le", expr_ctpos(1), expr_const(ord("d")))
    assert format_expr(("and", ge, le)) == r"((ct_1>=b)/\(ct_1<=d))"
    assert format_expr(("or", eq, ge)) == r"((ct_0==a)\/(ct_1>=b))"
    assert format_expr(("not", eq)) == "(!(ct_0==a))"


def test_format_expr_deep_nesting_no_recursion_error():
    # strict-fold exprs nest one level per OR'd branch; the formatter must
    # not hit Python's recursion limit on long contents
    e = expr_const(0)
    for i in range(5000):
        e = ("or", e, ("eq", expr_ctpos(i), expr_const(ord("a"))))
    s = format_expr(e)
    assert s.startswith("(" * 1) and s.endswith(")")
    assert "(ct_4999==a)" in s


def test_builder_debug_and_trace_logs(caplog):
    with caplog.at_level(TRACE, logger="fhe_regex_tpu.circuit"):
        b = CircuitBuilder(2, mode="strict")
        b.ct_eq(0, ord("a"))
        b.ct_eq(0, ord("a"))        # cache hit
    msgs = [r.message for r in caplog.records
            if r.name == "fhe_regex_tpu.circuit"]
    assert "evaluation for: (ct_0==a)" in msgs      # execution.rs:218
    assert "cache hit: (ct_0==a)" in msgs           # execution.rs:214
    # hits log at TRACE only (reference: trace!)
    hit = next(r for r in caplog.records if "cache hit" in r.message)
    assert hit.levelno == TRACE
    miss = next(r for r in caplog.records if "evaluation for" in r.message)
    assert miss.levelno == logging.DEBUG


def test_engine_program_pointer_trace(caplog):
    with caplog.at_level(TRACE, logger="fhe_regex_tpu.engine"):
        compile_match(2, "/ab/", fold="reference")
    msgs = [r.message for r in caplog.records
            if r.name == "fhe_regex_tpu.engine"]
    assert any(m.startswith("program pointer: regex=") and "content pos=0" in m
               for m in msgs), msgs


def test_strict_compile_log_full_pattern(caplog):
    """End-to-end: a strict compile of /ab/ over 2 chars logs each op once
    and the shared subexpression as a hit (line-comparable with the
    reference's RUST_LOG=debug output)."""
    with caplog.at_level(logging.DEBUG, logger="fhe_regex_tpu.circuit"):
        compile_match(2, "/ab/", fold="reference")
    msgs = [r.message for r in caplog.records
            if r.name == "fhe_regex_tpu.circuit"]
    assert "evaluation for: (ct_0==a)" in msgs
    assert "evaluation for: (ct_1==b)" in msgs
    assert r"evaluation for: ((ct_0==a)/\(ct_1==b))" in msgs


def test_default_engine_prefers_python_under_debug():
    from fhe_regex_tpu.regex import native

    logger = logging.getLogger("fhe_regex_tpu.circuit")
    old = logger.level
    try:
        logger.setLevel(logging.DEBUG)
        assert native.default_engine() == "python"
        logger.setLevel(logging.INFO)
        want = "native" if native.available() else "python"
        assert native.default_engine() == want
    finally:
        logger.setLevel(old)
