"""Parser conformance suite: all 49 cases ported from the reference
(src/regex/parser.rs:353-685), asserting exact AST equality."""

import pytest

from fhe_regex_tpu.regex.parser import (
    AnyChar,
    Between,
    Char,
    Either,
    EOF,
    Not,
    Optional_,
    ParseError,
    Range,
    Repeated,
    Seq,
    SOF,
    parse,
)


def C(ch):
    return Char(ord(ch))


ABC = Seq((C("a"), C("b"), C("c")))

CASES = [
    # chars and the 14 no-escape symbols (parser.rs:358-372)
    ("/h/", C("h")),
    ("/&/", C("&")),
    ("/;/", C(";")),
    ("/:/", C(":")),
    ("/,/", C(",")),
    ("/`/", C("`")),
    ("/~/", C("~")),
    ("/-/", C("-")),
    ("/_/", C("_")),
    ("/%/", C("%")),
    ("/#/", C("#")),
    ("/@/", C("@")),
    ("/!/", C("!")),
    ("/'/", C("'")),
    ('/"/', C('"')),
    ("/\\h/", C("h")),  # anything can be escaped
    ("/./", AnyChar()),
    ("/abc/", ABC),
    ("/^abc/", Seq((SOF(), ABC))),
    ("/abc$/", Seq((ABC, EOF()))),
    ("/^abc$/", Seq((SOF(), ABC, EOF()))),
    ("/^ab?c$/", Seq((SOF(), Seq((C("a"), Optional_(C("b")), C("c"))), EOF()))),
    ("/^ab*c$/", Seq((SOF(), Seq((C("a"), Repeated(C("b"), None, None), C("c"))), EOF()))),
    ("/^ab+c$/", Seq((SOF(), Seq((C("a"), Repeated(C("b"), 1, None), C("c"))), EOF()))),
    ("/^ab{2}c$/", Seq((SOF(), Seq((C("a"), Repeated(C("b"), 2, 2), C("c"))), EOF()))),
    ("/^ab{3,}c$/", Seq((SOF(), Seq((C("a"), Repeated(C("b"), 3, None), C("c"))), EOF()))),
    ("/^ab{2,4}c$/", Seq((SOF(), Seq((C("a"), Repeated(C("b"), 2, 4), C("c"))), EOF()))),
    ("/^.$/", Seq((SOF(), AnyChar(), EOF()))),
    ("/^[abc]$/", Seq((SOF(), Range((ord("a"), ord("b"), ord("c"))), EOF()))),
    ("/^[a-d]$/", Seq((SOF(), Between(ord("a"), ord("d")), EOF()))),
    ("/^[^abc]$/", Seq((SOF(), Not(Range((ord("a"), ord("b"), ord("c")))), EOF()))),
    ("/^[^a-d]$/", Seq((SOF(), Not(Between(ord("a"), ord("d"))), EOF()))),
    (
        "/^abc$/i",
        Seq((
            SOF(),
            Seq((
                Range((ord("a"), ord("A"))),
                Range((ord("b"), ord("B"))),
                Range((ord("c"), ord("C"))),
            )),
            EOF(),
        )),
    ),
    ("/^/", Seq((SOF(), Seq(())))),
    ("/$/", Seq((Seq(()), EOF()))),
    ("/a*/", Repeated(C("a"), None, None)),
    ("/a+/", Repeated(C("a"), 1, None)),
    ("/a{104,}/", Repeated(C("a"), 104, None)),
    ("/a{,15}/", Repeated(C("a"), None, 15)),
    ("/a{12,15}/", Repeated(C("a"), 12, 15)),
    ("/(a|b)*/", Repeated(Either(C("a"), C("b")), None, None)),
    ("/(a|b){3,7}/", Repeated(Either(C("a"), C("b")), 3, 7)),
    # anchors scope over the whole alternation (Q2, parser.rs:612-657)
    (
        "/^ab|cd/",
        Seq((SOF(), Either(Seq((C("a"), C("b"))), Seq((C("c"), C("d")))))),
    ),
    (
        "/ab|cd$/",
        Seq((Either(Seq((C("a"), C("b"))), Seq((C("c"), C("d")))), EOF())),
    ),
    (
        "/^ab|cd$/",
        Seq((SOF(), Either(Seq((C("a"), C("b"))), Seq((C("c"), C("d")))), EOF())),
    ),
    ("/\\^/", C("^")),
    ("/\\./", C(".")),
    ("/\\*/", C("*")),
    (
        "/^ca\\^b$/",
        Seq((SOF(), Seq((C("c"), C("a"), C("^"), C("b"))), EOF())),
    ),
]


@pytest.mark.parametrize("pattern,expected", CASES, ids=[c[0] for c in CASES])
def test_parser(pattern, expected):
    assert parse(pattern) == expected


# --- dialect-rejection quirks (Q4, Q5, Q13) ---


@pytest.mark.parametrize("pattern", ["/a1/", "/[0-9]/", "/[a-z0]/", "/a{}/", "/abc", "abc/"])
def test_parser_rejects(pattern):
    with pytest.raises(ParseError):
        parse(pattern)


def test_right_nested_alternation():
    got = parse("/a|b|c/")
    assert got == Either(C("a"), Either(C("b"), C("c")))


def test_case_insensitive_leaves_between_and_range(keys=None):
    # Q3: /i does not touch Between/Range/AnyChar
    assert parse("/[a-d]/i") == Between(ord("a"), ord("d"))
    assert parse("/[xy]/i") == Range((ord("x"), ord("y")))
    assert parse("/./i") == AnyChar()
    # non-letter Char still becomes a (single-element) Range under /i
    assert parse("/;/i") == Range((ord(";"),))


def test_debug_repr_matches_reference_format():
    assert repr(parse("/^ab|cd$/")) == "<^(<ab>|<cd>)$>"
    assert repr(parse("/^[a-d]$/")) == "<^[a->d]$>"
    assert repr(parse("/a{2,4}/")) == "a{2,4}"
    assert repr(parse("/a*/")) == "a{*,*}"
